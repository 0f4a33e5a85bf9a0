"""Live terminal monitor for streaming draws (round-5: the interactive
streaming-visualization companion the reference ships as livebook
notebooks with a per-sample viz consumer, reference README.md:30,229-234
— rebuilt terminal-native: zero dependencies, ANSI redraw, unicode
sparklines, running split R-hat).

Usage (the chunk-granularity ``sample_stream`` consumer):

    from exmc_tpu import sample_stream
    from exmc_tpu.viz import LiveMonitor

    mon = LiveMonitor(num_chains=64, total_draws=1000)
    trace, stats = sample_stream(ir, mon, num_chains=64, chunk_size=100)
    print(mon.render_summary())

Every chunk updates per-parameter running moments, the split R-hat of
the draws accumulated so far, the divergence count, and a sparkline of
the cross-chain mean's trajectory — the live convergence picture the
reference streams to livebook, at TPU-dispatch-friendly chunk
granularity (BENCHMARKS.md "Per-draw streaming cost": emission
granularity is dispatch-bound, so the monitor consumes whatever chunk
size the run uses).

Memory is BOUNDED regardless of stream length: per displayed row the
monitor keeps per-chain Welford moments in two halves (draw index
below/above ``total_draws/2`` — the split R-hat construction), never
the draws themselves, and the sparkline path decimates by pairwise
averaging once it exceeds its resolution budget.

Also exposes ``sparkline(values)`` for ad-hoc use.
"""

import sys

import numpy as np

_BARS = "▁▂▃▄▅▆▇█"


def sparkline(values, width=28):
    """Unicode sparkline of a 1-d sequence, resampled to ``width``."""
    v = np.asarray(values, np.float64).reshape(-1)
    v = v[np.isfinite(v)]
    if v.size == 0:
        return " " * width
    if v.size > width:
        edges = np.linspace(0, v.size, width + 1).astype(int)
        v = np.array([v[a:b].mean() if b > a else v[min(a, v.size - 1)]
                      for a, b in zip(edges[:-1], edges[1:])])
    lo, hi = float(v.min()), float(v.max())
    span = hi - lo
    if span <= 0:
        return _BARS[0] * len(v) + " " * (width - len(v))
    idx = ((v - lo) / span * (len(_BARS) - 1)).round().astype(int)
    s = "".join(_BARS[i] for i in idx)
    return s + " " * (width - len(s))


class _HalfMoments:
    """Per-chain Welford accumulator for one split half: count, mean,
    M2, each shape (chains,)."""

    def __init__(self, chains):
        self.n = 0
        self.mean = np.zeros(chains)
        self.m2 = np.zeros(chains)

    def update(self, cols):
        """cols: (chains, k) new draws for this half."""
        for j in range(cols.shape[1]):
            x = cols[:, j]
            self.n += 1
            d = x - self.mean
            self.mean += d / self.n
            self.m2 += d * (x - self.mean)

    def var(self):
        return self.m2 / max(self.n - 1, 1)


class LiveMonitor:
    """``sample_stream`` chunk consumer that renders a live dashboard.

    Parameters
    ----------
    num_chains, total_draws : run geometry (``total_draws`` also fixes
        the split point for the running split R-hat).
    params : optional list of trace keys to display (default: all,
        scalar-expanded, capped at ``max_rows``).
    stream : file-like to render into (default ``sys.stderr``).
    ansi : redraw in place with ANSI cursor movement (default: only
        when the stream is a TTY). With ``ansi=False`` each update
        appends a full frame — the mode tests use.
    max_rows : parameter-row cap (vector params expand to ``name[i]``).
    """

    def __init__(self, num_chains, total_draws, params=None, stream=None,
                 ansi=None, max_rows=8, spark_width=28):
        self.num_chains = num_chains
        self.total_draws = total_draws
        self.params = params
        self.stream = stream if stream is not None else sys.stderr
        self.ansi = (self.stream.isatty()
                     if ansi is None and hasattr(self.stream, "isatty")
                     else bool(ansi))
        self.max_rows = max_rows
        self.spark_width = spark_width
        self._halves = {}         # (name, idx) -> [_HalfMoments, _HalfMoments]
        self._mean_path = {}      # (name, idx) -> per-chunk means (bounded)
        self._divergences = 0
        self._seen = 0
        self._frame_lines = 0
        self._t0 = None
        self._rate_base = None    # draws already produced when _t0 stamped

    # -- the sample_stream callback protocol ---------------------------
    def __call__(self, start_index, trace_chunk, stats_chunk):
        import time

        names = self._select(trace_chunk)
        half_at = self.total_draws // 2
        k = None
        for name, idx in names:
            arr = np.asarray(trace_chunk[name], np.float64)
            col = arr if arr.ndim == 2 else arr.reshape(
                arr.shape[0], arr.shape[1], -1)[:, :, idx]
            halves = self._halves.setdefault(
                (name, idx),
                [_HalfMoments(col.shape[0]), _HalfMoments(col.shape[0])])
            split = max(min(half_at - start_index, col.shape[1]), 0)
            if split > 0:
                halves[0].update(col[:, :split])
            if split < col.shape[1]:
                halves[1].update(col[:, split:])
            path = self._mean_path.setdefault((name, idx), [])
            path.append(float(col.mean()))
            if len(path) > 16 * self.spark_width:
                # pairwise decimation keeps the trajectory SHAPE at
                # bounded memory on arbitrarily long streams
                half = [(path[i] + path[i + 1]) / 2
                        for i in range(0, len(path) - 1, 2)]
                self._mean_path[(name, idx)] = half
            k = col.shape[1]
        if k:
            self._seen = start_index + k
        if self._t0 is None:
            # stamp time at the END of the first chunk: its draws were
            # produced before the monitor had a clock, so they are the
            # rate baseline, not part of the measured production
            self._t0 = time.time()
            self._rate_base = self._seen
        div = stats_chunk.get("diverging")
        if div is not None:
            self._divergences += int(np.asarray(div).sum())
        self._render()

    # ------------------------------------------------------------------
    def _select(self, trace_chunk):
        out = []
        keys = self.params or list(trace_chunk)
        for name in keys:
            arr = np.asarray(trace_chunk[name])
            n_comp = 1 if arr.ndim == 2 else int(
                np.prod(arr.shape[2:], dtype=int))
            for i in range(n_comp):
                out.append((name, i))
                if len(out) >= self.max_rows:
                    return out
        return out

    def _row_stats(self, halves):
        """(mean, sd, split-R-hat) from the two halves' per-chain
        moments — no draws retained."""
        h0, h1 = halves
        groups = [h for h in (h0, h1) if h.n >= 2]
        n_tot = h0.n + h1.n
        if n_tot == 0:
            return float("nan"), float("nan"), float("nan")
        # overall mean/sd by combining half moments per chain
        tot_mean = (h0.n * h0.mean + h1.n * h1.mean) / max(n_tot, 1)
        tot_m2 = (h0.m2 + h1.m2
                  + (h0.n * (h0.mean - tot_mean) ** 2 if h0.n else 0.0)
                  + (h1.n * (h1.mean - tot_mean) ** 2 if h1.n else 0.0))
        mean = float(tot_mean.mean())
        sd = float(np.sqrt(max(
            (tot_m2.sum() / max(n_tot * len(tot_mean) - 1, 1))
            + tot_mean.var(), 0.0)))
        if len(groups) < 2:
            return mean, sd, float("nan")
        # split R-hat over 2 x chains groups; group lengths may differ
        # by one chunk boundary — use the mean length (monitor-grade)
        g_means = np.concatenate([h.mean for h in groups])
        g_vars = np.concatenate([h.var() for h in groups])
        n_bar = np.mean([h.n for h in groups])
        w = float(g_vars.mean())
        b = n_bar * float(g_means.var(ddof=1))
        var_plus = (n_bar - 1) / n_bar * w + b / n_bar
        return mean, sd, float(np.sqrt(var_plus / max(w, 1e-30)))

    def _label(self, name, idx, multi):
        return f"{name}[{idx}]" if multi else name

    def _comp_count(self):
        out = {}
        for (name, idx) in self._halves:
            out[name] = out.get(name, 0) + 1
        return out

    def _render(self):
        import time

        lines = []
        elapsed = max(time.time() - self._t0, 1e-9)
        produced = max(self._seen - self._rate_base, 0) * self.num_chains
        rate = produced / elapsed
        rate_s = f"{rate:,.0f} draws/s" if produced else "-- draws/s"
        lines.append(
            f"exmc_tpu live │ draw {self._seen}/{self.total_draws} "
            f"│ {self.num_chains} chains │ "
            f"{rate_s} │ divergences {self._divergences}"
        )
        comp_count = self._comp_count()
        for (name, idx), halves in self._halves.items():
            label = self._label(name, idx, comp_count[name] > 1)
            mean, sd, rhat = self._row_stats(halves)
            rh = f"{rhat:6.3f}" if np.isfinite(rhat) else "   -- "
            lines.append(
                f"  {label:<12.12} {mean:9.3f} ±{sd:7.3f}  "
                f"R-hat {rh}  "
                f"{sparkline(self._mean_path[(name, idx)], self.spark_width)}"
            )
        frame = "\n".join(lines)
        if self.ansi and self._frame_lines:
            self.stream.write(f"\x1b[{self._frame_lines}F\x1b[J")
        self.stream.write(frame + "\n")
        if hasattr(self.stream, "flush"):
            self.stream.flush()
        self._frame_lines = len(lines)

    def render_summary(self):
        """Final one-shot summary string (no ANSI)."""
        lines = [f"streamed {self._seen} draws x {self.num_chains} "
                 f"chains, divergences {self._divergences}"]
        comp_count = self._comp_count()
        for (name, idx), halves in self._halves.items():
            label = self._label(name, idx, comp_count[name] > 1)
            mean, sd, rhat = self._row_stats(halves)
            lines.append(
                f"  {label:<12.12} mean {mean:9.3f}  sd {sd:8.3f}"
                f"  R-hat {rhat:6.3f}"
            )
        return "\n".join(lines)

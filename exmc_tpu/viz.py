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


class LiveMonitor:
    """``sample_stream`` chunk consumer that renders a live dashboard.

    Parameters
    ----------
    num_chains, total_draws : run geometry (for the progress line).
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
        self._draws = {}          # name -> list of (chains, k) chunks
        self._mean_path = {}      # name -> list of per-chunk means
        self._divergences = 0
        self._seen = 0
        self._frame_lines = 0
        self._t0 = None

    # -- the sample_stream callback protocol ---------------------------
    def __call__(self, start_index, trace_chunk, stats_chunk):
        import time

        if self._t0 is None:
            self._t0 = time.time()
            self._chunk0 = start_index
        names = self._select(trace_chunk)
        k = None
        for name, idx in names:
            arr = np.asarray(trace_chunk[name], np.float64)
            col = arr if arr.ndim == 2 else arr.reshape(
                arr.shape[0], arr.shape[1], -1)[:, :, idx]
            self._draws.setdefault((name, idx), []).append(col)
            self._mean_path.setdefault((name, idx), []).append(
                float(col.mean()))
            k = col.shape[1]
        if k:
            self._seen = start_index + k
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

    def _rhat(self, draws):
        """Split R-hat over the accumulated (chains, n) draws."""
        x = np.concatenate(draws, axis=1)
        c, n = x.shape
        if n < 4:
            return float("nan")
        half = n // 2
        s = np.concatenate([x[:, :half], x[:, half:2 * half]], axis=0)
        means = s.mean(axis=1)
        w = s.var(axis=1, ddof=1).mean()
        b = half * means.var(ddof=1)
        var_plus = (half - 1) / half * w + b / half
        return float(np.sqrt(var_plus / max(w, 1e-30)))

    def _label(self, name, idx, multi):
        return f"{name}[{idx}]" if multi else name

    def _render(self):
        import time

        lines = []
        elapsed = max(time.time() - self._t0, 1e-9)
        produced = max(self._seen - self._chunk0, 0) * self.num_chains
        rate = produced / elapsed
        lines.append(
            f"exmc_tpu live │ draw {self._seen}/{self.total_draws} "
            f"│ {self.num_chains} chains │ "
            f"{rate:,.0f} draws/s │ divergences {self._divergences}"
        )
        comp_count = {}
        for (name, idx) in self._draws:
            comp_count[name] = comp_count.get(name, 0) + 1
        for (name, idx), chunks in self._draws.items():
            x = np.concatenate(chunks, axis=1)
            label = self._label(name, idx, comp_count[name] > 1)
            rhat = self._rhat(chunks)
            rh = f"{rhat:6.3f}" if np.isfinite(rhat) else "   -- "
            lines.append(
                f"  {label:<12.12} {x.mean():9.3f} ±{x.std():7.3f}  "
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
        comp_count = {}
        for (name, idx) in self._draws:
            comp_count[name] = comp_count.get(name, 0) + 1
        for (name, idx), chunks in self._draws.items():
            x = np.concatenate(chunks, axis=1)
            label = self._label(name, idx, comp_count[name] > 1)
            rhat = self._rhat(chunks)
            lines.append(
                f"  {label:<12.12} mean {x.mean():9.3f}  sd {x.std():8.3f}"
                f"  R-hat {rhat:6.3f}"
            )
        return "\n".join(lines)

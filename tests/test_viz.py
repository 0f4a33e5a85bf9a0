"""Live terminal monitor (viz.py) — the streaming-viz companion."""

import io

import numpy as np

from exmc_tpu import Builder, dists
from exmc_tpu.nuts.sampler import sample_stream
from exmc_tpu.viz import LiveMonitor, sparkline


def test_sparkline_shape_and_monotone():
    s = sparkline(np.arange(10.0), width=10)
    assert len(s) == 10
    assert s[0] == "▁" and s[-1] == "█"
    assert sparkline([], width=5) == "     "
    assert len(sparkline(np.random.default_rng(0).normal(size=200),
                         width=28)) == 28


def test_live_monitor_streams_and_summarizes():
    ys = np.array([2.1, 1.8, 2.5, 2.0, 1.9, 2.3, 2.2, 1.7, 2.4, 2.6])
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "mu", dists.Normal, {"mu": 0.0, "sigma": 5.0})
    ir = Builder.rv(ir, "sigma", dists.HalfNormal, {"sigma": 2.0})
    ir = Builder.rv(ir, "x", dists.Normal, {"mu": "mu", "sigma": "sigma"})
    ir = Builder.obs(ir, "x_obs", "x", ys)

    buf = io.StringIO()
    mon = LiveMonitor(num_chains=8, total_draws=200, stream=buf,
                      ansi=False)
    trace, stats = sample_stream(ir, mon, num_chains=8, chunk_size=100,
                                 num_warmup=200, num_samples=200, seed=0)
    out = buf.getvalue()
    assert "exmc_tpu live" in out
    assert "R-hat" in out and "draws/s" in out
    assert "mu" in out and "sigma" in out
    # final frame reports the full draw count
    assert f"draw 200/200" in out
    summary = mon.render_summary()
    assert "streamed 200 draws x 8 chains" in summary
    # the monitor's accumulated moments agree with the returned trace
    line = [ln for ln in summary.splitlines() if ln.strip().startswith("mu")][0]
    mon_mean = float(line.split("mean")[1].split("sd")[0])
    assert abs(mon_mean - float(trace["mu"].mean())) < 1e-3


def test_live_monitor_vector_params_and_row_cap():
    rng = np.random.default_rng(0)
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "v", dists.Normal, {"mu": 0.0, "sigma": 1.0},
                    shape=(5,))
    ir = Builder.rv(ir, "y", dists.Normal, {"mu": "v", "sigma": 1.0},
                    shape=(5,))
    ir = Builder.obs(ir, "y_obs", "y", rng.normal(size=5))
    buf = io.StringIO()
    mon = LiveMonitor(num_chains=4, total_draws=100, stream=buf,
                      ansi=False, max_rows=3)
    sample_stream(ir, mon, num_chains=4, chunk_size=100,
                  num_warmup=100, num_samples=100, seed=1)
    out = buf.getvalue()
    assert "v[0]" in out and "v[2]" in out
    assert "v[3]" not in out  # row cap respected


def test_live_monitor_early_rhat_and_moment_exactness():
    """Regression (round-5 review): the segmented accumulator must
    produce a finite R-hat well before the stream midpoint, and its
    combined moments must match the exact batch values."""
    rng = np.random.default_rng(7)
    buf = io.StringIO()
    mon = LiveMonitor(num_chains=4, total_draws=1000, stream=buf,
                      ansi=False)
    draws = rng.normal(loc=3.0, size=(4, 300))
    # stream the first 300 of a notional 1000 draws in 3 chunks
    for s in range(0, 300, 100):
        mon(s, {"x": draws[:, s:s + 100]}, {})
    summary = mon.render_summary()
    line = [ln for ln in summary.splitlines() if "x" in ln][-1]
    assert "nan" not in line and "--" not in line  # finite R-hat at 30%
    mean = float(line.split("mean")[1].split("sd")[0])
    sd = float(line.split("sd")[1].split("R-hat")[0])
    # the summary prints 3 decimals; compare at format precision
    assert abs(mean - draws.mean()) < 5e-4
    assert abs(sd - draws.std()) < 0.02 * draws.std()

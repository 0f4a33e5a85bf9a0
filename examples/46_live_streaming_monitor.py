"""Live streaming monitor: watch convergence as draws arrive.

The terminal-native counterpart of the reference's livebook per-sample
viz consumer (reference README.md:229-234): ``sample_stream`` emits
chunk batches and ``LiveMonitor`` redraws a dashboard in place —
running means/sds, split R-hat of the draws so far, divergence count,
throughput, and a sparkline of each parameter's cross-chain mean
trajectory. Zero dependencies; chunk granularity because fine-grained
streaming is dispatch-bound on TPU (BENCHMARKS.md "Per-draw streaming
cost").

Run: python examples/46_live_streaming_monitor.py
"""

import os
import sys

import numpy as np

from exmc_tpu import Builder, dists, sample_stream
from exmc_tpu.viz import LiveMonitor

SMOKE = os.environ.get("EXMC_EXAMPLES_SMOKE") == "1"
WARM, DRAWS, CHUNK = (200, 200, 100) if SMOKE else (500, 1000, 100)

# eight schools — the flagship model, streamed
y = [28.0, 8.0, -3.0, 7.0, -1.0, 1.0, 18.0, 12.0]
sig = [15.0, 10.0, 16.0, 11.0, 9.0, 11.0, 10.0, 18.0]
ir = Builder.new_ir()
ir = Builder.rv(ir, "mu", dists.Normal, {"mu": 0.0, "sigma": 5.0})
ir = Builder.rv(ir, "tau", dists.HalfCauchy, {"scale": 5.0})
ir = Builder.rv(ir, "theta", dists.Normal, {"mu": "mu", "sigma": "tau"},
                shape=(8,))
ir = Builder.rv(ir, "y", dists.Normal,
                {"mu": "theta", "sigma": np.array(sig, np.float32)},
                shape=(8,))
ir = Builder.obs(ir, "y_obs", "y", np.array(y, np.float32))

mon = LiveMonitor(num_chains=16, total_draws=DRAWS,
                  params=["mu", "tau"], stream=sys.stdout)
trace, stats = sample_stream(
    ir, mon, num_chains=16, chunk_size=CHUNK,
    num_warmup=WARM, num_samples=DRAWS, seed=0,
)
print()
print(mon.render_summary())
assert abs(float(trace["mu"].mean()) - 4.4) < 1.5

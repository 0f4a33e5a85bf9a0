"""ChEES-HMC: a thousand chains in lockstep (DESIGN D-T29).

The TPU's answer to "more compute" is MORE CHAINS, not longer ones —
but vmapped NUTS makes every chain wait for the deepest tree each
iteration. ChEES-HMC (Hoffman, Radul & Sountsov 2021) runs every chain
the SAME number of leapfrog steps per iteration and adapts the shared
trajectory length from the cross-chain ChEES criterion, so the chain
batch stays in perfect lockstep. No reference counterpart (the
reference is NUTS-only, lib/exmc/nuts/sampler.ex) — this sampler
exists because it is the natively TPU-shaped transition.

Model: a 24-dim Gaussian posterior with scales spanning 1..8 — the
regime where trajectory-length adaptation matters. We sample it with
many short chains and read convergence with NESTED R-hat (the
many-short-chain diagnostic, Margossian et al. 2022) on superchains.
"""

import os
import time

import numpy as np

from exmc_tpu import Model, dists, sample_chees
from exmc_tpu.diagnostics import ess, nested_rhat, rhat

SMOKE = os.environ.get("EXMC_EXAMPLES_SMOKE") == "1"
CHAINS = 32 if SMOKE else 512
DRAWS = 100 if SMOKE else 300

sds = np.linspace(1.0, 8.0, 24)
with Model() as m:
    m.rv("x", dists.Normal, {"mu": np.zeros(24), "sigma": sds}, shape=(24,))

t0 = time.time()
trace, stats = sample_chees(
    m.ir, num_chains=CHAINS, num_warmup=300, num_samples=DRAWS, seed=0
)
wall = time.time() - t0

x = trace["x"]  # (chains, draws, 24)
worst_ess = min(ess(x[:, :, i]) for i in range(24))
worst_rhat = max(rhat(x[:, :, i]) for i in range(24))
# nested R-hat: group the chain batch into 8 superchains — with short
# chains, per-chain means are noisy and plain split R-hat is
# conservative; nested R-hat pools within superchains first.
worst_nested = max(nested_rhat(x[:, :, i], 8) for i in range(24))

print(f"chains={CHAINS} draws/chain={DRAWS} wall={wall:.1f}s")
print(f"adapted trajectory length T={float(stats['trajectory_length']):.2f} "
      f"eps={float(stats['step_size']):.3f} "
      f"mean leapfrog steps/iter={stats['num_steps_mean']:.1f}")
print(f"worst ESS={worst_ess:.0f} ({worst_ess / wall:.0f}/s)  "
      f"worst R-hat={worst_rhat:.4f}  nested R-hat={worst_nested:.4f}")
print(f"divergences: {int(stats['divergences'].sum())}")

assert worst_nested < 1.02
assert stats["divergences"].sum() == 0
np.testing.assert_allclose(x.reshape(-1, 24).std(axis=0), sds, rtol=0.2)
print("marginal scales recovered to 20%: OK")

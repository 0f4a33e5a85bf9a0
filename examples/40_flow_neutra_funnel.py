"""Flow VI + NeuTra-HMC: neural transport for bad geometry (D-T32).

The centered funnel — y ~ N(0, 3), x_i ~ N(0, exp(y/2)) — is the
canonical geometry plain HMC cannot sample: the step size that works
in the neck diverges in the mouth. exmc_tpu's auto-NCP rewrites it
away when the structure is visible in the IR; NeuTra (Hoffman et al.
2019) is the general answer when it is NOT: train an affine-coupling
flow q = f#N(0, I) on the same compiled log-density (flow_fit), then
run NUTS on the pulled-back density pi(f(z))|det J| in z-space, where
the geometry is approximately standard normal. The change of variables
is exact — flow quality only buys mixing speed, never correctness.

Beyond the reference (advi.ex is mean-field only, no transport).

Run: python examples/40_flow_neutra_funnel.py
"""

import os
import time

import numpy as np
import jax.numpy as jnp

from exmc_tpu import Model, dists, flow_fit, sample, sample_neutra
from exmc_tpu.diagnostics import ess, rhat

SMOKE = os.environ.get("EXMC_EXAMPLES_SMOKE") == "1"
FIT_ITERS = 400 if SMOKE else 4000
DRAWS = 200 if SMOKE else 1500


def funnel_ir():
    with Model() as m:
        m.rv("y", dists.Normal, {"mu": 0.0, "sigma": 3.0})
        m.det("sc", lambda y: jnp.exp(y / 2), ["y"])
        m.rv("x", dists.Normal, {"mu": np.zeros(4), "sigma": "sc"},
             shape=(4,))
    return m.ir


# --- 1. the failure mode: centered NUTS (auto-NCP off) ---------------
trace, stats = sample(funnel_ir(), ncp=False, num_chains=4,
                      num_warmup=300 if SMOKE else 800,
                      num_samples=DRAWS, seed=0)
y = trace["y"]
print(f"centered NUTS : y sd {y.std():.2f} (truth 3.0), "
      f"div {int(stats['divergences'].sum())}, R-hat {rhat(y):.3f}"
      "   <- biased: the neck is unreachable")

# --- 2. train the transport ------------------------------------------
t0 = time.time()
fit = flow_fit(funnel_ir(), ncp=False, num_iters=FIT_ITERS,
               num_elbo_draws=32, num_layers=6, lr=3e-3, seed=1)
print(f"flow fit      : {time.time() - t0:.1f}s, "
      f"ELBO {fit.elbo_history[-50:].mean():.3f} "
      f"(log evidence is 0 for this prior-only model), "
      f"Pareto k {fit.psis_diagnostic(num_draws=1000):.2f}")

# --- 3. NeuTra: exact MCMC through the flow ---------------------------
trace, stats = sample_neutra(funnel_ir(), flow=fit, ncp=False,
                             num_chains=4, num_warmup=300 if SMOKE else 500,
                             num_samples=DRAWS, seed=0, target_accept=0.9)
y = trace["y"]
print(f"NeuTra-NUTS   : y mean {y.mean():+.3f} sd {y.std():.2f} "
      f"(truth 0, 3.0), div {int(stats['divergences'].sum())}, "
      f"R-hat {rhat(y):.4f}, ESS {ess(y):.0f}")

if not SMOKE:
    assert abs(y.mean()) < 0.4 and abs(y.std() - 3.0) < 0.4
    assert rhat(y) < 1.02
print("OK")

"""Long time-series inference by Laplace marginalization (INLA-within-MCMC).

The wall every full-path sampler hits (reference
docs/STATE_SPACE_MODELS.md benchmarks T=100 and stops): a stochastic-
volatility model at T=5000 is a 5002-dimensional posterior whose
(path, sigma) geometry no constant metric mixes — on-chip the full
path ran 26 minutes and still had max R-hat 1.68 (LONGT.json).

This example shows the exmc_tpu answer (marginal.py, D-T23/D-T37):
MARGINALIZE the latent path with a Laplace approximation. The GRW
prior precision is tridiagonal, so the mode-finding Newton, the
log-determinants, and the latent variances are all O(T) blocked
parallel-prefix scans, and the marginal log-density drops into the
standard NUTS kernel as a Custom likelihood — a TWO-dimensional
sampling problem at any T. Gradients come from the implicit-function
theorem at the mode (one extra tridiagonal solve per pullback instead
of backprop through every Newton iteration — D-T37, 4.9x).

Three rungs, cheapest first:
  1. sv_inla: full INLA — hyperparameter grid + quadrature, no MCMC.
  2. NUTS on sv_marginal_model: exact MCMC over (sigma, nu) under the
     Laplace-marginal likelihood.
  3. Latent-path readout: the INLA mixture's path mean/sd bands.
"""

import os

import numpy as np

from exmc_tpu import sample
from exmc_tpu.benchmarks.suite import sv_model
from exmc_tpu.diagnostics import ess, rhat
from exmc_tpu.marginal import sv_inla, sv_marginal_model

SMOKE = os.environ.get("EXMC_EXAMPLES_SMOKE") == "1"
T = 300 if SMOKE else 2000
WARM = 200 if SMOKE else 500
DRAWS = 200 if SMOKE else 1000

# simulated returns from the suite's SV generative process
ir_full = sv_model(t=T)
r = np.asarray(ir_full.nodes["r_obs"].op[2])
print(f"T={T} returns, full-path dimension would be {T + 2}")

# ---- rung 1: pure INLA (seconds, no MCMC) -------------------------------
grid_kw = (dict(sigma_grid=np.geomspace(0.005, 0.2, 15),
                nu_grid=np.geomspace(2.0, 60.0, 15), newton_iters=10)
           # grid_batch bounds each device call: one unbatched
           # 1600-point call at long T kernel-faults the remote TPU
           # worker's multi-minute-call watchdog (marginal.py docstring)
           if SMOKE else dict(newton_iters=15, grid_batch=64))
inla = sv_inla(r, **grid_kw)
print(f"INLA:  sigma = {inla['sigma_mean']:.4f} +- {inla['sigma_sd']:.4f}"
      f"   nu = {inla['nu_mean']:.1f} +- {inla['nu_sd']:.1f}"
      f"   (failed grid points: {inla['n_failed']})")

# ---- rung 2: NUTS on the 2-d marginalized model -------------------------
ir_m = sv_marginal_model(r, newton_iters=10 if SMOKE else 15)
trace, stats = sample(ir_m, ncp=False, num_chains=4, num_warmup=WARM,
                      num_samples=DRAWS, seed=0)
sig = trace["sigma"]
nu = trace["nu"]
print(f"NUTS:  sigma = {float(sig.mean()):.4f} +- {float(sig.std()):.4f}"
      f"   nu = {float(nu.mean()):.1f} +- {float(nu.std()):.1f}")
print(f"       R-hat sigma {float(rhat(sig)):.3f} / nu {float(rhat(nu)):.3f},"
      f" min ESS {min(float(ess(sig)), float(ess(nu))):.0f},"
      f" divergences {int(np.asarray(stats['divergences']).sum())}")

# the two rungs are the SAME approximation integrated two ways — they
# must agree within the posterior's own scale
z_sig = abs(float(sig.mean()) - inla["sigma_mean"]) / inla["sigma_sd"]
z_nu = abs(float(nu.mean()) - inla["nu_mean"]) / inla["nu_sd"]
print(f"agreement z-scores: sigma {z_sig:.2f}, nu {z_nu:.2f}")
assert z_sig < 3.0 and z_nu < 3.0

# ---- rung 3: latent-path readout from the INLA mixture ------------------
mid = T // 2
print(f"latent log-vol band at t={mid}: "
      f"{inla['path_mean'][mid]:.2f} +- {inla['path_sd'][mid]:.2f}")
print("OK")

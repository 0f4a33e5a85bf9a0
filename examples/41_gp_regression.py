"""Gaussian-process regression and classification (D-T33).

Two GP formulations on the same NUTS machinery:

* marginal — Gaussian noise lets f integrate out analytically, so only
  three hyperparameters are sampled against y ~ MvNormal(0, K + sn^2 I)
  (one MXU Cholesky per log-density evaluation);
* whitened latent — for the Bernoulli classifier f cannot integrate
  out; z ~ N(0, I), f = L(theta) z keeps NUTS in an identity-metric
  space whatever the sampled hyperparameters do to K.

Predictions at new inputs come from the exact conditional
N(Ks^T K^-1 f, Kss - Ks^T K^-1 Ks), vmapped over posterior draws.
Beyond the reference (borodark/exmc has no GP surface).

Run: python examples/41_gp_regression.py
"""

import os

import numpy as np

from exmc_tpu import Model, dists, sample
from exmc_tpu.diagnostics import rhat
from exmc_tpu.gp import gp_latent, gp_marginal, gp_predict

SMOKE = os.environ.get("EXMC_EXAMPLES_SMOKE") == "1"
N = 20 if SMOKE else 50
WARM, DRAWS = (200, 200) if SMOKE else (500, 500)

rng = np.random.default_rng(0)
X = np.sort(rng.uniform(-3, 3, N))
y = np.sin(2 * X) + 0.2 * rng.normal(size=N)

# --- marginal GP regression ------------------------------------------
with Model() as m:
    m.rv("ls", dists.HalfNormal, {"sigma": 2.0})
    m.rv("amp", dists.HalfNormal, {"sigma": 2.0})
    m.rv("sn", dists.HalfNormal, {"sigma": 1.0})
    gp_marginal(m, "y", X, y, kernel="rbf", lengthscale="ls",
                variance="amp", noise="sn")
trace, stats = sample(m.ir, num_chains=2, num_warmup=WARM,
                      num_samples=DRAWS, seed=0)
print(f"regression    : ls {trace['ls'].mean():.2f}  "
      f"noise {trace['sn'].mean():.2f} (truth 0.2)  "
      f"div {int(stats['divergences'].sum())}  "
      f"R-hat(ls) {rhat(trace['ls']):.3f}")

Xs = np.linspace(-3, 3, 60)
fs = gp_predict(trace, X, Xs, kernel="rbf", lengthscale="ls",
                variance="amp", noise="sn", y=y, num_draws=200)
err = np.abs(fs.mean(0) - np.sin(2 * Xs)).mean()
print(f"prediction    : mean |f_hat - sin(2x)| = {err:.3f}  "
      f"(posterior sd band {fs.std(0).mean():.3f})")

# --- latent GP classification ----------------------------------------
p_true = 1 / (1 + np.exp(-3 * np.sin(2 * X)))
yb = (rng.uniform(size=N) < p_true).astype(np.int32)
with Model() as mc:
    mc.rv("ls", dists.HalfNormal, {"sigma": 2.0})
    mc.rv("amp", dists.HalfNormal, {"sigma": 3.0})
    gp_latent(mc, "f", X, kernel="rbf", lengthscale="ls", variance="amp")
    mc.rv("yb", dists.Bernoulli, {"logits": "f"}, shape=(N,))
    mc.obs("yb_obs", "yb", yb)
trc, stc = sample(mc.ir, num_chains=2, num_warmup=WARM,
                  num_samples=DRAWS, seed=1, target_accept=0.9)
fs = gp_predict(trc, X, Xs, kernel="rbf", lengthscale="ls",
                variance="amp", f_name="f", jitter=1e-4, num_draws=200)
p_pred = (1 / (1 + np.exp(-fs))).mean(0)
agree = ((p_pred > 0.5) == (np.sin(2 * Xs) > 0)).mean()
print(f"classification: div {int(stc['divergences'].sum())}  "
      f"decision agreement with truth {agree:.2f}")

if not SMOKE:
    assert err < 0.25 and agree > 0.85
print("OK")

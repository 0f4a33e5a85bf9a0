"""AR latents two ways: exact Kalman (Gaussian obs) and Laplace
marginal NUTS (any obs), with the AR(1) persistence phi SAMPLED.

Round-5 features (reference docs/STATE_SPACE_MODELS.md family):
``exmc_tpu.kalman`` — exact filter/smoother/loglik for linear-Gaussian
state space; ``make_ar1_marginal`` — Laplace marginalization of a
stationary AR(1) latent with both hyperparameters free.

Run: python examples/47_ar_latents_and_kalman.py
"""

import os

import numpy as np
import jax.numpy as jnp

from exmc_tpu import Builder, dists, sample
from exmc_tpu.kalman import add_obs_noise, ar_ssm, kalman_smoother
from exmc_tpu.marginal import make_ar1_marginal

SMOKE = os.environ.get("EXMC_EXAMPLES_SMOKE") == "1"
T = 150 if SMOKE else 400
WARM, DRAWS = (150, 150) if SMOKE else (500, 500)

# simulate a persistent AR(1) latent observed in Gaussian noise
rng = np.random.default_rng(0)
phi_true, sig_true, r_sd = 0.9, 0.35, 0.5
s = np.zeros(T)
s[0] = rng.normal(0, sig_true / np.sqrt(1 - phi_true**2))
for t in range(1, T):
    s[t] = phi_true * s[t - 1] + rng.normal(0, sig_true)
ys = s + rng.normal(0, r_sd, T)
yj = jnp.asarray(ys, jnp.float32)

# --- NUTS on the marginal: free RVs are just (sigma, phi) -----------
def loglik(path, theta):
    return -0.5 * ((yj - path) / r_sd) ** 2


marginal = make_ar1_marginal(loglik, T, newton_iters=8)


def lp(_value, params, data=None):
    logZ, _, _ = marginal(params["sigma"], params["phi"], {})
    return logZ


lik = dists.Custom(logpdf_fn=lp, support="real")
ir = Builder.new_ir()
ir = Builder.rv(ir, "sigma", dists.HalfNormal, {"sigma": 1.0})
ir = Builder.rv(ir, "phi", dists.Uniform, {"lower": -0.99, "upper": 0.99})
ir = Builder.rv(ir, "lik", lik, {"sigma": "sigma", "phi": "phi"})
ir = Builder.obs(ir, "lik_obs", "lik", 0.0)
trace, stats = sample(ir, ncp=False, num_chains=4,
                      num_warmup=WARM, num_samples=DRAWS, seed=0)
phi_mean = float(trace["phi"].mean())
sig_mean = float(trace["sigma"].mean())
print(f"posterior phi  {phi_mean:.3f} (true {phi_true})")
print(f"posterior sig  {sig_mean:.3f} (true {sig_true})")
assert abs(phi_mean - phi_true) < 0.15
assert stats["divergences"].sum() == 0

# --- exact latent bands at the posterior-mean hyperparameters -------
ssm = add_obs_noise(ar_ssm(np.array([phi_mean]), sig_mean), r_sd**2)
mu_s, P_s = kalman_smoother(ssm, ys)
band = np.sqrt(np.asarray(P_s)[:, 0, 0])
inside = np.abs(np.asarray(mu_s)[:, 0] - s) < 2.5 * band
print(f"latent path: {inside.mean():.0%} inside the 2.5-sd Kalman band")
assert inside.mean() > 0.9

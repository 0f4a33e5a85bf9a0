"""Hidden Markov model: regime-switching Gaussian emissions (D-T34).

Discrete latent states never enter the NUTS chain: the forward
algorithm marginalizes them exactly inside the compiled log-density
(one lax.scan of K x K logsumexp contractions — the Stan-manual
approach, natively TPU-shaped). Label switching is broken by an
``ordered`` transform on the state means. After sampling, the states
are recovered by forward-backward smoothing and Viterbi decoding.
Beyond the reference (no discrete-latent machinery in borodark/exmc).

Run: python examples/42_hmm_regime_switching.py
"""

import os

import numpy as np
import jax.numpy as jnp

from exmc_tpu import Model, dists, sample
from exmc_tpu.diagnostics import rhat
from exmc_tpu.hmm import hmm_dist, posterior_state_probs, viterbi

SMOKE = os.environ.get("EXMC_EXAMPLES_SMOKE") == "1"
T = 120 if SMOKE else 400
WARM, DRAWS = (200, 200) if SMOKE else (400, 500)

# --- simulate a 2-regime series ---------------------------------------
rng = np.random.default_rng(0)
TRANS = np.array([[0.92, 0.08], [0.15, 0.85]])
MUS, SIGMA = np.array([-0.8, 1.6]), 0.6
s = np.zeros(T, int)
for t in range(1, T):
    s[t] = rng.choice(2, p=TRANS[s[t - 1]])
y = (MUS[s] + SIGMA * rng.normal(size=T)).astype(np.float32)


def emission(yv, k, params):
    z = (yv - params["mus"][k]) / params["sigma"]
    return -0.5 * z * z - jnp.log(params["sigma"]) \
        - 0.5 * np.log(2 * np.pi)


with Model() as m:
    m.rv("mus", dists.Normal, {"mu": 0.0, "sigma": 3.0},
         transform="ordered", shape=(2,))
    m.rv("sigma", dists.HalfNormal, {"sigma": 2.0})
    m.rv("p00", dists.Beta, {"alpha": 2.0, "beta": 2.0})
    m.rv("p11", dists.Beta, {"alpha": 2.0, "beta": 2.0})
    m.det("trans", lambda a, b: jnp.stack(
        [jnp.stack([a, 1 - a]), jnp.stack([1 - b, b])]), ["p00", "p11"])
    m.rv("y", hmm_dist(emission, 2, stationary_init=True),
         {"trans": "trans", "mus": "mus", "sigma": "sigma"})
    m.obs("y_obs", "y", y)

trace, stats = sample(m.ir, num_chains=2, num_warmup=WARM,
                      num_samples=DRAWS, seed=0)
mus_post = trace["mus"].reshape(-1, 2).mean(axis=0)
print(f"params : mus {mus_post.round(2)} (truth {MUS})  "
      f"sigma {trace['sigma'].mean():.2f} (truth {SIGMA})  "
      f"stay probs {trace['p00'].mean():.2f}/{trace['p11'].mean():.2f} "
      f"(truth 0.92/0.85)  div {int(stats['divergences'].sum())}  "
      f"R-hat(mus0) {rhat(trace['mus'][:, :, 0]):.3f}")

params = {
    "mus": jnp.asarray(mus_post),
    "sigma": jnp.asarray(trace["sigma"].mean()),
    "trans": jnp.asarray([[trace["p00"].mean(), 1 - trace["p00"].mean()],
                          [1 - trace["p11"].mean(), trace["p11"].mean()]]),
}
gamma = np.asarray(posterior_state_probs(emission, y, params, 2, stationary_init=True))
path = np.asarray(viterbi(emission, y, params, 2, stationary_init=True))
acc_s = ((gamma[:, 1] > 0.5).astype(int) == s).mean()
acc_v = (path == s).mean()
print(f"decode : smoothing accuracy {acc_s:.2f}, Viterbi {acc_v:.2f}")

if not SMOKE:
    assert np.abs(mus_post - MUS).max() < 0.3 and acc_v > 0.85
print("OK")

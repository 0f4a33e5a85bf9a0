"""BDA-cyber ch. 10 — Rejection/importance sampling on a traffic
mixture (reference notebooks/bda-cyber/ch10_anomaly_sampling.livemd;
the security edition of ch. 10's toy target).

Target: log connection duration as a 3-component mixture — benign bulk
(70%), short-scan component (20%), and a small C2-beacon mode (10%).
Rejection sampling with a wide envelope draws exact samples; importance
sampling keeps every draw but the ESS shows what the C2 mode costs a
mismatched proposal — the anomaly-scoring quantity P(duration in the
C2 band) computed three ways.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp

SMOKE = os.environ.get("EXMC_EXAMPLES_SMOKE") == "1"

W = jnp.array([0.70, 0.20, 0.10])
M = jnp.array([2.0, -1.0, 5.5])     # log-seconds: benign, scans, C2
S = jnp.array([1.0, 0.5, 0.3])

MEAN_EXACT = float(jnp.sum(W * M))
C2_BAND = (4.9, 6.1)
from scipy import stats as _sps

P_C2_EXACT = float(sum(
    w * (_sps.norm.cdf(C2_BAND[1], m, s) - _sps.norm.cdf(C2_BAND[0], m, s))
    for w, m, s in zip(np.asarray(W), np.asarray(M), np.asarray(S))))


def target_pdf(x):
    z = (x[..., None] - M) / S
    return jnp.sum(W * jnp.exp(-0.5 * z * z) / (S * jnp.sqrt(2 * jnp.pi)),
                   axis=-1)


def proposal(key, n, mu=2.0, sd=2.5):
    return mu + sd * jax.random.normal(key, (n,))


def proposal_logpdf(x, mu=2.0, sd=2.5):
    return -0.5 * ((x - mu) / sd) ** 2 - jnp.log(sd * jnp.sqrt(2 * jnp.pi))


def main():
    n = 20_000 if SMOKE else 400_000
    key = jax.random.PRNGKey(0)

    grid = jnp.linspace(-6, 10, 8001)
    m_const = 1.05 * jnp.max(target_pdf(grid)
                             / jnp.exp(proposal_logpdf(grid)))
    xs = proposal(key, n)
    u = jax.random.uniform(jax.random.fold_in(key, 1), (n,))
    keep = u < target_pdf(xs) / (m_const * jnp.exp(proposal_logpdf(xs)))
    draws = xs[keep]
    p_c2_rej = float(jnp.mean((draws > C2_BAND[0]) & (draws < C2_BAND[1])))
    print(f"[rejection ] M={float(m_const):.2f}, acceptance "
          f"{float(keep.mean()):.1%}; P(C2 band) = {p_c2_rej:.4f} "
          f"(exact {P_C2_EXACT:.4f})")

    xs2 = proposal(jax.random.fold_in(key, 2), n)
    log_w = jnp.log(target_pdf(xs2)) - proposal_logpdf(xs2)
    w = jnp.exp(log_w - log_w.max())
    w = w / w.sum()
    in_band = (xs2 > C2_BAND[0]) & (xs2 < C2_BAND[1])
    p_c2_is = float(jnp.sum(jnp.where(in_band, w, 0.0)))
    ess = float(1.0 / jnp.sum(w * w))
    print(f"[importance] P(C2 band) = {p_c2_is:.4f}, "
          f"ESS {ess:.0f}/{n} ({ess / n:.1%}) — every draw kept, the "
          "isolated C2 mode taxes the weights")

    assert abs(float(draws.mean()) - MEAN_EXACT) < 0.05
    assert abs(p_c2_rej - P_C2_EXACT) < 0.01
    assert abs(p_c2_is - P_C2_EXACT) < 0.01
    print("anomaly sampling OK: both estimators agree with the exact "
          "mixture mass")


if __name__ == "__main__":
    main()

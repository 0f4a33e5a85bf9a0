"""BDA3 ch. 10 — Rejection and importance sampling from scratch
(reference notebooks/bda/ch10_rejection_importance.livemd; Vehtari
demos 10.1-10.2).

Target: an asymmetric bimodal 3-component Gaussian mixture (the
notebook's 'funky target'). Both classic samplers implemented in a few
lines of vectorized jax — drawing ALL proposals in one batch is the
TPU idiom (the notebook loops per draw on the BEAM):

  * rejection with a t-like wide Normal envelope: exact draws, but
    acceptance collapses as dimension/mismatch grows;
  * importance sampling with the SAME proposal: no rejections, but the
    effective sample size tells you what the weights cost;
  * the ch. 4 tie-in: IS reweights the bioassay Laplace approximation
    to recover the exact P(beta > 0) the Gaussian got wrong.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp

SMOKE = os.environ.get("EXMC_EXAMPLES_SMOKE") == "1"

W = jnp.array([0.5, 0.3, 0.2])
M = jnp.array([-0.8, 0.6, 1.7])
S = jnp.array([0.45, 0.30, 0.50])


def target_pdf(x):
    z = (x[..., None] - M) / S
    comp = jnp.exp(-0.5 * z * z) / (S * jnp.sqrt(2 * jnp.pi))
    return jnp.sum(W * comp, axis=-1)


# exact moments of the mixture for the assertions
MEAN_EXACT = float(jnp.sum(W * M))
VAR_EXACT = float(jnp.sum(W * (S**2 + M**2)) - MEAN_EXACT**2)


def proposal_logpdf(x, mu=0.2, sd=1.6):
    return -0.5 * ((x - mu) / sd) ** 2 - jnp.log(sd * jnp.sqrt(2 * jnp.pi))


def rejection(key, n):
    xs = 0.2 + 1.6 * jax.random.normal(key, (n,))
    g = jnp.exp(proposal_logpdf(xs))
    # envelope constant from a dense scan of f/g, + 5% pad (the
    # notebook's recipe)
    grid = jnp.linspace(-5, 5, 4001)
    m_const = 1.05 * jnp.max(target_pdf(grid)
                             / jnp.exp(proposal_logpdf(grid)))
    u = jax.random.uniform(jax.random.fold_in(key, 1), (n,))
    accept = u < target_pdf(xs) / (m_const * g)
    return xs[accept], float(accept.mean()), float(m_const)


def importance(key, n):
    xs = 0.2 + 1.6 * jax.random.normal(key, (n,))
    log_w = jnp.log(target_pdf(xs)) - proposal_logpdf(xs)
    w = jnp.exp(log_w - log_w.max())
    w = w / w.sum()
    mean = float(jnp.sum(w * xs))
    ess = float(1.0 / jnp.sum(w * w))
    return mean, ess


def bioassay_is_fix(key, n):
    """Reweight ch. 4's Laplace approximation to the exact bioassay
    posterior: importance weights = exact/gaussian."""
    dose = jnp.array([-0.86, -0.30, -0.05, 0.73])
    na = jnp.array([5.0, 5.0, 5.0, 5.0])
    de = jnp.array([0.0, 1.0, 3.0, 5.0])

    def log_post(th):
        eta = th[..., 0:1] + th[..., 1:2] * dose
        return jnp.sum(de * eta - na * jnp.logaddexp(0.0, eta), axis=-1)

    mode = jnp.array([0.8466, 7.7488])
    cov = jnp.array([[1.0397, 3.1744], [3.1744, 23.7414]])  # -H^-1 at mode
    chol = jnp.linalg.cholesky(cov)
    z = jax.random.normal(key, (n, 2))
    draws = mode + z @ chol.T
    sol = jax.scipy.linalg.solve_triangular(chol, (draws - mode).T,
                                            lower=True).T
    log_q = -0.5 * jnp.sum(sol * sol, axis=1)
    log_w = log_post(draws) - log_q
    w = jnp.exp(log_w - log_w.max())
    w = w / w.sum()
    p_raw = float(jnp.mean(draws[:, 1] > 0))
    p_is = float(jnp.sum(jnp.where(draws[:, 1] > 0, w, 0.0)))
    ess = float(1.0 / jnp.sum(w * w))
    return p_raw, p_is, ess


def main():
    n = 20_000 if SMOKE else 200_000
    key = jax.random.PRNGKey(0)

    draws, acc_rate, m_const = rejection(key, n)
    print(f"[rejection ] M={m_const:.2f}, acceptance {acc_rate:.1%}, "
          f"{draws.shape[0]} exact draws; mean {float(draws.mean()):.3f} "
          f"(exact {MEAN_EXACT:.3f})")
    assert abs(float(draws.mean()) - MEAN_EXACT) < 0.05
    assert abs(float(draws.var()) - VAR_EXACT) < 0.1

    mean_is, ess = importance(jax.random.fold_in(key, 2), n)
    print(f"[importance] mean {mean_is:.3f}, ESS {ess:.0f}/{n} "
          f"({ess / n:.1%} efficiency — every draw kept, weights pay)")
    assert abs(mean_is - MEAN_EXACT) < 0.05

    p_raw, p_is, ess_b = bioassay_is_fix(jax.random.fold_in(key, 3), n)
    print(f"[bioassay  ] P(beta>0): laplace {p_raw:.4f} -> IS {p_is:.4f} "
          f"(exact ~1.0; IS-ESS {ess_b:.0f})")
    assert p_is > p_raw and p_is > 0.999
    print("rejection/importance OK")


if __name__ == "__main__":
    main()

"""BDA3 ch. 2 — Beta-Binomial: placenta previa (reference
notebooks/bda/ch02_beta_binomial.livemd; Vehtari's demos 2.1-2.4).

A 1980s German study: 980 births under placenta previa, 437 girls.
Population baseline P(girl) = 0.485. Does the condition shift the sex
ratio?

Four takes, matching the notebook's pedagogy:
  1. exact conjugate Beta posterior;
  2. prior-sensitivity sweep (the 980-obs likelihood dominates);
  3. Monte Carlo answer from NUTS on the same model (the framework path);
  4. a NON-conjugate truncated prior handled on a grid — vmapped, the
     TPU answer to "no closed form".
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
from scipy import stats as sps

from exmc_tpu import Builder, dists, sample

SMOKE = os.environ.get("EXMC_EXAMPLES_SMOKE") == "1"

Y, N = 437, 980
BASELINE = 0.485


def exact_conjugate():
    # uniform Beta(1,1) prior -> posterior Beta(1+y, 1+n-y)
    a, b = 1 + Y, 1 + N - Y
    mean = a / (a + b)
    p_below = sps.beta.cdf(BASELINE, a, b)
    lo, hi = sps.beta.ppf([0.025, 0.975], a, b)
    print(f"[exact]  posterior mean {mean:.4f}, 95% CI ({lo:.3f}, {hi:.3f})")
    print(f"[exact]  P(theta < {BASELINE}) = {p_below:.4f}")
    return mean


def prior_sensitivity():
    # BDA table 2.1: priors centered at 0.485 with growing pseudo-counts
    print("[sweep]  prior n_0 | posterior mean (all barely move):")
    for n0 in (2, 20, 200):
        a, b = 0.485 * n0 + Y, 0.515 * n0 + (N - Y)
        print(f"         {n0:>9} | {a / (a + b):.4f}")


def nuts_version():
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "theta", dists.Beta, {"alpha": 1.0, "beta": 1.0})
    ir = Builder.rv(ir, "y", dists.Binomial, {"n": float(N), "p": "theta"})
    ir = Builder.obs(ir, "y_obs", "y", float(Y))
    n = 200 if SMOKE else 1000
    trace, _ = sample(ir, num_chains=4, num_warmup=n, num_samples=n, seed=0)
    th = np.asarray(trace["theta"]).ravel()
    print(f"[nuts]   posterior mean {th.mean():.4f}, "
          f"P(theta < {BASELINE}) = {(th < BASELINE).mean():.4f}")
    return th


def nonconjugate_grid():
    """Prior: piecewise 'trapezoid' concentrated on (0.385, 0.585) as in
    demo 2.4 — no conjugacy; the posterior is a dense vmapped grid."""
    grid = jnp.linspace(0.001, 0.999, 2001)

    def log_prior(t):
        # flat ramp up to [0.485 +- 0.1], linear decay outside
        core = jnp.where((t > 0.385) & (t < 0.585), 1.0, 0.025)
        return jnp.log(core)

    lp = (log_prior(grid) + Y * jnp.log(grid)
          + (N - Y) * jnp.log1p(-grid))
    w = jnp.exp(lp - lp.max())
    w = w / jnp.trapezoid(w, grid)
    mean = float(jnp.trapezoid(w * grid, grid))
    cdf = jnp.cumsum(w) * (grid[1] - grid[0])
    p_below = float(cdf[jnp.searchsorted(grid, BASELINE)])
    print(f"[grid]   non-conjugate posterior mean {mean:.4f}, "
          f"P(theta < {BASELINE}) = {p_below:.4f}")
    return mean


def main():
    m_exact = exact_conjugate()
    prior_sensitivity()
    th = nuts_version()
    m_grid = nonconjugate_grid()
    assert abs(float(np.mean(th)) - m_exact) < 0.01
    assert abs(m_grid - m_exact) < 0.01
    print("beta-binomial OK: NUTS and grid agree with the conjugate answer")
    return m_exact


if __name__ == "__main__":
    main()

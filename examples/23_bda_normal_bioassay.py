"""BDA3 ch. 3 — Normal model & bioassay (reference
notebooks/bda/ch03_normal_and_bioassay.livemd; Vehtari demos 3.1-3.4).

Part 1: Newcomb's 1882 light-speed measurements (66 REAL values, two
gross outliers) under the conjugate normal-with-unknown-mean-and-
variance model — exact marginal t posterior vs NUTS.

Part 2: bioassay (BDA3 p. 86) — 4 dose levels, 5 animals each,
logistic dose-response with a flat prior. No closed form: the
posterior lives on a vmapped 2-d grid; LD50 derived from grid draws,
then cross-checked with NUTS.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp

from exmc_tpu import Builder, dists, sample

SMOKE = os.environ.get("EXMC_EXAMPLES_SMOKE") == "1"

# Newcomb 1882 (BDA3 table 3.1): deviations from 24800 ns
LIGHT = np.array([
    28, 26, 33, 24, 34, -44, 27, 16, 40, -2,
    29, 22, 24, 21, 25, 30, 23, 29, 31, 19,
    24, 20, 36, 32, 36, 28, 25, 21, 28, 29,
    37, 25, 28, 26, 30, 32, 36, 26, 30, 22,
    36, 23, 27, 27, 28, 27, 31, 27, 26, 33,
    26, 32, 32, 24, 39, 28, 24, 25, 32, 25,
    29, 27, 28, 29, 16, 23], dtype=np.float64)

# bioassay (BDA3 p. 86)
DOSE = np.array([-0.86, -0.30, -0.05, 0.73])
N_ANIMALS = np.array([5.0, 5.0, 5.0, 5.0])
DEATHS = np.array([0.0, 1.0, 3.0, 5.0])


def newcomb():
    n = len(LIGHT)
    ybar, s2 = LIGHT.mean(), LIGHT.var(ddof=1)
    # noninformative p(mu, sigma^2) ∝ 1/sigma^2: mu | y ~ t_{n-1}(ybar, s/sqrt(n))
    from scipy import stats as sps

    se = np.sqrt(s2 / n)
    lo, hi = sps.t.ppf([0.025, 0.975], n - 1, loc=ybar, scale=se)
    print(f"[newcomb exact] mu | y ~ t_65({ybar:.2f}, {se:.3f}); "
          f"95% CI ({lo:.2f}, {hi:.2f})")
    print("  true value (modern constants): 33.0 — the Normal model's CI "
          "misses it; the -44 outlier drags the mean. Ch. 6 shows how "
          "predictive checks catch this.")

    ir = Builder.new_ir()
    ir = Builder.rv(ir, "mu", dists.Normal, {"mu": 0.0, "sigma": 100.0})
    ir = Builder.rv(ir, "sigma", dists.HalfNormal, {"sigma": 50.0})
    ir = Builder.rv(ir, "y", dists.Normal, {"mu": "mu", "sigma": "sigma"},
                    shape=(n,))
    ir = Builder.obs(ir, "y_obs", "y", LIGHT.astype(np.float32))
    k = 200 if SMOKE else 1000
    trace, _ = sample(ir, num_chains=4, num_warmup=k, num_samples=k, seed=0)
    mu = np.asarray(trace["mu"]).ravel()
    print(f"[newcomb nuts]  mu mean {mu.mean():.2f} (exact {ybar:.2f})")
    assert abs(mu.mean() - ybar) < 3 * se
    return ybar


def bioassay_grid(num_draws=4000):
    a_grid = jnp.linspace(-4.0, 8.0, 300)
    b_grid = jnp.linspace(-10.0, 40.0, 300)
    A, B = jnp.meshgrid(a_grid, b_grid, indexing="ij")

    x = jnp.asarray(DOSE)
    nn = jnp.asarray(N_ANIMALS)
    yy = jnp.asarray(DEATHS)

    def loglik(a, b):
        eta = a + b * x
        return jnp.sum(yy * eta - nn * jnp.logaddexp(0.0, eta))

    lp = jax.vmap(jax.vmap(loglik))(A, B)   # flat prior: likelihood only
    w = jnp.exp(lp - lp.max())
    w = w / w.sum()

    # draws by inverse-CDF on the flattened grid (demo 3.4's recipe)
    key = jax.random.PRNGKey(0)
    idx = jax.random.choice(key, w.size, (num_draws,), p=w.reshape(-1))
    a_s = A.reshape(-1)[idx]
    b_s = B.reshape(-1)[idx]
    p_pos = float(jnp.mean(b_s > 0))
    ld50 = np.asarray(-a_s / jnp.where(b_s > 0, b_s, jnp.nan))
    ld50 = ld50[np.isfinite(ld50)]
    print(f"[bioassay grid] P(beta > 0) = {p_pos:.4f}; "
          f"LD50 mean {ld50.mean():.3f} (BDA3: ~ -0.10 +- 0.09)")
    return float(ld50.mean())


def bioassay_nuts():
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "alpha", dists.Flat, {})
    ir = Builder.rv(ir, "beta", dists.Flat, {})
    ir = Builder.det(ir, "eta",
                     lambda a, b: a + b * jnp.asarray(DOSE, jnp.float32),
                     ["alpha", "beta"])
    ir = Builder.rv(ir, "deaths", dists.Binomial,
                    {"n": N_ANIMALS.astype(np.float32), "logits": "eta"},
                    shape=(4,))
    ir = Builder.obs(ir, "d_obs", "deaths", DEATHS.astype(np.float32))
    k = 200 if SMOKE else 1000
    trace, _ = sample(ir, num_chains=4, num_warmup=max(500, k),
                      num_samples=k, seed=0)
    a = np.asarray(trace["alpha"]).ravel()
    b = np.asarray(trace["beta"]).ravel()
    keep = b > 0
    ld50 = float(np.mean(-a[keep] / b[keep]))
    print(f"[bioassay nuts] LD50 mean {ld50:.3f}")
    return ld50


def main():
    newcomb()
    ld_grid = bioassay_grid()
    ld_nuts = bioassay_nuts()
    assert abs(ld_grid - ld_nuts) < 0.06, (ld_grid, ld_nuts)
    print("bioassay OK: grid and NUTS agree on LD50")


if __name__ == "__main__":
    main()

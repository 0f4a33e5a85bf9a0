"""Correlated random effects: varying intercept AND slope per group
with an LKJ prior on their correlation (round-3 capability; the
canonical `(1 + x | group)` model of multilevel regression — Gelman &
Hill ch. 13 — which needs a full covariance prior, not just scales).

Groups with steep slopes tend to have high intercepts (rho = 0.6
here); modelling that correlation shares strength BETWEEN the two
effect dimensions, not just across groups. The covariance prior is the
standard decomposition

    Sigma = diag(sigma) . L L' . diag(sigma),   L ~ LKJCholesky(eta=2)

with non-centered effects: (a_g, b_g) = mu + diag(sigma) L z_g,
z_g ~ N(0, I). TPU-first: all G groups' effects are ONE (G, 2) matmul
against L, the likelihood one gather + Normal logpdf — no per-group
loops anywhere.
"""

import os

import numpy as np

from exmc_tpu import Builder, dists, sample
from exmc_tpu.diagnostics import ess, rhat

SMOKE = os.environ.get("EXMC_EXAMPLES_SMOKE") == "1"

G = 30
TRUE = {"mu_a": 1.0, "mu_b": -0.5, "sigma_a": 0.8, "sigma_b": 0.4,
        "rho": 0.6, "sigma_y": 0.5}


def generate(seed=7):
    rng = np.random.default_rng(seed)
    cov = np.array([
        [TRUE["sigma_a"] ** 2,
         TRUE["rho"] * TRUE["sigma_a"] * TRUE["sigma_b"]],
        [TRUE["rho"] * TRUE["sigma_a"] * TRUE["sigma_b"],
         TRUE["sigma_b"] ** 2],
    ])
    ab = rng.multivariate_normal([TRUE["mu_a"], TRUE["mu_b"]], cov, size=G)
    sizes = np.maximum(rng.poisson(15, G), 2)
    gidx = np.repeat(np.arange(G), sizes)
    x = rng.normal(0.0, 1.0, gidx.size)
    y = (ab[gidx, 0] + ab[gidx, 1] * x
         + rng.normal(0.0, TRUE["sigma_y"], gidx.size))
    return gidx, x.astype(np.float32), y.astype(np.float32)


def build():
    import jax.numpy as jnp

    gidx, x, y = generate()
    idx = jnp.asarray(gidx, jnp.int32)
    xv = jnp.asarray(x)

    ir = Builder.new_ir()
    ir = Builder.rv(ir, "mu_a", dists.Normal, {"mu": 0.0, "sigma": 5.0})
    ir = Builder.rv(ir, "mu_b", dists.Normal, {"mu": 0.0, "sigma": 5.0})
    ir = Builder.rv(ir, "sigma_ab", dists.HalfNormal, {"sigma": 1.0},
                    shape=(2,))
    ir = Builder.rv(ir, "L", dists.LKJCholesky, {"eta": 2.0}, shape=(2, 2))
    ir = Builder.rv(ir, "z", dists.Normal, {"mu": 0.0, "sigma": 1.0},
                    shape=(G, 2))
    ir = Builder.rv(ir, "sigma_y", dists.HalfNormal, {"sigma": 1.0})

    # effects = mu + z L' diag(sigma): one (G,2)x(2,2) matmul for all groups
    ir = Builder.det(
        ir, "effects",
        lambda ma, mb, s, L, z: jnp.stack([ma, mb]) + (z @ L.T) * s,
        ["mu_a", "mu_b", "sigma_ab", "L", "z"],
    )
    ir = Builder.det(
        ir, "yhat",
        lambda eff: eff[idx, 0] + eff[idx, 1] * xv,
        ["effects"],
    )
    ir = Builder.rv(ir, "y", dists.Normal, {"mu": "yhat", "sigma": "sigma_y"},
                    shape=(len(y),))
    ir = Builder.obs(ir, "y_obs", "y", y)
    return ir


def main():
    ir = build()
    chains = 4 if SMOKE else 32
    n = 150 if SMOKE else 1000
    trace, stats = sample(ir, num_chains=chains, num_warmup=max(300, n),
                          num_samples=n, seed=0, ncp=False,
                          target_accept=0.9)
    L = np.asarray(trace["L"]).reshape(-1, 2, 2)
    rho = (L[:, 1, :] * L[:, 0, :]).sum(axis=-1)
    print(f"rho          = {rho.mean():+.3f} (true {TRUE['rho']:+.2f}), "
          f"sd {rho.std():.3f}")
    for name, true_v in [("mu_a", TRUE["mu_a"]), ("mu_b", TRUE["mu_b"]),
                         ("sigma_y", TRUE["sigma_y"])]:
        arr = trace[name]
        print(f"{name:12s} = {arr.mean():+.3f} (true {true_v:+.2f}), "
              f"R-hat {float(rhat(arr)):.3f}, ESS {float(ess(arr)):.0f}")
    if not SMOKE:
        assert abs(rho.mean() - TRUE["rho"]) < 0.25
    print(f"divergences: {stats['divergences'].sum()}")


if __name__ == "__main__":
    main()

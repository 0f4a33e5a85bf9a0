"""Radon varying-intercept model — Gelman & Hill's canonical Bayesian
hierarchical example (reference notebooks/09_radon_bhm.livemd).

Radon seeps from soil uranium into basements; most counties have only a
handful of measurements, so the sample mean per county is useless. A
hierarchical model with uranium as a county-level predictor borrows
strength across counties: small counties shrink toward a
geology-informed grand mean (Stein 1956 made this optimality precise).

d = 90: 5 hyperparameters + 85 non-centered county intercepts.
TPU-first formulation: the reference loops counties inside a Custom
closure (radon_model.exs); here the intercepts are ONE (85,) vector RV
and the likelihood is one vectorized gather + Normal logpdf.
"""

import os

import numpy as np

from exmc_tpu import Builder, dists, sample
from exmc_tpu.diagnostics import ess, rhat

SMOKE = os.environ.get("EXMC_EXAMPLES_SMOKE") == "1"

N_COUNTIES = 85
TRUE = {"mu_alpha": 1.5, "gamma_u": 0.7, "sigma_alpha": 0.35,
        "beta": -0.6, "sigma_y": 0.8}


def generate(seed=42):
    """Synthetic radon data shaped like Gelman & Hill's Minnesota set:
    85 counties, ~900 home measurements, county-level log-uranium."""
    rng = np.random.default_rng(seed)
    uranium = rng.normal(0.0, 0.4, N_COUNTIES)
    alpha = (TRUE["mu_alpha"] + TRUE["gamma_u"] * uranium
             + rng.normal(0.0, TRUE["sigma_alpha"], N_COUNTIES))
    # county sizes are wildly uneven (the whole point)
    sizes = np.maximum(rng.poisson(10, N_COUNTIES), 1)
    county_idx = np.repeat(np.arange(N_COUNTIES), sizes)
    floor = (rng.random(county_idx.size) < 0.4).astype(np.float32)
    y = (alpha[county_idx] + TRUE["beta"] * floor
         + rng.normal(0.0, TRUE["sigma_y"], county_idx.size))
    return uranium.astype(np.float32), county_idx, floor, y.astype(np.float32)


def build():
    import jax.numpy as jnp

    uranium, county_idx, floor, y = generate()
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "mu_alpha", dists.Normal, {"mu": 0.0, "sigma": 10.0})
    ir = Builder.rv(ir, "gamma_u", dists.Normal, {"mu": 0.0, "sigma": 5.0})
    ir = Builder.rv(ir, "sigma_alpha", dists.HalfCauchy, {"scale": 2.5})
    ir = Builder.rv(ir, "sigma_y", dists.HalfCauchy, {"scale": 2.5})
    ir = Builder.rv(ir, "beta", dists.Normal, {"mu": 0.0, "sigma": 5.0})
    ir = Builder.rv(ir, "alpha_raw", dists.Normal, {"mu": 0.0, "sigma": 1.0},
                    shape=(N_COUNTIES,))

    # alpha_j = mu_alpha + gamma_u * u_j + sigma_alpha * alpha_raw_j  (NCP)
    u = jnp.asarray(uranium)
    idx = jnp.asarray(county_idx, jnp.int32)
    fl = jnp.asarray(floor)
    ir = Builder.det(
        ir, "alpha",
        lambda m, g, s, raw: m + g * u + s * raw,
        ["mu_alpha", "gamma_u", "sigma_alpha", "alpha_raw"],
    )
    ir = Builder.det(
        ir, "yhat",
        lambda alpha, beta: alpha[idx] + beta * fl,
        ["alpha", "beta"],
    )
    ir = Builder.rv(ir, "y", dists.Normal, {"mu": "yhat", "sigma": "sigma_y"},
                    shape=(len(y),))
    ir = Builder.obs(ir, "y_obs", "y", y)
    return ir


def main():
    ir = build()
    chains = 4 if SMOKE else 64
    n = 150 if SMOKE else 1000
    trace, stats = sample(ir, num_chains=chains, num_warmup=max(300, n),
                          num_samples=n, seed=0, ncp=False)
    for name, true_v in [("mu_alpha", TRUE["mu_alpha"]),
                         ("gamma_u", TRUE["gamma_u"]),
                         ("beta", TRUE["beta"]),
                         ("sigma_y", TRUE["sigma_y"])]:
        arr = trace[name]
        print(f"{name:12s} = {arr.mean():+.3f} (true {true_v:+.2f}), "
              f"rhat={float(rhat(arr)):.3f}, ess={float(ess(arr)):.0f}")
    div = stats["divergences"].sum()
    print(f"divergences: {int(div)}")
    if not SMOKE:
        assert abs(trace["beta"].mean() - TRUE["beta"]) < 0.15
        assert div / (chains * n) < 0.01


if __name__ == "__main__":
    main()

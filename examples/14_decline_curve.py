"""Bayesian decline-curve analysis (DCA) for oil wells
(reference notebooks/05_dca_engineers.livemd / 06_dca_business.livemd
narrative).

The traditional workflow fits one Arps hyperbolic decline

    q(t) = q_i / (1 + b * D_i * t)^(1/b)

to 12-24 months of production and extrapolates a single EUR (estimated
ultimate recovery) for 30 years. The exponential fit says one number,
the hyperbolic another, and the reserves report picks one. The Bayesian
answer is a DISTRIBUTION of decline curves — and therefore of EURs —
with the probabilities the business actually needs: P(EUR > threshold),
P(rate below the economic limit by year k).

TPU-first formulation: all months evaluate in one broadcast of the Arps
expression; the log-rate likelihood is a single vector Normal; the EUR
integral per posterior draw is a vmapped trapezoid over the projected
horizon — thousands of 30-year forecasts in one device call.
"""

import os

import numpy as np

from exmc_tpu import Builder, dists, sample
from exmc_tpu.diagnostics import rhat

SMOKE = os.environ.get("EXMC_EXAMPLES_SMOKE") == "1"

MONTHS = 24
TRUE = {"qi": 800.0, "Di": 0.12, "b": 0.9, "noise": 0.08}
HORIZON_MONTHS = 360
ECON_LIMIT = 15.0  # bbl/day economic limit


def generate(seed=23):
    rng = np.random.default_rng(seed)
    t = np.arange(1, MONTHS + 1, dtype=np.float32)
    q = TRUE["qi"] / (1.0 + TRUE["b"] * TRUE["Di"] * t) ** (1.0 / TRUE["b"])
    log_q = np.log(q) + rng.normal(0.0, TRUE["noise"], MONTHS)
    return t, np.exp(log_q).astype(np.float32)


def build(t, q_obs):
    import jax.numpy as jnp

    tj = jnp.asarray(t)
    log_q_obs = np.log(q_obs).astype(np.float32)

    ir = Builder.new_ir()
    ir = Builder.rv(ir, "qi", dists.LogNormal,
                    {"mu": float(np.log(600.0)), "sigma": 0.5})
    ir = Builder.rv(ir, "Di", dists.LogNormal,
                    {"mu": float(np.log(0.1)), "sigma": 0.5})
    # decline exponent b in (0, 1): b -> 0 is exponential decline,
    # b -> 1 harmonic (super-harmonic b > 1 would need a scaled prior)
    ir = Builder.rv(ir, "b", dists.Beta, {"alpha": 2.0, "beta": 2.0})
    ir = Builder.rv(ir, "noise", dists.HalfNormal, {"sigma": 0.3})
    ir = Builder.det(
        ir, "log_rate",
        lambda qi, di, b: jnp.log(qi)
        - (1.0 / jnp.maximum(b, 1e-3))
        * jnp.log1p(jnp.maximum(b, 1e-3) * di * tj),
        ["qi", "Di", "b"],
    )
    ir = Builder.rv(ir, "log_q", dists.Normal,
                    {"mu": "log_rate", "sigma": "noise"}, shape=(MONTHS,))
    ir = Builder.obs(ir, "log_q_obs", "log_q", log_q_obs)
    return ir


def eur_distribution(trace):
    """EUR per posterior draw: integrate q(t) to the economic limit over
    a 30-year horizon (vmapped trapezoid; bbl/day * days)."""
    import jax
    import jax.numpy as jnp

    t = jnp.arange(1, HORIZON_MONTHS + 1, dtype=jnp.float32)
    qi = jnp.asarray(trace["qi"]).reshape(-1)
    di = jnp.asarray(trace["Di"]).reshape(-1)
    b = jnp.asarray(trace["b"]).reshape(-1)

    def one(qi, di, b):
        q = qi / (1.0 + b * di * t) ** (1.0 / jnp.maximum(b, 1e-3))
        q = jnp.where(q > ECON_LIMIT, q, 0.0)  # shut-in below limit
        return jnp.sum(q) * 30.4  # monthly rate x days/month

    return np.asarray(jax.vmap(one)(qi, di, b))


def main():
    t, q_obs = generate()
    ir = build(t, q_obs)
    chains = 4 if SMOKE else 16
    n = 150 if SMOKE else 1000
    trace, stats = sample(ir, num_chains=chains, num_warmup=max(300, n),
                          num_samples=n, seed=0, target_accept=0.9)

    for name in ("qi", "Di", "b"):
        arr = trace[name]
        print(f"{name:5s} = {arr.mean():8.3f} (true {TRUE[name]:7.3f}), "
              f"rhat={float(rhat(arr)):.3f}")

    eur = eur_distribution(trace) / 1e6  # MMbbl
    p50 = float(np.percentile(eur, 50))
    p10, p90 = float(np.percentile(eur, 90)), float(np.percentile(eur, 10))
    p_2mm = float(np.mean(eur > 2.0))
    print(f"EUR P50 = {p50:.2f} MMbbl  (P90 {p90:.2f} / P10 {p10:.2f})")
    print(f"P(EUR > 2 MMbbl) = {p_2mm:.2f}")
    print(f"divergences: {int(stats['divergences'].sum())}")

    if not SMOKE:
        assert abs(trace["b"].mean() - TRUE["b"]) < 0.25
        assert 0.5 < p50 < 6.0
        assert stats["divergences"].sum() / (chains * n) < 0.02


if __name__ == "__main__":
    main()

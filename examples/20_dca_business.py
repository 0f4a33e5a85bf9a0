"""Decline-curve economics: from posterior to P10/P50/P90 and NPV
(reference notebooks/06_dca_business.livemd — the business companion to
the engineers' decline-curve fit in 14_decline_curve.py).

A single-number EUR estimate books reserves and prices acquisitions on
hope. The Bayesian decline fit turns each well's production history
into a DISTRIBUTION over hyperbolic-Arps parameters, and everything
downstream inherits the uncertainty:

  * EUR P10/P50/P90 per well (SEC reserves-booking convention),
  * the uncertainty band SHRINKING as data arrives (6 -> 24 months),
  * an NPV distribution per well (price deck x discounting on every
    posterior path) and a portfolio roll-up across three wells,
  * value-of-information: how much a further 6 months of data tightens
    the P10-P90 range.

TPU-first: all three wells and all horizon months evaluate as one
vmapped rate matrix; NPV is a single discounted matmul over posterior
draws — the MXU prices the entire portfolio distribution at once.
"""

import os

import numpy as np

from exmc_tpu import Builder, dists, sample

SMOKE = os.environ.get("EXMC_EXAMPLES_SMOKE") == "1"

HORIZON = 120           # months of forward production
OIL_PRICE = 78.0        # $/bbl flat deck
OPEX = 12.0             # $/bbl lifting cost
DISCOUNT = 0.10 / 12.0  # monthly discount rate
ECON_LIMIT = 10.0       # bbl/day shut-in

WELLS = {                # qi (bbl/d), Di (1/mo), b, noise
    "Well A": (750.0, 0.085, 0.9, 0.16),
    "Well B": (420.0, 0.060, 0.5, 0.12),
    "Well C": (980.0, 0.140, 1.0, 0.22),
}


def generate(truth, months, seed):
    rng = np.random.default_rng(seed)
    qi, di, b, noise = truth
    t = np.arange(1, months + 1, dtype=np.float32)
    q = qi / (1.0 + b * di * t) ** (1.0 / b)
    return t, (q * np.exp(rng.normal(0, noise, months))).astype(np.float32)


def build(t, q_obs):
    import jax.numpy as jnp

    tj = jnp.asarray(t)
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "qi", dists.LogNormal,
                    {"mu": float(np.log(600.0)), "sigma": 0.6})
    ir = Builder.rv(ir, "Di", dists.LogNormal,
                    {"mu": float(np.log(0.1)), "sigma": 0.6})
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
                    {"mu": "log_rate", "sigma": "noise"},
                    shape=(len(t),))
    ir = Builder.obs(ir, "log_q_obs", "log_q", np.log(q_obs))
    return ir


def forecast(trace):
    """(draws, HORIZON) rate matrix + EUR + NPV per posterior draw —
    one vmapped evaluation."""
    import jax
    import jax.numpy as jnp

    t = jnp.arange(1, HORIZON + 1, dtype=jnp.float32)
    disc = (1.0 + DISCOUNT) ** (-t)
    qi = jnp.asarray(trace["qi"]).reshape(-1)
    di = jnp.asarray(trace["Di"]).reshape(-1)
    b = jnp.asarray(trace["b"]).reshape(-1)

    def one(qi, di, b):
        q = qi / (1.0 + b * di * t) ** (1.0 / jnp.maximum(b, 1e-3))
        q = jnp.where(q > ECON_LIMIT, q, 0.0)
        vol = q * 30.4                        # bbl/month
        npv = jnp.sum(vol * (OIL_PRICE - OPEX) * disc)
        return jnp.sum(vol), npv

    eur, npv = jax.vmap(one)(qi, di, b)
    return np.asarray(eur), np.asarray(npv)


def p10_50_90(x):
    return np.percentile(x, [10, 50, 90])


def fit(months, truth, seed, tag):
    t, q_obs = generate(truth, months, seed)
    ir = build(t, q_obs)
    iters = (150, 150) if SMOKE else (800, 800)
    trace, stats = sample(ir, num_chains=4, num_warmup=iters[0],
                          num_samples=iters[1], seed=0, target_accept=0.9)
    eur, npv = forecast(trace)
    return eur, npv, int(stats["divergences"].sum())


def main():
    # 1. uncertainty shrinks as data arrives (Well A)
    print("Well A — EUR (Mbbl) as history accrues:")
    print("  months | P10    P50    P90   | P10-P90 range")
    months_list = [6, 24] if SMOKE else [6, 12, 24]
    ranges = {}
    for months in months_list:
        eur, _, _ = fit(months, WELLS["Well A"], seed=6, tag=f"A{months}")
        p = p10_50_90(eur) / 1000.0
        ranges[months] = p[2] - p[0]
        print(f"  {months:6d} | {p[0]:6.0f} {p[1]:6.0f} {p[2]:6.0f} "
              f"| {p[2] - p[0]:6.0f}")
    print(f"  value of information: +18 months of data cut the range "
          f"{ranges[months_list[0]] / ranges[months_list[-1]]:.1f}x")

    # 2. portfolio view at 24 months
    print("\nPortfolio at 24 months of history:")
    print("  well   | EUR P50 (Mbbl) | NPV P10/P50/P90 ($M)")
    total_npv = None
    for i, (name, truth) in enumerate(WELLS.items()):
        eur, npv, div = fit(24, truth, seed=6 + i, tag=name)
        pn = p10_50_90(npv) / 1e6
        pe = p10_50_90(eur) / 1000.0
        print(f"  {name} | {pe[1]:8.0f}       | "
              f"{pn[0]:5.1f} / {pn[1]:5.1f} / {pn[2]:5.1f}")
        n = min(len(npv), 2000)
        total_npv = npv[:n] if total_npv is None else total_npv + npv[:n]
    pt = p10_50_90(total_npv) / 1e6
    print(f"  PORTFOLIO NPV: P10 {pt[0]:.1f}  P50 {pt[1]:.1f}  "
          f"P90 {pt[2]:.1f} $M  — bid against the DISTRIBUTION, "
          "not a single number")

    if not SMOKE:
        assert ranges[months_list[0]] > ranges[months_list[-1]], \
            "more data must shrink the P10-P90 range"
        assert pt[0] < pt[1] < pt[2]


if __name__ == "__main__":
    main()

"""BDA3 ch. 5 — Hierarchical models: eight schools (reference
notebooks/bda/ch05_eight_schools.livemd; Vehtari demo 5.1-5.2;
Rubin 1981).

The canonical partial-pooling example, plus the funnel lesson the
notebook teaches: the CENTERED parameterization's tau-theta funnel vs
the non-centered fix. The TPU build adds the third option the
framework ships: NUTS-within-Gibbs (gibbs_scales) — tau frozen in the
trajectory, moved by exact ASIS Gibbs legs — which samples the
centered model with ZERO divergences.
"""

import os

import numpy as np

from exmc_tpu import Builder, dists, sample
from exmc_tpu.diagnostics import ess, rhat

SMOKE = os.environ.get("EXMC_EXAMPLES_SMOKE") == "1"

Y = [28.0, 8.0, -3.0, 7.0, -1.0, 1.0, 18.0, 12.0]
SIGMA = [15.0, 10.0, 16.0, 11.0, 9.0, 11.0, 10.0, 18.0]


def schools_ir():
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "mu", dists.Normal, {"mu": 0.0, "sigma": 5.0})
    ir = Builder.rv(ir, "tau", dists.HalfNormal, {"sigma": 5.0})
    ir = Builder.rv(ir, "theta", dists.Normal,
                    {"mu": "mu", "sigma": "tau"}, shape=(8,))
    ir = Builder.rv(ir, "y", dists.Normal,
                    {"mu": "theta", "sigma": np.array(SIGMA, np.float32)},
                    shape=(8,))
    ir = Builder.obs(ir, "y_obs", "y", np.array(Y, np.float32))
    return ir


def run(label, **opts):
    n = 200 if SMOKE else 1000
    chains = 8 if SMOKE else 16
    trace, stats = sample(schools_ir(), num_chains=chains,
                          num_warmup=max(300, n), num_samples=n, seed=0,
                          **opts)
    div = float(stats["divergences"].sum()) / (chains * n)
    print(f"[{label:<22}] mu={float(trace['mu'].mean()):.2f} "
          f"tau={float(trace['tau'].mean()):.2f} "
          f"div={div:.3%} tau-Rhat={float(rhat(trace['tau'])):.3f} "
          f"tau-ESS={float(ess(trace['tau'])):.0f}")
    return trace, div


def main():
    print("Three ways to sample the same hierarchical posterior:")
    # 1. centered — "the harder test": the funnel produces divergences
    _, div_c = run("centered", ncp=False)
    # 2. non-centered — the rewrite pass's automatic fix
    _, div_n = run("non-centered (auto)", ncp=True)
    # 3. centered + NUTS-within-Gibbs: tau out of the trajectory
    t3, div_g = run("centered gibbs_scales", ncp=False,
                    interweave=True, gibbs_scales=True)
    assert div_g == 0.0, div_g
    # pooling: every theta shrinks toward mu, school A (y=28) most
    th = np.asarray(t3["theta"]).reshape(-1, 8).mean(axis=0)
    print(f"school A: raw 28.0 -> posterior {th[0]:.1f} (partial pooling)")
    assert th[0] < 15.0 and th[0] > float(t3["mu"].mean())
    print("eight schools OK: gibbs_scales samples the centered funnel "
          "divergence-free")


if __name__ == "__main__":
    main()

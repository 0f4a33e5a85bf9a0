"""BDA-cyber ch. 5 — Eight SOCs: hierarchical incident rates (reference
notebooks/bda-cyber/ch05_eight_socs.livemd; eight schools in a SOC).

Eight offices report security-incident effect estimates with known
per-office measurement noise (staff size, detection maturity). Partial
pooling answers the CISO's question: is HQ's 28 real, or small-sample
noise? Run centered with NUTS-within-Gibbs (the round-4 kernel) —
divergence-free — and show the shrinkage table.
"""

import os

import numpy as np

from exmc_tpu import Builder, dists, sample
from exmc_tpu.diagnostics import rhat

SMOKE = os.environ.get("EXMC_EXAMPLES_SMOKE") == "1"

Y = [28.0, 8.0, 3.0, 7.0, 2.0, 4.0, 18.0, 12.0]
SIG = [8.0, 5.0, 7.0, 5.0, 4.0, 6.0, 5.0, 9.0]
OFFICES = ["HQ", "NE", "SE", "MW", "SW", "WC", "NW", "Remote"]


def main():
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "mu", dists.Normal, {"mu": 0.0, "sigma": 10.0})
    ir = Builder.rv(ir, "tau", dists.HalfNormal, {"sigma": 10.0})
    ir = Builder.rv(ir, "theta", dists.Normal,
                    {"mu": "mu", "sigma": "tau"}, shape=(8,))
    ir = Builder.rv(ir, "y", dists.Normal,
                    {"mu": "theta", "sigma": np.array(SIG, np.float32)},
                    shape=(8,))
    ir = Builder.obs(ir, "y_obs", "y", np.array(Y, np.float32))

    n = 250 if SMOKE else 1000
    chains = 8 if SMOKE else 16
    trace, stats = sample(ir, num_chains=chains, num_warmup=max(400, n),
                          num_samples=n, seed=0, ncp=False,
                          interweave=True, gibbs_scales=True)
    assert int(stats["divergences"].sum()) == 0
    mu = float(trace["mu"].mean())
    tau = float(trace["tau"].mean())
    th = np.asarray(trace["theta"]).reshape(-1, 8)
    print(f"company-wide rate mu = {mu:.1f}, between-office spread "
          f"tau = {tau:.1f} (R-hat {float(rhat(trace['tau'])):.3f}, "
          "0 divergences — centered, NUTS-within-Gibbs)")
    print(f"{'office':<8} raw -> pooled   P(worst office)")
    worst = (th == th.max(axis=1, keepdims=True)).mean(axis=0)
    for j, name in enumerate(OFFICES):
        print(f"{name:<8} {Y[j]:>4.0f} -> {th[:, j].mean():>6.1f}"
              f"   {worst[j]:.2f}")
    # HQ shrinks hard (sigma=8, far from mu); SW barely moves
    assert th[:, 0].mean() < Y[0] - 5.0
    assert abs(th[:, 4].mean() - Y[4]) < 3.0
    assert worst[0] > 0.3  # HQ still most likely worst, but not certain
    print("eight SOCs OK: partial pooling separates signal from "
          "small-sample noise")


if __name__ == "__main__":
    main()

"""Quickstart: hierarchical location/scale model (reference README.md:63-85)."""

import os

import numpy as np

from exmc_tpu import Builder, dists, sample
from exmc_tpu.diagnostics import summary

SMOKE = os.environ.get("EXMC_EXAMPLES_SMOKE") == "1"


def main():
    ys = np.array([2.1, 1.8, 2.5, 2.0, 1.9, 2.3, 2.2, 1.7, 2.4, 2.6])
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "mu", dists.Normal, {"mu": 0.0, "sigma": 5.0})
    ir = Builder.rv(ir, "sigma", dists.HalfNormal, {"sigma": 2.0})
    ir = Builder.rv(ir, "x", dists.Normal, {"mu": "mu", "sigma": "sigma"})
    ir = Builder.obs(ir, "x_obs", "x", ys)

    n = 100 if SMOKE else 1000
    trace, stats = sample(ir, num_warmup=n // 2 + 100, num_samples=n,
                          num_chains=4, seed=0)
    for name, row in summary(trace).items():
        print(f"{name}: mean={row['mean']:.3f} sd={row['std']:.3f} "
              f"ess={row['ess']:.0f} rhat={row['rhat']:.3f}")
    print("divergences per chain:", stats["divergences"])
    return trace


if __name__ == "__main__":
    main()

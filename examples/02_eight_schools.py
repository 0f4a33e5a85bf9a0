"""Eight schools with automatic non-centered parameterization, many
vmapped chains, warm-start refresh, and WAIC."""

import os

import numpy as np

from exmc_tpu import Builder, dists, model_comparison, sample
from exmc_tpu.diagnostics import ess, rhat

SMOKE = os.environ.get("EXMC_EXAMPLES_SMOKE") == "1"


def build():
    y = [28.0, 8.0, -3.0, 7.0, -1.0, 1.0, 18.0, 12.0]
    sig = [15.0, 10.0, 16.0, 11.0, 9.0, 11.0, 10.0, 18.0]
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "mu", dists.Normal, {"mu": 0.0, "sigma": 5.0})
    ir = Builder.rv(ir, "tau", dists.HalfCauchy, {"scale": 5.0})
    for i in range(8):
        ir = Builder.rv(ir, f"theta_{i}", dists.Normal,
                        {"mu": "mu", "sigma": "tau"})
        ir = Builder.rv(ir, f"y_{i}", dists.Normal,
                        {"mu": f"theta_{i}", "sigma": sig[i]})
        ir = Builder.obs(ir, f"y_{i}_obs", f"y_{i}", y[i])
    return ir


def main():
    ir = build()
    chains = 8 if SMOKE else 256
    n = 100 if SMOKE else 1000
    trace, stats = sample(ir, num_chains=chains, num_warmup=max(200, n // 2),
                          num_samples=n, seed=0)
    print(f"mu  = {trace['mu'].mean():.2f} (published ~4.4), "
          f"ESS={float(ess(trace['mu'])):.0f}, rhat={float(rhat(trace['mu'])):.3f}")
    print(f"tau = {trace['tau'].mean():.2f} (published ~3.6)")

    # warm-start refresh cycle (D71): re-sample with previous tuning
    ws = {"step_size": stats["step_size"][0], "inv_mass": stats["inv_mass"][0]}
    trace2, _ = sample(ir, num_chains=chains, num_samples=n, seed=1,
                       warm_start=ws)
    print(f"warm-start refresh: mu = {trace2['mu'].mean():.2f}")

    w = model_comparison.waic(ir, trace)
    print(f"WAIC = {w['waic']:.1f} (p_waic {w['p_waic']:.1f})")


if __name__ == "__main__":
    main()

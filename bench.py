"""Canonical benchmark: eight-schools NUTS at 1024 vmapped chains on one chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "ESS/s", "vs_baseline": N, ...}

Baseline: PyMC single-chain eight_schools = 5 ESS/s on an 88-thread Xeon
(BASELINE.md; reference STANDARD_BENCHMARKS.md:139). The BASELINE.json
target is >=50x via 1024 vmapped chains.

Protocol: 200 warmup + 500 draws per chain with POOLED cross-chain
adaptation (Welford moments merged over all 1024 chains at each window
end — see DESIGN.md; 1024 chains x one window pools enough samples that
200 warmup iterations adapt as well as 500 per-chain ones, verified by
matching posteriors/R-hat/divergence rates), target_accept 0.8,
max_depth 10. ESS measured on mu with the Geyer
initial-positive-sequence estimator across all 1024 chains; wall time is
the cached-executable run (compile time reported separately).
"""

import json
import time

import numpy as np


def eight_schools_ir():
    from exmc_tpu import Builder, dists

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
    from exmc_tpu.diagnostics import ess
    from exmc_tpu.nuts.sampler import _make_sampler

    num_chains = 1024
    warm, draws = 200, 500
    sampler = _make_sampler(eight_schools_ir(), num_warmup=warm,
                            num_samples=draws, pooled_adaptation=True)

    t0 = time.time()
    sampler.run(num_chains=num_chains, seed=0)  # compile + first run
    compile_and_first = time.time() - t0

    t0 = time.time()
    trace, stats = sampler.run(num_chains=num_chains, seed=1)
    wall = time.time() - t0

    mu = trace["mu"]
    ess_mu = float(ess(mu))
    ess_per_s = ess_mu / wall
    baseline_pymc = 5.0  # ESS/s, BASELINE.md eight_schools PyMC
    print(json.dumps({
        "metric": "eight_schools ESS/s (mu), 1024 vmapped NUTS chains, 1 chip",
        "value": round(ess_per_s, 1),
        "unit": "ESS/s",
        "vs_baseline": round(ess_per_s / baseline_pymc, 1),
        "detail": {
            "wall_s": round(wall, 2),
            "compile_and_first_run_s": round(compile_and_first, 1),
            "draws_per_s": round(num_chains * draws / wall, 0),
            "ess_mu": round(ess_mu, 0),
            "mu_mean": round(float(np.mean(mu)), 2),
            "tau_mean": round(float(np.mean(trace["tau"])), 2),
            "divergence_rate": round(
                float(stats["divergences"].sum()) / (num_chains * draws), 5
            ),
            "baseline": "PyMC 1-chain 5 ESS/s (STANDARD_BENCHMARKS.md:139)",
        },
    }))


if __name__ == "__main__":
    main()

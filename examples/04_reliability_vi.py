"""Weibull reliability: ADVI, Pathfinder, SMC and NUTS on one compiled
log-density (BASELINE.json config 5)."""

import os

import numpy as np

from exmc_tpu import advi_fit, pathfinder_fit, sample, smc_sample
from exmc_tpu.benchmarks import reliability

SMOKE = os.environ.get("EXMC_EXAMPLES_SMOKE") == "1"


def main():
    n_types = 4 if SMOKE else 20
    data, truth = reliability.simulate_data(n_types=n_types, n_per_type=25)
    ir = reliability.build(data, n_types=n_types)
    print(f"model d = {4 + 2 * n_types}; truth log_l mean = "
          f"{truth['log_l'].mean():.2f}")

    steps = 500 if SMOKE else 4000
    advi = advi_fit(ir, num_steps=steps, data=data, seed=0)
    print("ADVI  log_l_mean:", float(advi["draws"]["log_l_mean"].mean()))

    pf = pathfinder_fit(ir, num_iters=50 if SMOKE else 150, data=data, seed=0)
    print("PF    log_l_mean:", float(pf["draws"]["log_l_mean"].mean()))

    tr, info = smc_sample(ir, num_particles=300 if SMOKE else 1000,
                          data=data, seed=0)
    print("SMC   log_l_mean:", float(tr["log_l_mean"].mean()),
          f"({info['num_stages']} stages)")

    nuts, _ = sample(ir, num_warmup=200 if SMOKE else 800,
                     num_samples=200 if SMOKE else 800, data=data, seed=0)
    print("NUTS  log_l_mean:", float(nuts["log_l_mean"].mean()))


if __name__ == "__main__":
    main()

"""Capacity curve: chains-per-chip vs throughput (the analogue of the
reference's capacity_bench.exs, which measured BEAM job concurrency).

Measures draws/s and ESS/s on eight_schools across chain counts,
exposing the vmap-lockstep optimum (DESIGN D-T16)."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from exmc_tpu.diagnostics import ess
from exmc_tpu.nuts.sampler import _make_sampler


def eight_schools_ir():
    from bench import eight_schools_ir as f

    return f()


def main():
    chain_counts = [int(c) for c in sys.argv[1:]] or [128, 256, 512, 1024, 2048]
    warm, draws = 200, 500
    results = []
    for c in chain_counts:
        s = _make_sampler(eight_schools_ir(), num_warmup=warm,
                          num_samples=draws, pooled_adaptation=True)
        s.run(num_chains=c, seed=0)  # compile
        t0 = time.time()
        trace, stats = s.run(num_chains=c, seed=1)
        wall = time.time() - t0
        e = float(ess(trace["mu"]))
        row = {
            "chains": c,
            "wall_s": round(wall, 2),
            "draws_per_s": round(c * draws / wall, 0),
            "ess_per_s": round(e / wall, 0),
            "mu": round(float(trace["mu"].mean()), 2),
        }
        results.append(row)
        print(json.dumps(row), flush=True)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "CAPACITY.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()

"""On-chip probe for the _mm2 precision fix (2026-08-19): the T=5000
sv_inla grid on TPU must now match the committed CPU reference row
(LONGT.json sv_inla_marginal:5000 — sigma 0.02334+-0.00272, nu
10.5+-1.5). Before the fix, jnp.matmul's bf16 TPU default degraded the
Möbius continued-fraction scans: sigma_mean 0.14, sigma_sd 4e-5,
n_failed 705/1600 (longt8 meta sidecar).

Usage: python scripts/probe_inla_precision.py [--t 5000]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--t", type=int, default=5000)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    from exmc_tpu.benchmarks.suite import sv_model
    from exmc_tpu.marginal import sv_inla

    r = np.asarray(sv_model(t=args.t).nodes["r_obs"].op[2])
    t0 = time.time()
    inla = sv_inla(r, grid_batch=64)
    wall = time.time() - t0
    out = {
        "platform": jax.devices()[0].platform,
        "T": args.t,
        "wall_s": round(wall, 1),
        "sigma_mean": round(inla["sigma_mean"], 5),
        "sigma_sd": round(inla["sigma_sd"], 5),
        "nu_mean": round(inla["nu_mean"], 3),
        "nu_sd": round(inla["nu_sd"], 3),
        "n_failed": inla["n_failed"],
        "ref_cpu": {"sigma_mean": 0.02334, "sigma_sd": 0.00272,
                    "nu_mean": 10.5, "nu_sd": 1.5},
    }
    out["match"] = bool(
        abs(out["sigma_mean"] - 0.02334) < 3 * 0.00272
        and abs(out["nu_mean"] - 10.5) < 3 * 1.5
        and out["n_failed"] < 100)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()

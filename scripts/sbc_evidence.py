"""SBC evidence run on the real chip: calibration of the full NUTS
pipeline on two model shapes, recorded in SBC_r03.json.

Models:
  * normal_loc_scale — the quickstart shape (mu, sigma, 10 obs)
  * eight_schools_ncp — hierarchical (mu, tau, 8 theta) with automatic
    NCP, the shape whose Jacobians/reconstruction SBC stresses most.

Each runs R replications x 1 chain as ONE vmapped device call
(exmc_tpu/sbc.py). Pass model names as argv to run a subset.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from exmc_tpu import Builder, dists
from exmc_tpu.sbc import sbc


def normal_loc_scale():
    ys = np.linspace(1.5, 2.6, 10)
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "mu", dists.Normal, {"mu": 0.0, "sigma": 2.0})
    ir = Builder.rv(ir, "sigma", dists.HalfNormal, {"sigma": 1.0})
    ir = Builder.rv(ir, "x", dists.Normal, {"mu": "mu", "sigma": "sigma"},
                    shape=(10,))
    return Builder.obs(ir, "x_obs", "x", ys), {}


def eight_schools_ncp():
    J = 8
    y = np.zeros(J)
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "mu", dists.Normal, {"mu": 0.0, "sigma": 5.0})
    ir = Builder.rv(ir, "tau", dists.HalfNormal, {"sigma": 5.0})
    ir = Builder.rv(ir, "theta", dists.Normal, {"mu": "mu", "sigma": "tau"},
                    shape=(J,))
    ir = Builder.rv(ir, "y", dists.Normal, {"mu": "theta", "sigma": 12.5},
                    shape=(J,))
    return Builder.obs(ir, "y_obs", "y", y), {"target_accept": 0.9}


MODELS = {
    "normal_loc_scale": normal_loc_scale,
    "eight_schools_ncp": eight_schools_ncp,
}


def main():
    import jax

    names = [a for a in sys.argv[1:]] or list(MODELS)
    out = {"platform": jax.devices()[0].platform,
           "device": str(getattr(jax.devices()[0], "device_kind", "")),
           "protocol": "R=256 replications x 1 chain, 500 warmup + 1000 "
                       "draws thinned 10 -> L=100 ranks, one vmapped call",
           "models": {}}
    for name in names:
        ir, opts = MODELS[name]()
        t0 = time.time()
        r = sbc(ir, num_replications=256, num_warmup=500, num_samples=1000,
                thin=10, seed=0, **opts)
        wall = time.time() - t0
        row = {
            "wall_s_incl_compile": round(wall, 1),
            "L": r["L"],
            "num_replications": r["num_replications"],
            "min_p": r["min_p"],
            "divergence_rate": r["divergence_rate"],
            "chi2": {k: {"stat": round(s, 2), "p": round(p, 4)}
                     for k, (s, p) in r["chi2"].items()},
        }
        out["models"][name] = row
        print(name, json.dumps(row), flush=True)
    with open("SBC_r03.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote SBC_r03.json", flush=True)


if __name__ == "__main__":
    main()

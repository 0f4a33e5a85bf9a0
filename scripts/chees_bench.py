"""ChEES/SNAPER/MEADS vs NUTS at scale: the lockstep dividend, measured
(D-T29/D-T30/D-T31).

Three models, each sampled by NUTS (vmap, pooled adaptation), ChEES,
SNAPER, and MEADS at rising chain counts:

* ``scaled32``  — 32-dim Gaussian, sds 1..10: trajectory length
  matters, tree depth is homogeneous (NUTS's best case);
* ``corrblock128`` — a correlated block hidden in iid dims: the
  SNAPER-vs-ChEES separator (see corrblock128_ir);
* ``eight_schools`` (NCP) — the capacity-bench model: tree depth is
  heterogeneous across chains, which is exactly where vmapped NUTS
  pays the deepest-tree straggler and ChEES does not.

Writes CHEES_BENCH.json. Run on-chip via scripts/onchip_rerun.py;
runs on CPU too (any backend jax selects).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from exmc_tpu import Model, dists
from exmc_tpu.chees import sample_chees
from exmc_tpu.diagnostics import ess, rhat
from exmc_tpu.meads import sample_meads
from exmc_tpu.nuts.sampler import sample


def scaled32_ir():
    sds = np.linspace(1.0, 10.0, 32)
    with Model() as m:
        m.rv("x", dists.Normal, {"mu": np.zeros(32), "sigma": sds},
             shape=(32,))
    return m.ir


def corrblock128_ir():
    # 128-dim: one 8-dim rho=0.97 correlated block (slow eigenvalue
    # ~7.8, scale ~2.8x the rest) buried in 120 iid unit dims. The slow
    # direction is only ~6% of the trace, so ChEES's isotropic
    # squared-norm criterion barely sees it and under-lengthens; this
    # is the regime SNAPER's principal-component projection exists for.
    # (NOTE: on an EQUIcorrelated Gaussian the slow direction dominates
    # the trace and the two criteria tie — measured before choosing
    # this shape.)
    from exmc_tpu import Builder

    d, k, rho = 128, 8, 0.97
    cov = np.eye(d)
    cov[:k, :k] = np.full((k, k), rho) + (1.0 - rho) * np.eye(k)
    return Builder.rv(Builder.new_ir(), "x", dists.MvNormal,
                      {"mu": np.zeros(d), "cov": cov})


def eight_schools_ir():
    from bench import eight_schools_ir as f

    return f()


def _min_ess_max_rhat(trace):
    es, rs = [], []
    for v in trace.values():
        a = np.asarray(v)
        if a.ndim == 2:
            a = a[:, :, None]
        for i in range(a.shape[-1]):
            es.append(float(ess(a[:, :, i])))
            rs.append(float(rhat(a[:, :, i])))
    return min(es), max(rs)


def run_one(name, ir, chains, warm, draws):
    rows = []
    for engine in ("nuts", "chees", "snaper", "meads"):
        for c in chains:
            if engine == "meads" and c < 32:
                # out of regime: 4 folds need >= 8 chains each for
                # usable eigenvalue estimates (measured at 8-16 chains:
                # min-ESS single digits, R-hat up to 7.6 — an ensemble
                # method run without an ensemble)
                print(json.dumps({"model": name, "engine": engine,
                                  "chains": c, "skipped": "chains<32"}),
                      flush=True)
                continue
            if engine == "nuts":
                fn = lambda seed: sample(
                    ir, num_chains=c, num_warmup=warm, num_samples=draws,
                    seed=seed, pooled_adaptation=True)
            elif engine in ("chees", "snaper"):
                fn = lambda seed, e=engine: sample_chees(
                    ir, num_chains=c, num_warmup=warm, num_samples=draws,
                    seed=seed, criterion=e)
            else:
                fn = lambda seed: sample_meads(
                    ir, num_chains=c, num_warmup=warm, num_samples=draws,
                    seed=seed)
            fn(0)  # compile
            t0 = time.time()
            trace, stats = fn(1)
            wall = time.time() - t0
            min_ess, max_rhat = _min_ess_max_rhat(trace)
            row = {
                "model": name, "engine": engine, "chains": c,
                "platform": jax.default_backend(),
                "wall_s": round(wall, 2),
                "draws_per_s": round(c * draws / wall, 0),
                "min_ess": round(min_ess, 0),
                "min_ess_per_s": round(min_ess / wall, 0),
                "max_rhat": round(max_rhat, 4),
                "div": int(np.asarray(stats["diverging"]).sum()),
            }
            rows.append(row)
            print(json.dumps(row), flush=True)
    return rows


def main():
    chains = [int(c) for c in sys.argv[1:]] or [64, 256, 1024]
    out = []
    out += run_one("scaled32", scaled32_ir(), chains, 500, 500)
    out += run_one("corrblock128", corrblock128_ir(), chains, 500, 500)
    out += run_one("eight_schools", eight_schools_ir(), chains, 500, 500)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "CHEES_BENCH.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote CHEES_BENCH.json", flush=True)


if __name__ == "__main__":
    main()

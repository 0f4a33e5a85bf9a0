"""SBC evidence run: calibration of the full NUTS pipeline across the
model shapes whose Jacobians/reconstruction are riskiest, recorded in
SBC_r04.json (VERDICT r3 item 4).

Models:
  * normal_loc_scale — the quickstart shape (mu, sigma, 10 obs)
  * eight_schools_ncp — hierarchical NCP; run at R=1024 to retire the
    round-3 theta[7] chi2 p=0.0042 question (order-statistic noise at
    R=256, or real?)
  * lkj_mvn — LKJCholesky prior + MvNormal(chol=L) likelihood: the
    cholesky_corr transform's CPC Jacobian
  * zsn_anova — ZeroSumNormal effects + intercept: the zero_sum
    isometry (+ a multi-obs graph: two obs nodes)
  * ordered_normal — ordered-transform cutpoints: the ordered Jacobian
    (prior forward-sampled exactly as sorted iid)
  * meas_obs_affine — a measurable-lifted affine observation: the
    change-of-measure Jacobian (generator applies the transform
    forward, compiler inverts it)

Each runs R replications x 1 chain as ONE vmapped device call
(exmc_tpu/sbc.py). Pass model names as argv to run a subset; --cpu
forces the CPU backend (tunnel-down runs); --r N overrides R.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from exmc_tpu import Builder, dists
from exmc_tpu.sbc import sbc

R_DEFAULT = 512
R_OVERRIDE = {"eight_schools_ncp": 1024}


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


def eight_schools_centered_gibbs():
    """The round-4 NUTS-within-Gibbs kernel under SBC: CENTERED
    hierarchical Normal sampled with frozen tau + both ASIS legs +
    conditional metric. Rank uniformity across the whole prior is the
    definitive calibration check for the new kernel (the quadrature
    test pins one dataset; SBC pins the pipeline)."""
    J = 8
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "mu", dists.Normal, {"mu": 0.0, "sigma": 5.0})
    ir = Builder.rv(ir, "tau", dists.HalfNormal, {"sigma": 5.0})
    ir = Builder.rv(ir, "theta", dists.Normal, {"mu": "mu", "sigma": "tau"},
                    shape=(J,))
    ir = Builder.rv(ir, "y", dists.Normal, {"mu": "theta", "sigma": 12.5},
                    shape=(J,))
    return (Builder.obs(ir, "y_obs", "y", np.zeros(J)),
            {"ncp": False, "interweave": True, "gibbs_scales": True})


def lkj_mvn():
    d, n = 3, 20
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "L", dists.LKJCholesky, {"eta": 2.0}, shape=(d, d))
    ir = Builder.rv(ir, "y", dists.MvNormal,
                    {"mu": np.zeros(d), "chol": "L"}, shape=(n, d))
    return Builder.obs(ir, "y_obs", "y", np.zeros((n, d))), {}


def zsn_anova():
    K, n = 4, 6
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "intercept", dists.Normal, {"mu": 0.0, "sigma": 2.0})
    ir = Builder.rv(ir, "eff", dists.ZeroSumNormal, {"sigma": 1.5},
                    shape=(K,))
    ir = Builder.det(ir, "eta", "add", ["intercept", "eff"])
    ir = Builder.rv(ir, "y", dists.Normal, {"mu": "eta", "sigma": 0.5},
                    shape=(n, K))
    ir = Builder.obs(ir, "y_obs", "y", np.zeros((n, K)))
    # a second observation channel on the intercept alone: exercises
    # the multi-obs data pytree (two keyed __obs_data entries)
    ir = Builder.rv(ir, "w", dists.Normal, {"mu": "intercept", "sigma": 1.0},
                    shape=(5,))
    return Builder.obs(ir, "w_obs", "w", np.zeros(5)), {}


def ordered_normal():
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "c", dists.Normal, {"mu": 0.0, "sigma": 2.0},
                    shape=(3,), transform="ordered")
    ir = Builder.rv(ir, "y", dists.Normal, {"mu": "c", "sigma": 0.5},
                    shape=(8, 3))
    return Builder.obs(ir, "y_obs", "y", np.zeros((8, 3))), {}


def meas_obs_affine():
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "mu", dists.Normal, {"mu": 0.0, "sigma": 3.0})
    ir = Builder.rv(ir, "x", dists.Normal, {"mu": "mu", "sigma": 1.0},
                    shape=(12,))
    ir = Builder.det(ir, "yd", "affine", [2.5, -1.0, "x"])
    return Builder.obs(ir, "y_obs", "yd", np.zeros(12)), {}


def chees_normal_loc_scale():
    """ChEES-HMC kernel (D-T29) under SBC: 4 chains per replication,
    ranks pooled across the batch (L = 4 x 100)."""
    ir, _ = normal_loc_scale()
    return ir, {"engine": "chees", "chees_chains": 4}


def chees_eight_schools_ncp():
    ir, _ = eight_schools_ncp()
    return ir, {"engine": "chees", "chees_chains": 4}


def snaper_normal_loc_scale():
    """SNAPER-HMC variant (D-T31) under SBC: same lockstep machinery as
    ChEES with the principal-component trajectory criterion."""
    ir, _ = normal_loc_scale()
    return ir, {"engine": "snaper", "chees_chains": 4}


def snaper_eight_schools_ncp():
    ir, _ = eight_schools_ncp()
    return ir, {"engine": "snaper", "chees_chains": 4}


def meads_normal_loc_scale():
    """MEADS GHMC kernel (D-T30) under SBC: 16 chains / 4 folds per
    replication, ensemble initialized at the generating theta."""
    ir, _ = normal_loc_scale()
    return ir, {"engine": "meads", "chees_chains": 16}


def meads_eight_schools_ncp():
    ir, _ = eight_schools_ncp()
    return ir, {"engine": "meads", "chees_chains": 16}


MODELS = {
    "normal_loc_scale": normal_loc_scale,
    "eight_schools_ncp": eight_schools_ncp,
    "eight_schools_centered_gibbs": eight_schools_centered_gibbs,
    "lkj_mvn": lkj_mvn,
    "zsn_anova": zsn_anova,
    "ordered_normal": ordered_normal,
    "meas_obs_affine": meas_obs_affine,
    "chees_normal_loc_scale": chees_normal_loc_scale,
    "chees_eight_schools_ncp": chees_eight_schools_ncp,
    "snaper_normal_loc_scale": snaper_normal_loc_scale,
    "snaper_eight_schools_ncp": snaper_eight_schools_ncp,
    "meads_normal_loc_scale": meads_normal_loc_scale,
    "meads_eight_schools_ncp": meads_eight_schools_ncp,
}

R_OVERRIDE.update({
    # 4 chains/replication: R=256 already gives 1024 chain runs and
    # L=400 rank support per replication
    "chees_normal_loc_scale": 256,
    "chees_eight_schools_ncp": 256,
    "snaper_normal_loc_scale": 256,
    "snaper_eight_schools_ncp": 256,
    # 16 chains (4 folds) per replication: L=1600 at R=256
    "meads_normal_loc_scale": 256,
    "meads_eight_schools_ncp": 256,
})

OUT = "SBC_r04.json"


def main():
    argv = list(sys.argv[1:])
    r_override = None
    if "--cpu" in argv:
        argv.remove("--cpu")
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")
    if "--r" in argv:
        i = argv.index("--r")
        r_override = int(argv[i + 1])
        del argv[i:i + 2]

    import jax

    names = argv or list(MODELS)
    out = {"platform": jax.devices()[0].platform,
           "device": str(getattr(jax.devices()[0], "device_kind", "")),
           "protocol": "R replications x 1 chain, 500 warmup + 1000 "
                       "draws thinned 10 -> L=100 ranks, one vmapped call; "
                       "chees_* rows (engine field) run 4 ChEES chains per "
                       "replication, ranks pooled across the batch -> L=400",
           "models": {}}
    import os

    if names != list(MODELS) and os.path.exists(OUT):
        with open(OUT) as f:
            prev = json.load(f)
        out["models"] = prev.get("models", {})
        if "notes" in prev:
            out["notes"] = prev["notes"]  # partial runs keep annotations
    # bounded device calls on the remote TPU backend: one R>=512
    # vmapped call ran minutes and kernel-faulted the axon worker
    rep_batch = 64 if out["platform"] == "tpu" else None
    for name in names:
        ir, opts = MODELS[name]()
        R = r_override or R_OVERRIDE.get(name, R_DEFAULT)
        t0 = time.time()
        r = sbc(ir, num_replications=R, num_warmup=500, num_samples=1000,
                thin=10, seed=0, rep_batch=rep_batch, **opts)
        wall = time.time() - t0
        row = {
            "engine": opts.get("engine", "nuts"),
            "wall_s_incl_compile": round(wall, 1),
            "L": r["L"],
            "num_replications": r["num_replications"],
            "min_p": r["min_p"],
            "min_ecdf_p": r["min_ecdf_p"],
            "divergence_rate": r["divergence_rate"],
            "chi2": {k: {"stat": round(s, 2), "p": round(p, 4)}
                     for k, (s, p) in r["chi2"].items()},
            "ecdf": {k: {"stat": round(s, 4), "p": round(p, 4)}
                     for k, (s, p) in r["ecdf"].items()},
        }
        out["models"][name] = row
        print(name, "min_ecdf_p:", row["min_ecdf_p"],
              "min_p:", row["min_p"], f"wall {row['wall_s_incl_compile']}s",
              flush=True)
        # checkpoint after EVERY model: a backend crash on model k
        # must not lose models 1..k-1 (it did — round-4 rerun)
        with open(OUT, "w") as f:
            json.dump(out, f, indent=1)
    # final write regardless (an empty model list must still refresh
    # the metadata the merge path preserved)
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {OUT}", flush=True)


if __name__ == "__main__":
    main()

"""Model comparison with WAIC and PSIS-LOO
(reference notebooks/03_model_comparison.livemd narrative).

Two models for the same noisy measurements:
  M1 "known variance": y ~ Normal(mu, 1.0) — fixed noise scale,
     misspecified when the real noise differs;
  M2 "unknown variance": y ~ Normal(mu, sigma), sigma ~ HalfNormal(2).

The data are generated with sigma = 2.3, so M2 should win — but not by
a landslide at n=40: the information criteria quantify exactly how much
predictive accuracy the extra parameter buys, penalized for its own
flexibility. WAIC and LOO estimate the same out-of-sample elpd from
within-sample draws; PSIS adds a reliability diagnostic (Pareto k).

TPU-first formulation: pointwise log-likelihoods for all posterior
draws come from ONE vmapped evaluation of the pointwise-compiled model
(compiler.compile_pointwise) — the reference walks the trace row by row
on the host (model_comparison.ex:19-50).
"""

import os

import numpy as np

from exmc_tpu import Builder, dists, sample
from exmc_tpu.model_comparison import compare, loo, waic

SMOKE = os.environ.get("EXMC_EXAMPLES_SMOKE") == "1"

N = 40
TRUE = {"mu": 3.0, "sigma": 2.3}


def generate(seed=21):
    rng = np.random.default_rng(seed)
    return (TRUE["mu"] + rng.normal(0.0, TRUE["sigma"], N)).astype(np.float32)


def model_known_variance(y):
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "mu", dists.Normal, {"mu": 0.0, "sigma": 10.0})
    ir = Builder.rv(ir, "y", dists.Normal, {"mu": "mu", "sigma": 1.0},
                    shape=(N,))
    ir = Builder.obs(ir, "y_obs", "y", y)
    return ir


def model_unknown_variance(y):
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "mu", dists.Normal, {"mu": 0.0, "sigma": 10.0})
    ir = Builder.rv(ir, "sigma", dists.HalfNormal, {"sigma": 2.0})
    ir = Builder.rv(ir, "y", dists.Normal, {"mu": "mu", "sigma": "sigma"},
                    shape=(N,))
    ir = Builder.obs(ir, "y_obs", "y", y)
    return ir


def main():
    y = generate()
    chains = 2 if SMOKE else 8
    n = 150 if SMOKE else 1000
    kw = dict(num_chains=chains, num_warmup=max(300, n), num_samples=n,
              seed=0)

    ir1 = model_known_variance(y)
    ir2 = model_unknown_variance(y)
    tr1, _ = sample(ir1, **kw)
    tr2, _ = sample(ir2, **kw)

    print(f"M1 (sigma=1 fixed): mu = {tr1['mu'].mean():.2f}")
    print(f"M2 (sigma free):    mu = {tr2['mu'].mean():.2f}, "
          f"sigma = {tr2['sigma'].mean():.2f} (true {TRUE['sigma']})")

    loo_by_name = {}
    for name, ir, tr in [("M1", ir1, tr1), ("M2", ir2, tr2)]:
        w = waic(ir, tr)
        l = loo_by_name[name] = loo(ir, tr, psis=True)
        print(f"{name}: elpd_waic = {w['elpd_waic']:8.1f} "
              f"(p_waic {w['p_waic']:.1f}), elpd_loo = {l['elpd_loo']:8.1f}, "
              f"max pareto_k = {np.max(l['pareto_k']):.2f}")

    table = compare({"known_var": (ir1, tr1), "unknown_var": (ir2, tr2)})
    print("\nrank  model         elpd     d_elpd")
    for r in table:
        print(f"{r['rank']:>4}  {r['name']:<12} {r['elpd']:8.1f} "
              f"{r['delta_elpd']:8.1f}")

    if not SMOKE:
        assert table[0]["name"] == "unknown_var"
        # the misspecified fixed-variance model loses badly at sigma=2.3
        assert table[1]["delta_elpd"] > 10
        assert float(np.max(loo_by_name["M2"]["pareto_k"])) < 0.7


if __name__ == "__main__":
    main()

"""BDA3 ch. 6 — Posterior predictive checks (reference
notebooks/bda/ch06_posterior_predictive.livemd; Vehtari demo 6.1).

Newcomb's light-speed data under the Normal model (ch. 3): the model
is WRONG (two gross outliers), and this chapter is about how to catch
that. Fit with NUTS, replicate datasets with posterior_predictive,
and compare two test statistics:

  * sample VARIANCE — useless: the Normal model matches it by
    construction (it has a variance parameter to absorb it);
  * sample MINIMUM — decisive: no Gaussian posterior draw produces a
    minimum near -44, so the predictive p-value pins to ~0.
"""

import os

import numpy as np

from exmc_tpu import Builder, dists, sample
from exmc_tpu.predictive import posterior_predictive

SMOKE = os.environ.get("EXMC_EXAMPLES_SMOKE") == "1"

LIGHT = np.array([
    28, 26, 33, 24, 34, -44, 27, 16, 40, -2,
    29, 22, 24, 21, 25, 30, 23, 29, 31, 19,
    24, 20, 36, 32, 36, 28, 25, 21, 28, 29,
    37, 25, 28, 26, 30, 32, 36, 26, 30, 22,
    36, 23, 27, 27, 28, 27, 31, 27, 26, 33,
    26, 32, 32, 24, 39, 28, 24, 25, 32, 25,
    29, 27, 28, 29, 16, 23], dtype=np.float64)


def main():
    n = len(LIGHT)
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "mu", dists.Normal, {"mu": 0.0, "sigma": 100.0})
    ir = Builder.rv(ir, "sigma", dists.HalfNormal, {"sigma": 50.0})
    ir = Builder.rv(ir, "y", dists.Normal, {"mu": "mu", "sigma": "sigma"},
                    shape=(n,))
    ir = Builder.obs(ir, "y_obs", "y", LIGHT.astype(np.float32))

    k = 150 if SMOKE else 1000
    trace, _ = sample(ir, num_chains=4, num_warmup=max(300, k),
                      num_samples=k, seed=0)
    rep = posterior_predictive(ir, trace, seed=1)["y_obs"]
    rep = np.asarray(rep).reshape(-1, n)   # (draws, 66)

    t_var_obs = LIGHT.var(ddof=1)
    t_var_rep = rep.var(axis=1, ddof=1)
    p_var = float((t_var_rep >= t_var_obs).mean())

    t_min_obs = LIGHT.min()
    t_min_rep = rep.min(axis=1)
    p_min = float((t_min_rep <= t_min_obs).mean())

    print(f"replications: {rep.shape[0]} datasets of {n}")
    print(f"[variance ] T(y)={t_var_obs:.1f}; predictive p = {p_var:.3f} "
          "(fine — the model absorbs variance by construction)")
    print(f"[minimum  ] T(y)={t_min_obs:.0f}; predictive p = {p_min:.4f} "
          "(the Normal model cannot produce -44: MISFIT detected)")
    assert 0.05 < p_var < 0.95, p_var
    assert p_min < 0.01, p_min
    print("PPC OK: the minimum statistic catches the outlier misfit the "
          "variance statistic hides")


if __name__ == "__main__":
    main()

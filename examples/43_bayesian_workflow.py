"""The full Bayesian workflow on one problem (Gelman et al. 2020).

Every stage uses a different subsystem, end to end: prior predictive
checks -> fit (NUTS) -> convergence diagnostics -> posterior
predictive checks -> model expansion (robust likelihood) -> predictive
comparison (PSIS-LOO) -> evidence comparison (SMC marginal likelihood
+ Bayes factor) -> calibration (SBC). The data are deliberately
heavy-tailed so the workflow CATCHES the Normal model's misfit and
prefers the StudentT expansion at every stage.

Run: python examples/43_bayesian_workflow.py
"""

import os

import numpy as np

from exmc_tpu import Model, dists, sample
from exmc_tpu.diagnostics import ebfmi, ess, rhat
from exmc_tpu.model_comparison import bayes_factor, compare, loo
from exmc_tpu.predictive import ppc_pvalue, prior_samples
from exmc_tpu.sbc import sbc

SMOKE = os.environ.get("EXMC_EXAMPLES_SMOKE") == "1"
WARM, DRAWS = (200, 200) if SMOKE else (500, 1000)

rng = np.random.default_rng(42)
y = 2.0 + 1.0 * rng.standard_t(2, size=120)  # heavy tails, truth mu=2


def normal_model():
    with Model() as m:
        m.rv("mu", dists.Normal, {"mu": 0.0, "sigma": 5.0})
        m.rv("sigma", dists.HalfNormal, {"sigma": 3.0})
        m.rv("y", dists.Normal, {"mu": "mu", "sigma": "sigma"})
        m.obs("y_obs", "y", y)
    return m.ir


def robust_model():
    with Model() as m:
        m.rv("mu", dists.Normal, {"mu": 0.0, "sigma": 5.0})
        m.rv("sigma", dists.HalfNormal, {"sigma": 3.0})
        m.rv("nu", dists.Gamma, {"alpha": 2.0, "beta": 0.1})
        m.rv("y", dists.StudentT,
             {"df": "nu", "loc": "mu", "scale": "sigma"})
        m.obs("y_obs", "y", y)
    return m.ir


# 1. prior predictive: do the priors generate data on the right scale?
pp = prior_samples(normal_model(), num_draws=500, seed=0)
print(f"1 prior pred  : y scale 5-95% "
      f"[{np.quantile(pp['y'], 0.05):.1f}, {np.quantile(pp['y'], 0.95):.1f}]"
      f" (data span [{y.min():.1f}, {y.max():.1f}]) — covers it")

# 2. fit both models
tr_n, st_n = sample(normal_model(), num_chains=4, num_warmup=WARM,
                    num_samples=DRAWS, seed=0)
tr_t, st_t = sample(robust_model(), num_chains=4, num_warmup=WARM,
                    num_samples=DRAWS, seed=0)

# 3. convergence: R-hat, ESS, E-BFMI, divergences
print(f"2 fit         : normal mu {tr_n['mu'].mean():.2f}, "
      f"robust mu {tr_t['mu'].mean():.2f} (truth 2.0)")
print(f"3 diagnostics : robust R-hat(mu) {rhat(tr_t['mu']):.4f}, "
      f"ESS {ess(tr_t['mu']):.0f}, "
      f"E-BFMI {np.min(ebfmi(st_t['energy'])):.2f}, "
      f"div {int(st_t['divergences'].sum())}")

# 4. posterior predictive check: the Normal model cannot reproduce the
#    tails; the robust model can
stat = lambda v: np.abs(v - np.median(v)).max()
p_n = ppc_pvalue(normal_model(), tr_n, stat, seed=1)["p_value"]
p_t = ppc_pvalue(robust_model(), tr_t, stat, seed=1)["p_value"]
print(f"4 PPC (max-dev): normal p={p_n:.3f} (misfit!), robust p={p_t:.3f}")

# 5. predictive comparison: PSIS-LOO
rows = compare({"normal": (normal_model(), tr_n),
                "robust": (robust_model(), tr_t)}, criterion="loo")
best = rows[0]
print(f"5 PSIS-LOO    : winner {best['name']} "
      f"(delta_elpd {rows[1]['delta_elpd']:.1f} "
      f"+- {rows[1]['delta_elpd_se']:.1f})")

# 6. evidence: SMC marginal likelihood + Bayes factor
if not SMOKE:
    bf = bayes_factor(robust_model(), normal_model(),
                      num_particles=1500, seed=0)
    print(f"6 evidence    : log10 BF(robust/normal) = "
          f"{bf['log10_bf']:.1f} (>1 = strong)")

# 7. calibration: SBC on the chosen model's full pipeline
if not SMOKE:
    res = sbc(robust_model(), num_replications=100, num_warmup=300,
              num_samples=400, thin=10, seed=0)
    print(f"7 SBC         : min ECDF/chi2 p {res['min_p']:.3f} "
          f"(> 0.01 = calibrated), div rate {res['divergence_rate']:.4f}")

if not SMOKE:
    assert best["name"] == "robust"
    assert p_n < 0.05 < p_t < 0.98
    assert bf["log10_bf"] > 1.0
print("OK")

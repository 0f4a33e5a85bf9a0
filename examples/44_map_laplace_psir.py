"""The fast-inference ladder: MAP -> Laplace -> PSIR -> (NUTS when it
matters).

Stan users reach for `optimize` before `sample`; PyMC users for
`find_MAP`. This example climbs the whole ladder on one skewed-posterior
problem (a Gamma rate with few observations) and shows what each rung
buys — and how the Pareto k-hat diagnostic (D-T36) tells you whether
the cheap approximation is trustworthy WITHOUT running the gold
standard:

  1. fit_map        — one point, milliseconds; no uncertainty.
  2. laplace        — a Gaussian at the mode; biased when the posterior
                      is skewed (here: mode < mean by construction).
  3. laplace(psir=True) — importance-resample the Gaussian draws toward
                      the exact posterior; k-hat < 0.7 certifies it.
  4. sample (NUTS)  — exact, for the final comparison.

Run: python examples/44_map_laplace_psir.py
"""

import os

import numpy as np

from exmc_tpu import Builder, dists, fit_map, laplace, sample

SMOKE = os.environ.get("EXMC_EXAMPLES_SMOKE") == "1"
DRAWS = 1000 if SMOKE else 4000

# lambda ~ Gamma(2, 1); y_i ~ Exponential(lambda). Conjugate:
# posterior lambda | y ~ Gamma(2 + n, 1 + sum y) — exactly computable,
# and right-skewed enough at n=6 that the Laplace Gaussian is biased.
rng = np.random.default_rng(0)
true_lam = 1.8
ys = rng.exponential(1.0 / true_lam, size=6).astype(np.float32)
a_post, b_post = 2.0 + len(ys), 1.0 + float(ys.sum())
exact_mean, exact_sd = a_post / b_post, np.sqrt(a_post) / b_post

ir = Builder.new_ir()
ir = Builder.rv(ir, "lam", dists.Gamma, {"alpha": 2.0, "beta": 1.0})
ir = Builder.rv(ir, "y", dists.Exponential, {"lambda": "lam"})
ir = Builder.obs(ir, "y_obs", "y", ys)

print(f"exact posterior: mean {exact_mean:.3f}, sd {exact_sd:.3f} "
      f"(mode {(a_post - 1) / b_post:.3f} — skew pulls mean above mode)")

# -- rung 1: MAP (jacobian=False = Stan optimize's constrained-space
# mode; the default True gives the unconstrained-space mode the
# samplers target) ----------------------------------------------------
point, info = fit_map(ir, seed=0, jacobian=False)
print(f"\nMAP: lam = {float(point['lam']):.3f} "
      f"({info['iters']} L-BFGS iters, converged={info['converged']})")

# -- rung 2: plain Laplace -------------------------------------------
trace_g, info_g = laplace(ir, draws=DRAWS, seed=0)
print(f"Laplace:      mean {trace_g['lam'].mean():.3f}  "
      f"sd {trace_g['lam'].std():.3f}")

# -- rung 3: Laplace + PSIR ------------------------------------------
trace_p, info_p = laplace(ir, draws=DRAWS, seed=0, psir=True)
k = info_p["psir"]["pareto_k"]
print(f"Laplace+PSIR: mean {trace_p['lam'].mean():.3f}  "
      f"sd {trace_p['lam'].std():.3f}  "
      f"(pareto k-hat {k:.2f} -> "
      f"{'trustworthy' if k < 0.7 else 'DO NOT TRUST'}; "
      f"IS-ESS {info_p['psir']['ess_is']:.0f})")

# -- rung 4: NUTS -----------------------------------------------------
trace_n, _ = sample(ir, num_chains=2, num_warmup=400,
                    num_samples=DRAWS // 2, seed=0)
print(f"NUTS:         mean {trace_n['lam'].mean():.3f}  "
      f"sd {trace_n['lam'].std():.3f}")

err_g = abs(trace_g["lam"].mean() - exact_mean)
err_p = abs(trace_p["lam"].mean() - exact_mean)
print(f"\nmean abs error vs exact: Laplace {err_g:.3f} -> "
      f"PSIR {err_p:.3f} ({err_g / max(err_p, 1e-9):.1f}x better)")
assert err_p < err_g, "PSIR should reduce the skew bias"
assert k < 0.7, "the quadratic approximation is repairable here"
assert abs(trace_p["lam"].mean() - exact_mean) < 3 * exact_sd / np.sqrt(DRAWS) + 0.05
print("OK")

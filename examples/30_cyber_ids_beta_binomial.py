"""BDA-cyber ch. 2 — IDS rule effectiveness (reference
notebooks/bda-cyber/ch02_ids_rule_effectiveness.livemd; the security
edition of the ch. 2 beta-binomial).

A vendor claims an IDS rule is "95% accurate". Your SOC investigated
200 of its alerts and confirmed 43 true positives. The conjugate
Beta-Binomial gives the true-positive-rate posterior; a prior sweep
shows 200 investigations dominate any sane prior; then the per-rule
table ranks four real rules by P(TPR > 0.25) — the triage decision.
"""

import os

import numpy as np
import jax.numpy as jnp
from scipy import stats as sps

from exmc_tpu import Builder, dists, sample

SMOKE = os.environ.get("EXMC_EXAMPLES_SMOKE") == "1"

K, N = 43, 200
RULES = [  # (rule, alerts fired, investigated, true positives)
    ("SID-2024-1001", 847, 200, 43),
    ("SID-2024-1042", 312, 150, 71),
    ("SID-2024-1087", 2241, 180, 6),
    ("SID-2024-1103", 156, 100, 52),
]


def main():
    a, b = 1 + K, 1 + N - K
    mean = a / (a + b)
    lo, hi = sps.beta.ppf([0.025, 0.975], a, b)
    print(f"[conjugate] TPR posterior mean {mean:.3f}, "
          f"95% CI ({lo:.3f}, {hi:.3f}) — the '95% accurate' claim is "
          f"P(TPR >= 0.95) = {sps.beta.sf(0.95, a, b):.2e}")

    for n0 in (2, 20, 200):
        aa, bb = 0.5 * n0 + K, 0.5 * n0 + (N - K)
        print(f"[sweep] prior n0={n0:>3}: posterior mean {aa/(aa+bb):.3f}")

    ir = Builder.new_ir()
    ir = Builder.rv(ir, "tpr", dists.Beta, {"alpha": 1.0, "beta": 1.0})
    ir = Builder.rv(ir, "k", dists.Binomial, {"n": float(N), "p": "tpr"})
    ir = Builder.obs(ir, "k_obs", "k", float(K))
    n = 200 if SMOKE else 1000
    trace, _ = sample(ir, num_chains=4, num_warmup=n, num_samples=n, seed=0)
    tpr = np.asarray(trace["tpr"]).ravel()
    assert abs(tpr.mean() - mean) < 0.01
    print(f"[nuts]     posterior mean {tpr.mean():.3f} (matches conjugate)")

    print("rule ranking by P(TPR > 0.25):")
    for rule, fired, inv, tp in RULES:
        aa, bb = 1 + tp, 1 + inv - tp
        p_good = sps.beta.sf(0.25, aa, bb)
        print(f"  {rule}: fired {fired:>5}, TPR "
              f"{aa/(aa+bb):.3f}, P(>0.25) = {p_good:.3f}"
              + ("  <- tune or retire" if p_good < 0.5 else ""))
    print("ids beta-binomial OK")


if __name__ == "__main__":
    main()

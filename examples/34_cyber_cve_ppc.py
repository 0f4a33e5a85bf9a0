"""BDA-cyber ch. 6 — Posterior predictive checks on CVE arrivals
(reference notebooks/bda-cyber/ch06_threat_model_ppc.livemd; the
security edition of ch. 6's Newcomb PPC).

52 weeks of CVE disclosures relevant to your stack, modeled as Poisson.
Week 27 is a Patch-Tuesday + major-library cluster (14, 18, 12). The
PPC lesson: the MEAN statistic says the model is fine, the MAX and the
variance-to-mean ratio expose the clustering a Poisson can never
produce — and capacity planning on the Poisson would understaff patch
weeks badly.
"""

import os

import numpy as np

from exmc_tpu import Builder, dists, sample
from exmc_tpu.predictive import posterior_predictive

SMOKE = os.environ.get("EXMC_EXAMPLES_SMOKE") == "1"

CVES = np.array([
    3, 5, 2, 4, 6, 3, 2, 5, 4, 3, 7, 4, 3, 2, 5, 4, 3, 6, 4, 3,
    2, 5, 4, 3, 4, 5, 14, 18, 12, 4, 3, 5, 3, 4, 6, 3, 2, 5, 4,
    3, 5, 4, 3, 2, 4, 5, 3, 4, 3, 5, 4, 3, 2], dtype=np.float64)


def main():
    n = len(CVES)
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "rate", dists.Gamma, {"alpha": 2.0, "beta": 0.5})
    ir = Builder.rv(ir, "cves", dists.Poisson, {"mu": "rate"}, shape=(n,))
    ir = Builder.obs(ir, "cves_obs", "cves", CVES.astype(np.float32))

    k = 150 if SMOKE else 1000
    trace, _ = sample(ir, num_chains=4, num_warmup=max(300, k),
                      num_samples=k, seed=0)
    rep = np.asarray(posterior_predictive(ir, trace, seed=1)["cves_obs"])
    rep = rep.reshape(-1, n)

    checks = {
        "mean": (CVES.mean(), rep.mean(axis=1)),
        "max": (CVES.max(), rep.max(axis=1)),
        "var/mean": (CVES.var() / CVES.mean(),
                     rep.var(axis=1) / rep.mean(axis=1)),
    }
    ps = {}
    for name, (obs, sim) in checks.items():
        ps[name] = float((sim >= obs).mean())
        print(f"[{name:>9}] T(y) = {obs:.2f}, predictive p = {ps[name]:.4f}")
    print("the mean passes (a rate parameter absorbs it); max and "
          "var/mean pin to ~0: CVE arrivals CLUSTER (Patch Tuesday, "
          "library disclosures) — a Poisson SLA sized at the 95th "
          f"percentile ({np.percentile(rep, 95):.0f}/week) would be "
          f"overrun by the observed {CVES.max():.0f}-CVE week")
    assert 0.05 < ps["mean"] < 0.95
    assert ps["max"] < 0.02 and ps["var/mean"] < 0.02
    print("cve PPC OK")


if __name__ == "__main__":
    main()

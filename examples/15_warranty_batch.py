"""Supplier attribution from warranty claims — "the batch"
(reference notebooks/14_the_batch.livemd narrative).

Laptops use power-supply modules from three suppliers. Warranty claims
are rising, but each failed unit's supplier is UNKNOWN — only the
monthly production mix is recorded. Which supplier's population has the
elevated defect rate, and with what probability?

Model: month m shipped n_m units with known supplier fractions w_mk;
per-supplier defect rates p_k get Beta priors; claims are

    y_m ~ Poisson(n_m * sum_k w_mk * p_k)

The varying mix across months is what identifies the per-supplier
rates — a linear unmixing the spreadsheet cannot do. The deliverable is
P(supplier k is worst), the posterior excess rate, and the expected
claims avoided by switching — numbers a recall decision can use.

TPU-first formulation: the month x supplier mixing is ONE matvec
(``matmul`` det node on the MXU); all months evaluate in a single
vector Poisson term.
"""

import os

import numpy as np

from exmc_tpu import Builder, dists, sample
from exmc_tpu.diagnostics import rhat

SMOKE = os.environ.get("EXMC_EXAMPLES_SMOKE") == "1"

SUPPLIERS = ["Atlas", "Beacon", "Crest"]
TRUE_P = np.array([0.004, 0.019, 0.006])   # Beacon is the problem
MONTHS = 12


def generate(seed=29):
    rng = np.random.default_rng(seed)
    # monthly supplier mix drifts as contracts shift (identifiability!)
    raw = rng.dirichlet([4.0, 3.0, 3.0], MONTHS)
    n = rng.integers(2500, 5000, MONTHS)
    lam = n * (raw @ TRUE_P)
    y = rng.poisson(lam)
    return raw.astype(np.float32), n.astype(np.float32), y.astype(np.float32)


def build(w, n, y):
    import jax.numpy as jnp

    wj, nj = jnp.asarray(w), jnp.asarray(n)
    ir = Builder.new_ir()
    # weakly-informative Beta prior on each supplier's defect rate
    ir = Builder.rv(ir, "p", dists.Beta, {"alpha": 1.5, "beta": 150.0},
                    shape=(3,))
    ir = Builder.det(ir, "lam", lambda p: nj * (wj @ p), ["p"])
    ir = Builder.rv(ir, "y", dists.Poisson, {"mu": "lam"}, shape=(MONTHS,))
    ir = Builder.obs(ir, "y_obs", "y", y)
    return ir


def main():
    w, n, y = generate()
    ir = build(w, n, y)
    chains = 4 if SMOKE else 16
    draws = 150 if SMOKE else 1000
    trace, stats = sample(ir, num_chains=chains, num_warmup=max(300, draws),
                          num_samples=draws, seed=0)

    p = trace["p"].reshape(-1, 3)
    for k, name in enumerate(SUPPLIERS):
        print(f"{name:7s} defect rate = {p[:, k].mean()*100:.2f}% "
              f"(true {TRUE_P[k]*100:.2f}%), "
              f"rhat={float(rhat(trace['p'][..., k])):.3f}")
    worst = np.argmax(p, axis=1)
    for k, name in enumerate(SUPPLIERS):
        print(f"P({name} is worst) = {np.mean(worst == k):.3f}")
    # decision: claims avoided next quarter by replacing the worst
    k_star = int(np.bincount(worst).argmax())
    others = [k for k in range(3) if k != k_star]
    excess = p[:, k_star] - p[:, others].min(axis=1)
    avoided = excess * 3 * float(n.mean())  # 3 months of production
    print(f"expected claims avoided per quarter by replacing "
          f"{SUPPLIERS[k_star]}: {avoided.mean():.0f} "
          f"(90% CI {np.percentile(avoided, 5):.0f}-"
          f"{np.percentile(avoided, 95):.0f})")
    print(f"divergences: {int(stats['divergences'].sum())}")

    if not SMOKE:
        assert k_star == 1  # Beacon
        assert float(np.mean(worst == 1)) > 0.95
        assert abs(p[:, 1].mean() - TRUE_P[1]) < 0.006


if __name__ == "__main__":
    main()

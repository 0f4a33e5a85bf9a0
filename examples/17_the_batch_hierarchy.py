"""Lot-level traceability: supplier -> factory -> batch hierarchy
(reference notebooks/14_the_batch.livemd §II-V — the four-level model
that "does not blame the company, it blames the factory").

Warranty claims on a laptop line trace to power-supply modules from 3
suppliers; each supplier runs 2 factories; each factory ships batches.
The defect hierarchy (all on the logit scale):

    mu ~ Normal(-3, 1)                      industry base rate
    sigma_s ~ HalfNormal(1); theta_s ~ N(mu, sigma_s)       supplier
    sigma_f ~ HalfNormal(1); gamma_f ~ N(theta_{s(f)}, sigma_f) factory
    sigma_b ~ HalfNormal(1); phi_b ~ N(gamma_{f(b)}, sigma_b)   batch
    k_b ~ Binomial(n_b, sigmoid(phi_b))                     claims

The ground truth plants the defect in ONE FACTORY (Crest's newer
plant), not a supplier: supplier-level aggregation (the spreadsheet
Pareto chart) washes it out, the hierarchy isolates it.

TPU-first formulation: the three nested levels are index-gathered
Normal vectors (auto-NCP'd by the rewrite pipeline); the Binomial
likelihood is one vectorized Bernoulli-logits term over batches with
per-batch trial weights (k successes + (n-k) failures as two weighted
obs) — the whole model is a handful of fused vector ops, no per-unit
expansion.
"""

import os

import numpy as np

from exmc_tpu import Builder, dists, sample
from exmc_tpu.diagnostics import rhat

SMOKE = os.environ.get("EXMC_EXAMPLES_SMOKE") == "1"

SUPPLIERS = ["Atlas", "Beacon", "Crest"]
N_SUP, N_FAC_PER = 3, 2
N_FAC = N_SUP * N_FAC_PER
BATCHES_PER_FAC = 8


def generate(seed=14):
    rng = np.random.default_rng(seed)
    base = -3.0  # sigmoid(-3) ~ 4.7% — elevated-claims regime
    theta = base + rng.normal(0, 0.3, N_SUP)
    gamma = theta[np.repeat(np.arange(N_SUP), N_FAC_PER)] + rng.normal(
        0, 0.2, N_FAC
    )
    gamma[5] += 1.6  # Crest plant #2: the bad factory
    fac_of_batch = np.repeat(np.arange(N_FAC), BATCHES_PER_FAC)
    phi = gamma[fac_of_batch] + rng.normal(0, 0.15, len(fac_of_batch))
    n_b = rng.integers(40, 140, len(phi))
    p = 1.0 / (1.0 + np.exp(-phi))
    k_b = rng.binomial(n_b, p)
    return fac_of_batch, n_b.astype(np.float32), k_b.astype(np.float32)


def build(fac_of_batch, n_b, k_b):
    import jax.numpy as jnp

    sup_of_fac = jnp.asarray(np.repeat(np.arange(N_SUP), N_FAC_PER))
    fob = jnp.asarray(fac_of_batch)
    B = len(fac_of_batch)

    ir = Builder.new_ir()
    ir = Builder.rv(ir, "mu", dists.Normal, {"mu": -3.0, "sigma": 1.0})
    ir = Builder.rv(ir, "sigma_s", dists.HalfNormal, {"sigma": 1.0})
    ir = Builder.rv(ir, "theta", dists.Normal,
                    {"mu": "mu", "sigma": "sigma_s"}, shape=(N_SUP,))
    ir = Builder.rv(ir, "sigma_f", dists.HalfNormal, {"sigma": 1.0})
    ir = Builder.det(ir, "theta_of_fac", lambda th: th[sup_of_fac], ["theta"])
    ir = Builder.rv(ir, "gamma", dists.Normal,
                    {"mu": "theta_of_fac", "sigma": "sigma_f"}, shape=(N_FAC,))
    ir = Builder.rv(ir, "sigma_b", dists.HalfNormal, {"sigma": 1.0})
    ir = Builder.det(ir, "gamma_of_batch", lambda g: g[fob], ["gamma"])
    ir = Builder.rv(ir, "phi", dists.Normal,
                    {"mu": "gamma_of_batch", "sigma": "sigma_b"}, shape=(B,))
    # Binomial(n, sigmoid(phi)) as two weighted Bernoulli-logits terms:
    # k * log p + (n - k) * log(1 - p)
    ir = Builder.rv(ir, "claim", dists.Bernoulli, {"logits": "phi"},
                    shape=(B,))
    ir = Builder.obs(ir, "claims", "claim", np.ones(B, np.float32),
                     weight=k_b)
    ir = Builder.rv(ir, "no_claim", dists.Bernoulli, {"logits": "phi"},
                    shape=(B,))
    ir = Builder.obs(ir, "survivals", "no_claim", np.zeros(B, np.float32),
                     weight=n_b - k_b)
    return ir


def main():
    fac_of_batch, n_b, k_b = generate()
    ir = build(fac_of_batch, n_b, k_b)

    chains = 4 if SMOKE else 8
    iters = (150, 150) if SMOKE else (1000, 1000)
    trace, stats = sample(ir, num_chains=chains, num_warmup=iters[0],
                          num_samples=iters[1], seed=0, target_accept=0.9)

    gamma = trace["gamma"].reshape(-1, N_FAC)
    theta = trace["theta"].reshape(-1, N_SUP)
    rate = 1.0 / (1.0 + np.exp(-gamma))

    print("The spreadsheet view (supplier-level defect rates):")
    for s, name in enumerate(SUPPLIERS):
        r = 1.0 / (1.0 + np.exp(-theta[:, s]))
        print(f"  {name:8s}: {100 * r.mean():.2f}%")

    print("\nThe hierarchy's view (factory-level):")
    worst = np.argmax(gamma.mean(axis=0))
    for f in range(N_FAC):
        name = f"{SUPPLIERS[f // N_FAC_PER]} plant {f % N_FAC_PER + 1}"
        flag = "  <-- the batch came from here" if f == worst else ""
        print(f"  {name:16s}: {100 * rate[:, f].mean():.2f}%  "
              f"[{100 * np.percentile(rate[:, f], 5):.2f}, "
              f"{100 * np.percentile(rate[:, f], 95):.2f}]{flag}")

    # P(factory f is the worst)
    p_worst = np.bincount(np.argmax(gamma, axis=1), minlength=N_FAC) / len(gamma)
    print(f"\nP(Crest plant 2 is the worst factory) = {p_worst[5]:.2f}")

    if not SMOKE:
        assert worst == 5, "hierarchy failed to isolate the bad factory"
        assert p_worst[5] > 0.8
    div = int(stats["divergences"].sum())
    max_rhat = max(
        float(rhat(np.asarray(trace[p]).reshape(
            trace[p].shape[0], trace[p].shape[1], -1)[:, :, i]))
        for p in ("mu", "theta", "gamma")
        for i in range(int(np.prod(trace[p].shape[2:], initial=1)))
    )
    print(f"\ndiagnostics: divergences={div}, max R-hat={max_rhat:.3f}")


if __name__ == "__main__":
    main()

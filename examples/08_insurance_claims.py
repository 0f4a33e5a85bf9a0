"""Hierarchical insurance claim frequencies — the actuary's partial
pooling problem (reference notebooks/11_insurance_claims.livemd).

An insurer has 20 business segments: some mature (thousands of
policy-months), some new (a few dozen). Reserves must be set for all.
A hierarchical Poisson model lets each segment have its own rate drawn
from a common distribution — small segments borrow stability from the
book, large segments speak for themselves, and the posterior gives
credible intervals instead of point guesses.

d = 22: 2 hyperparameters + 20 non-centered segment log-rates.
Written through the STAN FRONTEND to show the round-2 extensions
(transformed parameters + vectorized likelihood) on an applied model.
"""

import os

import numpy as np

from exmc_tpu import stan
from exmc_tpu.diagnostics import ess, rhat

SMOKE = os.environ.get("EXMC_EXAMPLES_SMOKE") == "1"

N_SEG = 20

CODE = """
data {
  int S;
  vector[S] counts;     // total claims per segment
  vector[S] exposure;   // policy-months per segment
}
parameters {
  real log_mu_global;
  real<lower=0> sigma_seg;
  vector[S] mu_raw;
}
transformed parameters {
  vector[S] log_rate = log_mu_global + sigma_seg * mu_raw;
}
model {
  log_mu_global ~ normal(-3, 1);
  sigma_seg ~ half_cauchy(1);
  mu_raw ~ normal(0, 1);
  target += poisson_lpmf(counts | exposure * exp(log_rate));
}
"""


def generate(seed=7):
    rng = np.random.default_rng(seed)
    true_global = 0.05  # claims per policy-month
    true_sigma = 0.4
    log_rates = np.log(true_global) + rng.normal(0, true_sigma, N_SEG)
    # exposures span 3 orders of magnitude: mature vs new segments
    exposure = np.round(10 ** rng.uniform(1.5, 4.0, N_SEG))
    counts = rng.poisson(exposure * np.exp(log_rates)).astype(np.float64)
    return counts, exposure, np.exp(log_rates)


def main():
    counts, exposure, true_rates = generate()
    data = {"S": N_SEG, "counts": counts, "exposure": exposure}
    chains = 4 if SMOKE else 32
    n = 150 if SMOKE else 1000
    trace, stats = stan.sample(
        CODE, data, ncp=False, num_chains=chains,
        num_warmup=max(300, n), num_samples=n, seed=0,
    )
    post_rates = np.exp(trace["log_mu_global"][..., None]
                        + trace["sigma_seg"][..., None] * trace["mu_raw"])
    means = post_rates.reshape(-1, N_SEG).mean(axis=0)
    lo, hi = np.percentile(post_rates.reshape(-1, N_SEG), [5, 95], axis=0)
    small = int(np.argmin(exposure))
    big = int(np.argmax(exposure))
    print(f"global rate = {np.exp(trace['log_mu_global']).mean():.4f} "
          f"(true 0.05), rhat={float(rhat(trace['log_mu_global'])):.3f}")
    for tag, j in [("smallest segment", small), ("largest segment", big)]:
        print(f"{tag:16s}: exposure={exposure[j]:7.0f}  "
              f"rate={means[j]:.4f} [{lo[j]:.4f}, {hi[j]:.4f}] "
              f"(true {true_rates[j]:.4f})")
    # partial pooling: the small segment's interval is wider
    assert (hi[small] - lo[small]) > (hi[big] - lo[big])
    if not SMOKE:
        cover = ((true_rates >= lo) & (true_rates <= hi)).mean()
        print(f"90% interval coverage of true rates: {cover:.2f}")
        assert cover > 0.7
        assert float(ess(trace["log_mu_global"])) > 200


if __name__ == "__main__":
    main()

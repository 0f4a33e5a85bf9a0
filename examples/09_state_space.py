"""State-space trend extraction at scale (reference
notebooks/17_state_space.livemd + docs/STATE_SPACE_MODELS.md).

Every macro indicator blends signal and noise: the latent trend moves
slowly, the observations are noisy projections. A state-space model
separates them, and NUTS gives the posterior over the WHOLE latent
trajectory — with credible intervals — not a point filter.

The recipe (reference STATE_SPACE_MODELS.md:20-31):
  1. priors on innovation/observation scales,
  2. a GaussianRandomWalk latent path (one vectorized logpdf — the
     reference built T scalar nodes and called T=100 its "natural
     limit"; the TPU build samples T=5000 in the long-T bench),
  3. a Normal observation likelihood.

Because this model is linear-Gaussian given the scales, the exact
answer is computable by Kalman smoothing — the example cross-checks
NUTS against it (the same check the 32-model validation battery runs
at T=1000).
"""

import os

import numpy as np

from exmc_tpu import Builder, dists, sample
from exmc_tpu.benchmarks.gold_models import kalman_smoother_grw
from exmc_tpu.diagnostics import rhat

SMOKE = os.environ.get("EXMC_EXAMPLES_SMOKE") == "1"


def main():
    T = 60 if SMOKE else 400
    q, r = 0.1, 0.5
    rng = np.random.default_rng(3)
    trend = np.cumsum(rng.normal(0, q, T))
    y = (trend + rng.normal(0, r, T)).astype(np.float32)

    ir = Builder.new_ir()
    ir = Builder.rv(ir, "x", dists.GaussianRandomWalk, {"sigma": q},
                    shape=(T,))
    ir = Builder.rv(ir, "y", dists.Normal, {"mu": "x", "sigma": r},
                    shape=(T,))
    ir = Builder.obs(ir, "y_obs", "y", y)

    chains = 4 if SMOKE else 8
    n = 150 if SMOKE else 800
    trace, stats = sample(ir, num_chains=chains, num_warmup=max(300, n),
                          num_samples=n, seed=0)

    post_mean = trace["x"].reshape(-1, T).mean(axis=0)
    post_sd = trace["x"].reshape(-1, T).std(axis=0)
    kal_mean, kal_sd = kalman_smoother_grw(y.astype(np.float64), q, r)

    err = np.abs(post_mean - kal_mean) / kal_sd
    mid = T // 2
    print(f"T={T}: NUTS trend[{mid}] = {post_mean[mid]:+.3f} ± {post_sd[mid]:.3f}; "
          f"Kalman exact = {kal_mean[mid]:+.3f} ± {kal_sd[mid]:.3f}")
    print(f"max |NUTS - Kalman| / sd over all {T} states: {err.max():.3f}")
    print(f"max rhat over sampled states: "
          f"{max(float(rhat(trace['x'][:, :, i])) for i in range(0, T, max(T//10,1))):.3f}")
    assert err.max() < 0.5, "NUTS must match the exact smoother"
    sd_ratio = post_sd / kal_sd
    assert 0.5 < sd_ratio.min() and sd_ratio.max() < 2.0


if __name__ == "__main__":
    main()

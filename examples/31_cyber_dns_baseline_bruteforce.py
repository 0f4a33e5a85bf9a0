"""BDA-cyber ch. 3 — DNS baseline & brute-force dose-response
(reference notebooks/bda-cyber/ch03_network_baseline_bruteforce.livemd;
the security edition of Newcomb + bioassay).

Part 1: a normal model of benign DNS-query-name lengths (100 clean
observations), then the same model on data contaminated with 10 DGA
domains — the outlier lesson in security clothing.

Part 2: brute-force "dose-response" — P(compromise) vs log failed-login
volume, a 2-parameter logistic fit on a vmapped grid plus NUTS, ending
with the "LD50": the failed-login volume at 50% compromise odds.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp

from exmc_tpu import Builder, dists, sample

SMOKE = os.environ.get("EXMC_EXAMPLES_SMOKE") == "1"

DNS = np.array([
    10, 14, 11, 18, 12, 15, 9, 22, 13, 11, 16, 10, 14, 20, 12, 8, 17, 13,
    11, 15, 19, 12, 10, 14, 16, 13, 11, 21, 9, 14, 12, 15, 18, 10, 13, 11,
    16, 14, 12, 17, 10, 13, 15, 11, 14, 12, 20, 9, 16, 13, 11, 14, 10, 18,
    12, 15, 13, 11, 17, 14, 12, 16, 10, 13, 19, 11, 14, 15, 12, 18, 10, 13,
    11, 16, 14, 12, 9, 15, 17, 13, 11, 14, 10, 12, 18, 16, 13, 15, 11, 14,
    20, 12, 10, 13, 17, 11, 14, 15, 12, 16], dtype=np.float64)
DGA = np.array([32, 28, 35, 30, 27, 33, 29, 31, 34, 26], dtype=np.float64)

# brute-force table: failed attempts, accounts observed, compromised
ATTEMPTS = np.array([1.0, 3.0, 5.0, 10.0, 20.0])
N_ACC = np.array([200.0, 150.0, 80.0, 40.0, 15.0])
N_BF = np.array([2.0, 8.0, 18.0, 25.0, 14.0])


def fit_normal(y, label):
    n = len(y)
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "mu", dists.Normal, {"mu": 0.0, "sigma": 50.0})
    ir = Builder.rv(ir, "sigma", dists.HalfNormal, {"sigma": 20.0})
    ir = Builder.rv(ir, "len", dists.Normal, {"mu": "mu", "sigma": "sigma"},
                    shape=(n,))
    ir = Builder.obs(ir, "len_obs", "len", y.astype(np.float32))
    k = 150 if SMOKE else 800
    trace, _ = sample(ir, num_chains=4, num_warmup=max(300, k),
                      num_samples=k, seed=0)
    mu = float(trace["mu"].mean())
    sd = float(trace["sigma"].mean())
    # alert threshold at the modeled 99.9th percentile
    thresh = mu + 3.09 * sd
    print(f"[{label}] mu {mu:.2f} sigma {sd:.2f} -> 99.9% threshold "
          f"{thresh:.1f} chars")
    return mu, sd, thresh


def bruteforce():
    x = np.log(ATTEMPTS)
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "alpha", dists.Flat, {})
    ir = Builder.rv(ir, "beta", dists.Flat, {})
    ir = Builder.det(ir, "eta",
                     lambda a, b: a + b * jnp.asarray(x, jnp.float32),
                     ["alpha", "beta"])
    ir = Builder.rv(ir, "k", dists.Binomial,
                    {"n": N_ACC.astype(np.float32), "logits": "eta"},
                    shape=(5,))
    ir = Builder.obs(ir, "k_obs", "k", N_BF.astype(np.float32))
    k = 200 if SMOKE else 1000
    trace, _ = sample(ir, num_chains=4, num_warmup=max(500, k),
                      num_samples=k, seed=0)
    a = np.asarray(trace["alpha"]).ravel()
    b = np.asarray(trace["beta"]).ravel()
    keep = b > 0
    ld50 = np.exp(-a[keep] / b[keep])
    print(f"[bruteforce] P(beta > 0) = {keep.mean():.4f}; 50%-compromise "
          f"volume {np.median(ld50):.1f} failed logins "
          f"(80% CI {np.percentile(ld50, 10):.1f}-"
          f"{np.percentile(ld50, 90):.1f})")
    return float(np.median(ld50))


def main():
    mu_c, sd_c, thr_c = fit_normal(DNS, "clean    ")
    mu_d, sd_d, thr_d = fit_normal(np.concatenate([DNS, DGA]),
                                   "with DGA ")
    print(f"10 DGA domains (9% of traffic) drag the threshold "
          f"{thr_c:.1f} -> {thr_d:.1f}: the Normal model ABSORBS the "
          "attack into the baseline instead of flagging it (ch. 6's "
          "PPC is how you catch this)")
    assert thr_d > thr_c + 2.0
    ld50 = bruteforce()
    assert 3.0 < ld50 < 15.0, ld50
    print("dns/bruteforce OK")


if __name__ == "__main__":
    main()

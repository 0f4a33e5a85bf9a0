"""Hierarchical Weibull reliability model (reference
benchmark/reliability_model.exs): d=44 — 4 hyperparameters + 20 types x
2 manually-NCP'd params, right-censored Weibull likelihood, obs data as
a JIT argument.

The BASELINE.json config list names this as the ADVI/Pathfinder/SMC
target ("Weibull reliability model"). TPU-first: per-type raws are two
(T,)-vector RVs; the likelihood gathers per-observation (k, lambda) by
type index and evaluates logpdf-or-log-survival for the whole dataset
in one fused pass (the reference loops types inside the closure)."""

import numpy as np
import jax.numpy as jnp

from exmc_tpu import dists
from exmc_tpu.ir import Builder


def simulate_data(n_types=20, n_per_type=30, censor_time=8.0, seed=0):
    """Simulate per-type Weibull lifetimes with right-censoring at a
    fixed inspection time."""
    rng = np.random.default_rng(seed)
    log_k = rng.normal(0.5, 0.3, size=n_types)
    log_l = rng.normal(2.0, 0.4, size=n_types)
    rows = []
    for j in range(n_types):
        k, lam = np.exp(log_k[j]), np.exp(log_l[j])
        t = lam * rng.weibull(k, size=n_per_type)
        censored = t > censor_time
        t = np.minimum(t, censor_time)
        for ti, ci in zip(t, censored):
            rows.append((ti, 1.0 if ci else 0.0, float(j)))
    data = np.asarray(rows, np.float32)
    truth = {"log_k": log_k, "log_l": log_l}
    return data, truth


def build(data, n_types=20):
    """Build the d = 4 + 2*n_types IR; ``data`` is (n, 3) rows of
    (time, censored_flag, type_index)."""

    def loglik(_x, params, data=None):
        times = data[:, 0]
        censored = data[:, 1]
        type_idx = data[:, 2].astype(jnp.int32)

        log_k = params["log_k_mean"] + params["log_k_sigma"] * params["k_raw"]
        log_l = params["log_l_mean"] + params["log_l_sigma"] * params["l_raw"]
        k = jnp.exp(jnp.clip(log_k, -3.0, 3.0))
        lam = jnp.exp(jnp.clip(log_l, -3.0, 6.0))
        k_i = k[type_idx]
        lam_i = lam[type_idx]

        zt = jnp.maximum(times, 1e-10) / lam_i
        log_pdf = (
            jnp.log(k_i) - jnp.log(lam_i) + (k_i - 1.0) * jnp.log(zt) - zt**k_i
        )
        log_sf = -(zt**k_i)  # right-censored: Weibull log-survival
        return jnp.sum(jnp.where(censored > 0.5, log_sf, log_pdf))

    lik = dists.Custom(logpdf_fn=loglik, support="real")

    ir = Builder.new_ir()
    ir = Builder.data(ir, np.asarray(data, np.float32))
    ir = Builder.rv(ir, "log_k_mean", dists.Normal, {"mu": 0.5, "sigma": 1.0})
    ir = Builder.rv(ir, "log_k_sigma", dists.HalfCauchy, {"scale": 1.0})
    ir = Builder.rv(ir, "log_l_mean", dists.Normal, {"mu": 2.0, "sigma": 1.0})
    ir = Builder.rv(ir, "log_l_sigma", dists.HalfCauchy, {"scale": 1.0})
    ir = Builder.rv(ir, "k_raw", dists.Normal, {"mu": 0.0, "sigma": 1.0},
                    shape=(n_types,))
    ir = Builder.rv(ir, "l_raw", dists.Normal, {"mu": 0.0, "sigma": 1.0},
                    shape=(n_types,))
    ir = Builder.rv(ir, "lik", lik, {
        "log_k_mean": "log_k_mean", "log_k_sigma": "log_k_sigma",
        "log_l_mean": "log_l_mean", "log_l_sigma": "log_l_sigma",
        "k_raw": "k_raw", "l_raw": "l_raw",
    })
    ir = Builder.obs(ir, "lik_obs", "lik", 0.0)
    return ir

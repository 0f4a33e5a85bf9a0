"""Laplace marginalization of GRW latents (exmc_tpu/marginal.py) —
the VERDICT r2 #3 long-T SV deliverable (INLA-within-MCMC)."""

import numpy as np
import pytest
import jax.numpy as jnp

from exmc_tpu import sample
from exmc_tpu.benchmarks.gold_models import kalman_smoother_grw
from exmc_tpu.benchmarks.suite import sv_model
from exmc_tpu.marginal import (
    make_grw_marginal,
    sv_inla,
    sv_marginal_model,
)


def test_gaussian_likelihood_exact():
    """Laplace is EXACT for a Gaussian likelihood: the marginal logZ
    must match the dense Gaussian identity and the mode/variances must
    match the Kalman/RTS smoother (the battery's exact machinery)."""
    rng = np.random.default_rng(0)
    T, q, r = 200, 0.3, 0.7
    y = (np.cumsum(rng.normal(0, q, T)) + rng.normal(0, r, T)).astype(
        np.float64
    )

    def loglik(s, theta):
        return (-0.5 * ((jnp.asarray(y) - s) / r) ** 2 - jnp.log(r)
                - 0.5 * jnp.log(2 * jnp.pi))

    marg = make_grw_marginal(loglik, T)
    logZ, s_hat, var_hat = marg(q, {})

    D = np.eye(T) - np.diag(np.ones(T - 1), -1)
    Q = D.T @ D / q**2
    Sig = np.linalg.inv(Q) + np.eye(T) * r**2
    exact = -0.5 * (np.linalg.slogdet(2 * np.pi * Sig)[1]
                    + y @ np.linalg.solve(Sig, y))
    assert abs(float(logZ) - exact) < 1e-3 * abs(exact)

    m_kal, sd_kal = kalman_smoother_grw(y, q, r)
    np.testing.assert_allclose(np.asarray(s_hat), m_kal, atol=1e-4)
    np.testing.assert_allclose(np.sqrt(np.asarray(var_hat)), sd_kal,
                               atol=1e-4)


def test_sv_inla_recovers_truth_t500():
    """The INLA grid posterior must land near the generating
    hyperparameters for a T=500 SV series (sigma scaled per the suite's
    sqrt(100/t) convention, true nu=10)."""
    t = 500
    ir = sv_model(t=t)
    r = np.asarray(ir.nodes["r_obs"].op[2])
    res = sv_inla(r)
    true_sigma = 0.15 * np.sqrt(100.0 / t)
    assert abs(res["sigma_mean"] - true_sigma) < 3.5 * res["sigma_sd"]
    assert res["nu_mean"] > 3.0  # heavy-tail df identified away from 2
    assert np.isfinite(res["path_mean"]).all()
    assert (res["path_sd"] > 0).all()
    # posterior normalizes
    assert abs(res["posterior"].sum() - 1.0) < 1e-6


def test_sv_marginal_model_nuts():
    """sv_marginal_model drops the Laplace marginal into the standard
    NUTS kernel as a Custom likelihood: a 2-d sampling problem whose
    posterior must agree with the INLA grid (same approximation)."""
    t = 300
    ir_full = sv_model(t=t)
    r = np.asarray(ir_full.nodes["r_obs"].op[2])
    ir = sv_marginal_model(r)
    trace, stats = sample(ir, ncp=False, num_chains=4, num_warmup=300,
                          num_samples=300, seed=0)
    from exmc_tpu.diagnostics import rhat

    sig = trace["sigma"]
    assert float(rhat(sig)) < 1.05
    res = sv_inla(r)
    assert abs(float(sig.mean()) - res["sigma_mean"]) < 3 * res["sigma_sd"]
    assert int(stats["divergences"].sum()) < 0.05 * 4 * 300

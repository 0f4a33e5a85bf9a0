"""Flow-VI + NeuTra-HMC tests (exmc_tpu/flows.py, D-T32).

Beyond the reference (advi.ex is mean-field only). Bars: exact
inverse/logdet algebra, ELBO against a CLOSED-FORM log evidence,
covariance recovery a diagonal family cannot express, and NeuTra
sampling the centered funnel — the geometry plain centered NUTS
fails on — with clean diagnostics.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from exmc_tpu import Builder, Model, dists
from exmc_tpu.diagnostics import ess, rhat
from exmc_tpu.flows import (
    FlowFit,
    flow_fit,
    flow_forward,
    flow_inverse,
    init_flow,
    sample_neutra,
)


def test_flow_inverse_and_logdet():
    key = jax.random.PRNGKey(0)
    params = init_flow(key, 5, num_layers=4, hidden=16)
    # bend the flow away from identity so the test is non-trivial
    params["layers"][1]["w2"] = 0.3 * jax.random.normal(
        jax.random.fold_in(key, 1), params["layers"][1]["w2"].shape)
    params["layers"][2]["b2"] = 0.2 * jax.random.normal(
        jax.random.fold_in(key, 2), params["layers"][2]["b2"].shape)
    z = jax.random.normal(jax.random.fold_in(key, 3), (5,))
    x, ld = flow_forward(params, z)
    z2, ld_inv = flow_inverse(params, x)
    assert float(jnp.abs(z2 - z).max()) < 1e-5
    assert float(ld + ld_inv) == pytest.approx(0.0, abs=1e-5)
    assert not np.allclose(np.asarray(x), np.asarray(z))  # actually bent


def test_flow_identity_at_init():
    # zero-initialized conditioner outputs -> the flow IS the base
    # affine at init (training starts from the mean-field family)
    params = init_flow(jax.random.PRNGKey(1), 3, num_layers=4)
    z = jnp.asarray([0.3, -1.2, 2.0])
    x, ld = flow_forward(params, z)
    expect = params["mu"] + jnp.exp(params["log_s"]) * z
    assert np.allclose(np.asarray(x), np.asarray(expect))
    assert float(ld) == pytest.approx(float(jnp.sum(params["log_s"])))


def _conjugate():
    rng = np.random.default_rng(5)
    y = rng.normal(2.0, 1.0, 30)
    with Model() as m:
        m.rv("mu", dists.Normal, {"mu": 0.0, "sigma": 3.0})
        m.rv("y", dists.Normal, {"mu": "mu", "sigma": 1.0})
        m.obs("y_obs", "y", y)
    prec = 1.0 / 9.0 + len(y)
    post_mu, post_sd = y.sum() / prec, prec**-0.5
    # closed-form log evidence: y ~ N(0, 1 + 9 * 1 1^T) jointly
    n = len(y)
    cov = np.eye(n) + 9.0 * np.ones((n, n))
    sign, logdet = np.linalg.slogdet(cov)
    log_z = -0.5 * (n * np.log(2 * np.pi) + logdet
                    + y @ np.linalg.solve(cov, y))
    return m.ir, post_mu, post_sd, log_z


def test_flow_fit_conjugate_and_evidence():
    ir, post_mu, post_sd, log_z = _conjugate()
    fit = flow_fit(ir, num_iters=1500, seed=0)
    draws = fit.sample(4000, seed=2)["mu"][0]
    assert draws.mean() == pytest.approx(post_mu, abs=0.05)
    assert draws.std() == pytest.approx(post_sd, rel=0.15)
    # ELBO lower-bounds the evidence and a fitted flow gets close
    elbo = float(fit.elbo_history[-100:].mean())
    assert elbo < log_z + 0.1  # bound (MC noise allowance)
    assert elbo > log_z - 0.5
    assert fit.psis_diagnostic(num_draws=2000) < 0.7


def test_flow_recovers_correlation():
    d, rho = 4, 0.9
    cov = np.full((d, d), rho) + (1 - rho) * np.eye(d)
    ir = Builder.rv(Builder.new_ir(), "x", dists.MvNormal,
                    {"mu": np.zeros(d), "cov": cov})
    fit = flow_fit(ir, num_iters=2000, seed=0)
    draws = fit.sample(4000, seed=3)["x"][0]
    emp = np.cov(draws.T)
    assert np.abs(emp - cov).max() < 0.3
    # the off-diagonal mass is the point: mean-field gets ~0 there
    assert emp[0, 1] > 0.6


def _centered_funnel_ir():
    with Model() as m:
        m.rv("y", dists.Normal, {"mu": 0.0, "sigma": 3.0})
        m.det("sc", lambda y: jnp.exp(y / 2), ["y"])
        m.rv("x", dists.Normal, {"mu": np.zeros(4), "sigma": "sc"},
             shape=(4,))
    return m.ir


def test_neutra_centered_funnel():
    # ncp=False: the geometry auto-NCP exists for, handled by the flow
    # instead — NeuTra is exact MCMC, so moments must be right
    fit = flow_fit(_centered_funnel_ir(), ncp=False, num_iters=4000,
                   num_elbo_draws=32, num_layers=6, lr=3e-3, seed=1)
    trace, stats = sample_neutra(
        _centered_funnel_ir(), flow=fit, ncp=False, num_chains=4,
        num_warmup=500, num_samples=1500, seed=0, target_accept=0.9)
    y = trace["y"]
    n = y.size
    assert abs(y.mean()) < 0.4
    assert y.std() == pytest.approx(3.0, abs=0.35)
    assert rhat(y) < 1.02
    assert ess(y) > 400
    assert stats["divergences"].sum() / n < 0.01
    # x | y has sd exp(y/4) marginally -> heavy tails; check the
    # conditional-scale structure instead: corr(|x|, exp(y/2)) > 0
    x0 = trace["x"][..., 0].reshape(-1)
    sc = np.exp(y.reshape(-1) / 2)
    assert np.corrcoef(np.abs(x0), sc)[0, 1] > 0.2


def test_neutra_validation_and_d1():
    ir = _centered_funnel_ir()
    fit = flow_fit(ir, ncp=False, num_iters=10)
    with pytest.raises(ValueError, match="not both"):
        sample_neutra(ir, flow=fit, flow_kwargs={"num_iters": 5})
    # d=1 degenerates couplings to bias-only affines; still sound
    with Model() as m:
        m.rv("theta", dists.Normal, {"mu": 1.0, "sigma": 2.0})
    fit1 = flow_fit(m.ir, num_iters=2500, lr=1e-2, seed=0)
    draws = fit1.sample(3000, seed=1)["theta"][0]
    assert draws.mean() == pytest.approx(1.0, abs=0.15)
    assert draws.std() == pytest.approx(2.0, rel=0.15)
    with pytest.raises(ValueError, match="no free parameters"):
        with Model() as m0:
            pass
        flow_fit(m0.ir)

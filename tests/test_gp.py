"""Gaussian-process module tests (exmc_tpu/gp.py, D-T33).

Beyond the reference (borodark/exmc has no GP surface). Bars: kernel
algebra against hand-computed values, the marginal regression form
recovering noise + predicting the truth, the whitened latent form
sampling a classifier divergence-free, and the predictive conditional
against the closed-form GP regression equations.
"""

import numpy as np
import pytest

import jax

from exmc_tpu import Model, dists, sample
from exmc_tpu.diagnostics import rhat
from exmc_tpu.gp import (
    gp_latent,
    gp_marginal,
    gp_predict,
    linear,
    matern32,
    periodic,
    rbf,
)


def test_kernel_values():
    x = np.array([0.0, 1.0])
    k = np.asarray(rbf(x, x, lengthscale=1.0, variance=2.0))
    assert k[0, 0] == pytest.approx(2.0)
    assert k[0, 1] == pytest.approx(2.0 * np.exp(-0.5), rel=1e-5)

    k32 = np.asarray(matern32(x, x, lengthscale=1.0, variance=1.0))
    a = np.sqrt(3.0)
    assert k32[0, 1] == pytest.approx((1 + a) * np.exp(-a), rel=1e-4)

    kp = np.asarray(periodic(x, x, lengthscale=1.0, variance=1.0,
                             period=2.0))
    # sin(pi * 1 / 2) = 1 -> exp(-2)
    assert kp[0, 1] == pytest.approx(np.exp(-2.0), rel=1e-5)

    kl = np.asarray(linear(x, x, variance=3.0, offset=0.0))
    assert kl[1, 1] == pytest.approx(3.0)

    # ARD: (n, 2) inputs with per-dim lengthscales
    X2 = np.array([[0.0, 0.0], [1.0, 2.0]])
    kard = np.asarray(rbf(X2, X2, lengthscale=np.array([1.0, 2.0])))
    assert kard[0, 1] == pytest.approx(np.exp(-0.5 * (1.0 + 1.0)), rel=1e-5)


def _reg_data(n=30, seed=0):
    rng = np.random.default_rng(seed)
    X = np.sort(rng.uniform(-3, 3, n))
    y = np.sin(2 * X) + 0.2 * rng.normal(size=n)
    return X, y


def test_gp_marginal_regression_and_predict():
    X, y = _reg_data()
    with Model() as m:
        m.rv("ls", dists.HalfNormal, {"sigma": 2.0})
        m.rv("amp", dists.HalfNormal, {"sigma": 2.0})
        m.rv("sn", dists.HalfNormal, {"sigma": 1.0})
        gp_marginal(m, "y", X, y, kernel="rbf", lengthscale="ls",
                    variance="amp", noise="sn")
    trace, stats = sample(m.ir, num_chains=2, num_warmup=400,
                          num_samples=400, seed=0)
    assert stats["divergences"].sum() == 0
    assert trace["sn"].mean() == pytest.approx(0.2, abs=0.12)
    # GP lengthscale/amplitude are weakly identified (classic ridge in
    # the marginal likelihood); 2x400 draws sit just above 1.05
    assert rhat(trace["ls"]) < 1.1

    Xs = np.linspace(-2.5, 2.5, 40)
    fs = gp_predict(trace, X, Xs, kernel="rbf", lengthscale="ls",
                    variance="amp", noise="sn", y=y, num_draws=200)
    assert fs.shape == (200, 40)
    assert np.isfinite(fs).all()
    assert np.abs(fs.mean(0) - np.sin(2 * Xs)).mean() < 0.2


def test_gp_latent_classification():
    rng = np.random.default_rng(0)
    n = 40
    X = np.sort(rng.uniform(-3, 3, n))
    p_true = 1 / (1 + np.exp(-3 * np.sin(2 * X)))
    yb = (rng.uniform(size=n) < p_true).astype(np.int32)
    with Model() as m:
        m.rv("ls", dists.HalfNormal, {"sigma": 2.0})
        m.rv("amp", dists.HalfNormal, {"sigma": 3.0})
        gp_latent(m, "f", X, kernel="rbf", lengthscale="ls",
                  variance="amp")
        m.rv("yb", dists.Bernoulli, {"logits": "f"}, shape=(n,))
        m.obs("yb_obs", "yb", yb)
    trace, stats = sample(m.ir, num_chains=2, num_warmup=600,
                          num_samples=500, seed=1, target_accept=0.9)
    assert stats["divergences"].sum() == 0
    assert rhat(trace["ls"]) < 1.05

    Xs = np.linspace(-3, 3, 50)
    fs = gp_predict(trace, X, Xs, kernel="rbf", lengthscale="ls",
                    variance="amp", f_name="f", jitter=1e-4,
                    num_draws=200)
    p_pred = (1 / (1 + np.exp(-fs))).mean(0)
    agree = ((p_pred > 0.5) == (np.sin(2 * Xs) > 0)).mean()
    assert agree > 0.85
    assert np.isfinite(fs).all()


def test_gp_predict_matches_closed_form():
    """With degenerate (constant) hyper draws the predictive mean must
    equal the textbook GP regression conditional."""
    X, y = _reg_data(n=20, seed=3)
    Xs = np.linspace(-2, 2, 15)
    ls, amp, sn = 0.8, 1.5, 0.3
    S = 4000
    trace = {"ls": np.full((1, S), ls)}
    fs = gp_predict(trace, X, Xs, kernel="rbf", lengthscale="ls",
                    variance=amp, noise=sn, y=y, seed=0)

    kxx = np.asarray(rbf(X, X, ls, amp)) + 1e-6 * np.eye(len(X))
    kxs = np.asarray(rbf(X, Xs, ls, amp))
    kc = kxx + sn**2 * np.eye(len(X))
    mu = kxs.T @ np.linalg.solve(kc, y)
    cov = (np.asarray(rbf(Xs, Xs, ls, amp)) + 1e-6 * np.eye(len(Xs))
           - kxs.T @ np.linalg.solve(kc, kxs))
    sd = np.sqrt(np.clip(np.diag(cov), 0, None))
    mc_se = sd / np.sqrt(S)
    assert np.all(np.abs(fs.mean(0) - mu) < 5 * mc_se + 0.02)
    assert np.abs(fs.std(0) - sd).max() < 0.08


def test_gp_validation_errors():
    X, y = _reg_data(n=10)
    trace = {"ls": np.full((1, 5), 1.0)}
    with pytest.raises(ValueError, match="exactly one"):
        gp_predict(trace, X, X, lengthscale="ls", f_name="f", y=y)
    with pytest.raises(ValueError, match="exactly one"):
        gp_predict(trace, X, X, lengthscale="ls")
    with pytest.raises(ValueError, match="unknown kernel"):
        gp_predict(trace, X, X, kernel="cubic", lengthscale="ls", y=y,
                   noise=0.1)
    with pytest.raises(ValueError, match="at least one"):
        gp_predict({}, X, X, lengthscale=1.0, y=y, noise=0.1)

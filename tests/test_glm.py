"""GLM builder tests (exmc_tpu/glm.py).

Beyond the reference (rstanarm/bambi-style surface). Bars: coefficient
recovery for all five families on synthetic data, the robust family
shrugging off outliers the normal family cannot, and the linear
predictor helper matching a hand computation.
"""

import numpy as np
import pytest

from exmc_tpu import Model, dists, sample
from exmc_tpu.glm import FAMILIES, glm, glm_linpred

BETA = np.array([1.5, -0.8])


def _design(n=200, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, 2))
    return rng, X, X @ BETA + 0.5


def _fit(family, y, X, **kw):
    with Model() as m:
        glm(m, X, y, family=family, **kw)
    return sample(m.ir, num_chains=2, num_warmup=400, num_samples=400,
                  seed=0)


def test_glm_normal():
    rng, X, eta = _design()
    y = eta + 0.4 * rng.normal(size=len(eta))
    trace, stats = _fit("normal", y, X)
    assert stats["divergences"].sum() == 0
    np.testing.assert_allclose(
        trace["beta"].reshape(-1, 2).mean(axis=0), BETA, atol=0.12)
    assert trace["beta_0"].mean() == pytest.approx(0.5, abs=0.12)
    assert trace["y_sigma"].mean() == pytest.approx(0.4, abs=0.08)


def test_glm_robust_vs_outliers():
    rng, X, eta = _design()
    y = eta + 0.4 * rng.normal(size=len(eta))
    y[:8] += 25.0  # gross outliers
    trace_r, _ = _fit("robust", y, X)
    beta_r = trace_r["beta"].reshape(-1, 2).mean(axis=0)
    np.testing.assert_allclose(beta_r, BETA, atol=0.15)
    # the normal fit absorbs the outliers into inflated noise and a
    # shifted intercept; robust keeps the residual scale honest
    trace_n, _ = _fit("normal", y, X)
    assert trace_r["y_sigma"].mean() < trace_n["y_sigma"].mean() / 2


def test_glm_logistic():
    rng, X, eta = _design(n=400)
    y = (rng.uniform(size=len(eta)) < 1 / (1 + np.exp(-eta))).astype(float)
    trace, stats = _fit("logistic", y, X)
    assert stats["divergences"].sum() == 0
    np.testing.assert_allclose(
        trace["beta"].reshape(-1, 2).mean(axis=0), BETA, atol=0.45)


def test_glm_poisson_and_negbin():
    rng, X, _ = _design(n=300, seed=1)
    eta = X @ np.array([0.6, -0.3]) + 1.0
    y = rng.poisson(np.exp(eta)).astype(float)
    trace, stats = _fit("poisson", y, X)
    assert stats["divergences"].sum() == 0
    np.testing.assert_allclose(
        trace["beta"].reshape(-1, 2).mean(axis=0), [0.6, -0.3], atol=0.12)

    # overdispersed counts: gamma-Poisson with alpha=2
    lam = np.exp(eta) * rng.gamma(2.0, 1 / 2.0, size=len(eta))
    y2 = rng.poisson(lam).astype(float)
    trace2, _ = _fit("negbin", y2, X)
    np.testing.assert_allclose(
        trace2["beta"].reshape(-1, 2).mean(axis=0), [0.6, -0.3], atol=0.2)
    assert trace2["y_alpha"].mean() == pytest.approx(2.0, abs=1.2)


def test_glm_linpred_and_validation():
    rng, X, eta = _design(n=80)
    y = eta + 0.4 * rng.normal(size=len(eta))
    trace, _ = _fit("normal", y, X)
    Xs = rng.normal(size=(10, 2))
    lp = glm_linpred(trace, Xs)
    assert lp.shape == (800, 10)
    expect = Xs @ trace["beta"].reshape(-1, 2).mean(axis=0) \
        + trace["beta_0"].mean()
    np.testing.assert_allclose(lp.mean(axis=0), expect, atol=1e-3)

    with Model() as m:
        with pytest.raises(ValueError, match="unknown family"):
            glm(m, X, y, family="gamma")
        with pytest.raises(ValueError, match="rows"):
            glm(m, X, y[:-1])
    assert set(FAMILIES) == {"normal", "robust", "logistic", "poisson",
                             "negbin"}


def test_glm_constant_y_falls_back_to_unit_scales():
    """Constant y must give weak unit-ish prior scales, not 1e-8
    spikes that pin the intercept and noise (review fix)."""
    X = np.random.default_rng(0).normal(size=(20, 2))
    y = np.full(20, 3.0)
    with Model() as m:
        glm(m, X, y)
    assert m.ir.nodes["beta_0"].op[2]["sigma"] == pytest.approx(2.5)
    assert m.ir.nodes["y_sigma"].op[2]["sigma"] == pytest.approx(2.5)
    assert m.ir.nodes["beta_0"].op[2]["mu"] == pytest.approx(3.0)

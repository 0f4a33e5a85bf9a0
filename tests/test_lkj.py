"""LKJ correlation-matrix support (cholesky_corr transform +
LKJCholesky dist) — beyond the reference (no correlation-matrix
machinery there). Exact targets: Lewandowski et al. 2009 marginals."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from exmc_tpu import Builder, dists, sample
from exmc_tpu.transforms import CHOLESKY_CORR as T


def test_transform_roundtrip_and_unit_rows():
    rng = np.random.default_rng(0)
    for d in (2, 3, 5):
        m = d * (d - 1) // 2
        z = rng.normal(size=m).astype(np.float32)
        L = np.asarray(T.forward(jnp.asarray(z)))
        assert L.shape == (d, d)
        assert np.allclose(np.triu(L, 1), 0.0)
        assert np.allclose((L**2).sum(axis=-1), 1.0, atol=1e-5)
        assert np.all(np.diag(L) > 0)
        z2 = np.asarray(T.inverse(jnp.asarray(L)))
        assert np.allclose(z, z2, atol=1e-4)


def test_transform_ladj_matches_autodiff():
    rng = np.random.default_rng(1)
    d = 4
    z = jnp.asarray(rng.normal(size=d * (d - 1) // 2).astype(np.float32))
    tril = np.tril_indices(d, -1)
    J = jax.jacfwd(lambda zz: T.forward(zz)[tril])(z)
    _, ld = np.linalg.slogdet(np.asarray(J))
    assert abs(ld - float(T.log_abs_det_jacobian(z))) < 1e-4


def test_transform_shape_validation():
    with pytest.raises(ValueError, match="requires a"):
        T.unconstrained_shape((3,))
    with pytest.raises(ValueError, match="invalid cholesky_corr"):
        T._dim(4)


def test_lkj_sampler_marginal_moments():
    """Prior sample() marginals: r_1j ~ 2*Beta(b,b)-1 with
    b = eta - 1 + d/2 -> sd = 1/sqrt(2*eta + d - 1)."""
    eta, d = 2.0, 3
    key = jax.random.PRNGKey(0)
    L = np.asarray(dists.LKJCholesky.sample(
        key, {"eta": eta}, (4000, d, d)))
    R = np.einsum("nij,nkj->nik", L, L)
    sd = 1.0 / np.sqrt(2 * eta + d - 1)
    for (i, j) in [(1, 0), (2, 0), (2, 1)]:
        r = R[:, i, j]
        assert abs(r.mean()) < 0.03
        assert abs(r.std() - sd) < 0.03


def test_lkj_nuts_prior_matches_exact_marginal():
    """Short NUTS run on the LKJ(2) d=3 prior recovers the exact
    Beta marginal moments of every correlation."""
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "L", dists.LKJCholesky, {"eta": 2.0}, shape=(3, 3))
    trace, stats = sample(ir, num_warmup=400, num_samples=600,
                          num_chains=4, seed=0)
    L = np.asarray(trace["L"]).reshape(-1, 3, 3)
    # rows stay unit-norm through the whole pipeline
    assert np.allclose((L**2).sum(axis=-1), 1.0, atol=1e-4)
    R = np.einsum("nij,nkj->nik", L, L)
    sd = 1.0 / np.sqrt(2 * 2.0 + 3 - 1)
    for (i, j) in [(1, 0), (2, 0), (2, 1)]:
        assert abs(R[:, i, j].mean()) < 0.05
        assert abs(R[:, i, j].std() - sd) < 0.04
    assert stats["divergences"].sum() == 0


def test_lkj_mvnormal_covariance_model():
    """The workflow LKJ exists for: sigma ~ HalfNormal scales + LKJ
    correlation -> MvNormal likelihood recovers a known correlation."""
    rng = np.random.default_rng(3)
    n, d = 400, 2
    r_true = 0.6
    cov = np.array([[1.0, r_true], [r_true, 1.0]])
    ys = rng.multivariate_normal(np.zeros(d), cov, size=n)

    ir = Builder.new_ir()
    ir = Builder.rv(ir, "L", dists.LKJCholesky, {"eta": 1.0}, shape=(d, d))
    ir = Builder.det(ir, "cov", lambda L: L @ L.T, ["L"])
    ir = Builder.rv(ir, "y", dists.MvNormal,
                    {"mu": np.zeros(d), "cov": "cov"})
    ir = Builder.obs(ir, "y_obs", "y", ys)
    trace, stats = sample(ir, num_warmup=400, num_samples=600,
                          num_chains=4, seed=0)
    L = np.asarray(trace["L"]).reshape(-1, d, d)
    r = (L[:, 1, :] * L[:, 0, :]).sum(axis=-1)
    assert abs(r.mean() - r_true) < 0.08
    assert stats["divergences"].sum() < 50


def test_lkj_rejects_sampled_eta():
    """The LKJ logpdf drops the eta-dependent normalizing constant, so
    a sampled eta would yield a silently wrong posterior — rejected at
    compile time (code-review r3)."""
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "eta", dists.Gamma, {"alpha": 2.0, "beta": 2.0})
    ir = Builder.rv(ir, "L", dists.LKJCholesky, {"eta": "eta"},
                    shape=(3, 3))
    with pytest.raises(Exception, match="fixed constant"):
        sample(ir, num_warmup=10, num_samples=10, seed=0)

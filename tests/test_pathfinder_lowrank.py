"""Low-rank Pathfinder (paper-faithful covariance) vs the diag method."""

import numpy as np
import jax
import jax.numpy as jnp

from exmc_tpu import Builder, dists, pathfinder_fit
from exmc_tpu.pathfinder_lowrank import lowrank_factors, sample_and_logq


def test_factorization_matches_dense():
    """Compact BFGS inverse-Hessian factorization == dense construction."""
    rng = np.random.default_rng(0)
    d, m = 6, 3
    h = np.diag(rng.uniform(0.5, 3.0, d))
    a = rng.normal(size=(d, d)) * 0.1
    h = h + a @ a.T * 0.3
    xs = [rng.normal(size=d)]
    for _ in range(m):
        xs.append(xs[-1] - 0.1 * (h @ xs[-1]) - 0.03 * rng.normal(size=d))
    s_pairs = np.diff(np.array(xs), axis=0)
    y_pairs = np.array([h @ s for s in s_pairs])
    alpha = np.full(
        d, float((s_pairs[-1] @ y_pairs[-1]) / (y_pairs[-1] @ y_pairs[-1]))
    )

    ad = np.diag(alpha)
    rm = np.triu(s_pairs @ y_pairs.T)
    e = np.diag(np.diag(s_pairs @ y_pairs.T))
    b = np.concatenate([ad @ y_pairs.T, s_pairs.T], axis=1)
    r_inv = np.linalg.inv(rm)
    g = np.block([
        [np.zeros((m, m)), -r_inv],
        [-r_inv.T, r_inv.T @ (e + y_pairs @ ad @ y_pairs.T) @ r_inv],
    ])
    sigma_dense = ad + b @ g @ b.T

    q, lch, logdet = lowrank_factors(
        jnp.asarray(alpha, jnp.float32), jnp.asarray(s_pairs, jnp.float32),
        jnp.asarray(y_pairs, jnp.float32), jnp.ones(m, bool),
    )
    k = np.asarray(lch).shape[0]
    mid = np.eye(d) + np.asarray(q) @ (
        np.asarray(lch) @ np.asarray(lch).T - np.eye(k)
    ) @ np.asarray(q).T
    sigma_fac = np.diag(np.sqrt(alpha)) @ mid @ np.diag(np.sqrt(alpha))
    np.testing.assert_allclose(sigma_fac, sigma_dense, atol=1e-4)
    _, ld = np.linalg.slogdet(sigma_dense)
    assert abs(float(logdet) - ld) < 1e-3

    x, logq = sample_and_logq(
        jax.random.PRNGKey(0), jnp.zeros(d, jnp.float32),
        jnp.asarray(alpha, jnp.float32), q, lch, logdet, 50,
    )
    x0 = np.asarray(x)[0].astype(np.float64)
    ref = -0.5 * (
        d * np.log(2 * np.pi) + ld + x0 @ np.linalg.inv(sigma_dense) @ x0
    )
    assert abs(float(logq[0]) - ref) < 1e-3


def test_lowrank_recovers_correlation():
    """Correlated Gaussian: lowrank captures the off-diagonal the diag
    method structurally cannot."""
    cov = np.array([[1.0, 0.8], [0.8, 1.0]], np.float32)
    ir = Builder.rv(
        Builder.new_ir(), "x", dists.MvNormal,
        {"mu": np.array([1.0, -0.5]), "cov": cov},
    )
    out = pathfinder_fit(ir, num_iters=150, num_draws=10000, seed=0,
                         method="lowrank")
    x = out["draws_unconstrained"][0]
    np.testing.assert_allclose(x.mean(axis=0), [1.0, -0.5], atol=0.15)
    emp = np.cov(x.T)
    assert abs(emp[0, 1] - 0.8) < 0.2
    out_d = pathfinder_fit(ir, num_iters=150, num_draws=10000, seed=0,
                           method="diag")
    xd = out_d["draws_unconstrained"][0]
    assert abs(np.cov(xd.T)[0, 1]) < 0.2  # diag: no correlation


def test_lowrank_conjugate_sd_exact():
    rng = np.random.default_rng(0)
    ys = rng.normal(1.5, 1.0, 40)
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "mu", dists.Normal, {"mu": 0.0, "sigma": 10.0})
    ir = Builder.rv(ir, "y", dists.Normal, {"mu": "mu", "sigma": 1.0})
    ir = Builder.obs(ir, "y_obs", "y", ys)
    out = pathfinder_fit(ir, num_iters=150, num_draws=5000, seed=0,
                         method="lowrank")
    pm = (1 / (0.01 + 40)) * ys.sum()
    psd = (1 / (0.01 + 40)) ** 0.5
    assert abs(float(out["draws"]["mu"].mean()) - pm) < 0.05
    assert abs(float(out["draws"]["mu"].std()) - psd) < 0.03

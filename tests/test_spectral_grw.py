"""Spectral GRW parameterization (compiler._grw_spectral_basis):
exactness of the rotation and the conditioning win it exists for."""

import numpy as np
import pytest

import jax.numpy as jnp

from exmc_tpu import Builder, compile_logp, dists, sample
from exmc_tpu.compiler import _grw_spectral_basis
from exmc_tpu.diagnostics import rhat


def grw_model(t, obs_sigma=0.5, seed=3):
    rng = np.random.default_rng(seed)
    x = np.cumsum(rng.normal(0, 0.3, t))
    y = (x + rng.normal(0, obs_sigma, t)).astype(np.float32)
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "sigma", dists.HalfNormal, {"sigma": 1.0})
    ir = Builder.rv(ir, "x", dists.GaussianRandomWalk, {"sigma": "sigma"},
                    shape=(t,))
    ir = Builder.rv(ir, "y", dists.Normal, {"mu": "x", "sigma": obs_sigma},
                    shape=(t,))
    ir = Builder.obs(ir, "y_obs", "y", y)
    return ir


def test_basis_orthonormal_and_diagonalizing():
    t = 96
    v = np.asarray(_grw_spectral_basis(t), np.float64)
    assert np.abs(v.T @ v - np.eye(t)).max() < 1e-5  # f32 entries
    c = np.tril(np.ones((t, t)))
    d = v.T @ (c.T @ c) @ v
    off = d - np.diag(np.diag(d))
    assert np.abs(off).max() < 1e-2 * np.diag(d).max()


def test_logp_and_roundtrip_match_plain_parameterization(monkeypatch):
    t = 80
    ir = grw_model(t)
    m_spec = compile_logp(ir, ncp=True)
    assert m_spec.ncp_info["x"]["spectral"]

    import exmc_tpu.rewrite.ncp as ncpmod

    monkeypatch.setattr(ncpmod, "SPECTRAL_MIN_T", 10**9)
    m_plain = compile_logp(ir, ncp=True)
    assert not m_plain.ncp_info["x"]["spectral"]

    rng = np.random.default_rng(0)
    point = {"sigma": 0.4,
             "x": np.cumsum(rng.normal(0, 0.4, t)).astype(np.float32)}
    f_s, f_p = m_spec.unconstrain(point), m_plain.unconstrain(point)
    # same constrained point, same log density (rotation-invariant prior)
    lp_s = float(m_spec.logp(jnp.asarray(f_s)))
    lp_p = float(m_plain.logp(jnp.asarray(f_p)))
    assert abs(lp_s - lp_p) < 1e-3
    # round trip through the rotation
    back = m_spec.constrain(f_s)
    np.testing.assert_allclose(back["x"], point["x"], atol=1e-4)


def test_posterior_matches_plain_and_conditions_better(monkeypatch):
    t = 256
    ir = grw_model(t)
    kw = dict(num_chains=4, num_warmup=400, num_samples=400, seed=0)
    tr_s, st_s = sample(ir, **kw)

    import exmc_tpu.rewrite.ncp as ncpmod
    from exmc_tpu.nuts.sampler import clear_sampler_cache

    monkeypatch.setattr(ncpmod, "SPECTRAL_MIN_T", 10**9)
    clear_sampler_cache()
    tr_p, st_p = sample(ir, **kw)

    # identical posterior (distribution level)
    np.testing.assert_allclose(tr_s["sigma"].mean(), tr_p["sigma"].mean(),
                               atol=0.05)
    pa = tr_s["x"].reshape(-1, t).mean(axis=0)
    pb = tr_p["x"].reshape(-1, t).mean(axis=0)
    assert float(np.max(np.abs(pa - pb))) < 0.3
    assert float(rhat(tr_s["sigma"])) < 1.05

    # the point of the rotation: much larger stable step size
    eps_s = float(np.median(st_s["step_size"]))
    eps_p = float(np.median(st_p["step_size"]))
    assert eps_s > 3.0 * eps_p, (eps_s, eps_p)

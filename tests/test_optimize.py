"""MAP + Laplace approximation (optimize.py) against closed forms."""

import numpy as np
import pytest

from exmc_tpu import Builder, dists, fit_map, laplace


def _conjugate_normal_ir():
    """mu ~ N(0, 2); y_i ~ N(mu, 1), known analytic posterior."""
    ys = np.array([1.2, 0.8, 1.5, 1.1, 0.9, 1.3], dtype=np.float32)
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "mu", dists.Normal, {"mu": 0.0, "sigma": 2.0})
    ir = Builder.rv(ir, "y", dists.Normal, {"mu": "mu", "sigma": 1.0})
    ir = Builder.obs(ir, "y_obs", "y", ys)
    n, ybar = len(ys), float(ys.mean())
    prec = 1 / 4.0 + n
    post_mean = n * ybar / prec
    post_sd = prec ** -0.5
    return ir, post_mean, post_sd


def test_map_conjugate_normal():
    ir, post_mean, _ = _conjugate_normal_ir()
    point, info = fit_map(ir, seed=0)
    assert info["converged"], info
    assert abs(float(point["mu"]) - post_mean) < 1e-3
    assert info["iters"] < 200


def test_map_jacobian_flag_lognormal_mode():
    """sigma ~ LogNormal(0,1), no data: the constrained-space mode is
    exp(-1) (Stan optimize jacobian=false); the unconstrained-space mode
    maps to sigma=1 (z = log sigma is standard normal)."""
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "sigma", dists.LogNormal, {"mu": 0.0, "sigma": 1.0})

    point_t, info_t = fit_map(ir, seed=0, jacobian=True)
    assert info_t["converged"]
    assert abs(float(point_t["sigma"]) - 1.0) < 1e-3

    point_f, info_f = fit_map(ir, seed=0, jacobian=False)
    assert info_f["converged"]
    assert abs(float(point_f["sigma"]) - np.exp(-1.0)) < 1e-3


def test_laplace_matches_conjugate_posterior():
    ir, post_mean, post_sd = _conjugate_normal_ir()
    trace, info = laplace(ir, draws=4000, seed=0)
    mu = trace["mu"]
    assert mu.shape == (1, 4000)
    assert abs(float(mu.mean()) - post_mean) < 0.02
    assert abs(float(mu.std()) - post_sd) < 0.02
    assert info["converged"]


def test_laplace_constrained_param():
    """Positive-support param: draws come back on the constrained side
    and the mode matches the quadrature-free analytic check."""
    ys = np.array([0.9, 1.4, 1.1, 0.7, 1.2, 1.0, 0.8, 1.3], np.float32)
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "sigma", dists.HalfNormal, {"sigma": 2.0})
    ir = Builder.rv(ir, "y", dists.Normal, {"mu": 0.0, "sigma": "sigma"})
    ir = Builder.obs(ir, "y_obs", "y", ys)
    trace, info = laplace(ir, draws=2000, seed=3)
    sig = trace["sigma"]
    assert (np.asarray(sig) > 0).all()
    # posterior concentrates near sqrt(mean(y^2)) for weak prior
    assert abs(float(np.median(sig)) - float(np.sqrt((ys ** 2).mean()))) < 0.25


def test_map_with_init_and_empty_model():
    ir, post_mean, _ = _conjugate_normal_ir()
    point, info = fit_map(ir, init={"mu": 5.0})
    assert abs(float(point["mu"]) - post_mean) < 1e-3

    ir2 = Builder.new_ir()
    ir2 = Builder.rv(ir2, "y", dists.Normal, {"mu": 0.0, "sigma": 1.0})
    ir2 = Builder.obs(ir2, "y_obs", "y", 0.3)
    point, info = fit_map(ir2)
    assert point == {} and info["converged"]


def test_laplace_seed_none():
    """fit_map documents seed=None (zeros init); laplace must accept it
    too (review fix: PRNGKey(None + 1) crashed)."""
    ir, post_mean, post_sd = _conjugate_normal_ir()
    trace, info = laplace(ir, seed=None, draws=400)
    assert info["converged"]
    assert abs(trace["mu"].mean() - post_mean) < 0.1
    assert abs(trace["mu"].std() - post_sd) < 0.1

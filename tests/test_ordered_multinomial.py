"""Ordered / positive_ordered transforms, Multinomial likelihood, and
the Stan types that expose them (round-3 additions beyond the
reference's transform/dist surface)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from exmc_tpu import Builder, dists, sample, stan
from exmc_tpu.transforms import ORDERED, POSITIVE_ORDERED


@pytest.mark.parametrize("t", [ORDERED, POSITIVE_ORDERED])
def test_ordered_roundtrip_and_ladj(t):
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.normal(size=5).astype(np.float32))
    x = np.asarray(t.forward(z))
    assert np.all(np.diff(x) > 0)
    if t is POSITIVE_ORDERED:
        assert np.all(x > 0)
    assert np.allclose(np.asarray(t.inverse(jnp.asarray(x))), z, atol=1e-5)
    J = jax.jacfwd(t.forward)(z)
    _, ld = np.linalg.slogdet(np.asarray(J))
    assert abs(ld - float(t.log_abs_det_jacobian(z))) < 1e-4


def test_multinomial_logpdf_matches_formula():
    from math import factorial, log
    y = np.array([3.0, 2.0, 1.0])
    p = np.array([0.5, 0.3, 0.2])
    want = (log(factorial(6) / (factorial(3) * factorial(2)))
            + 3 * log(0.5) + 2 * log(0.3) + 1 * log(0.2))
    got = float(dists.Multinomial.logpdf(y, {"p": p}))
    assert abs(got - want) < 1e-4


def test_multinomial_sampler_moments():
    key = jax.random.PRNGKey(0)
    p = np.array([0.5, 0.3, 0.2])
    y = np.asarray(dists.Multinomial.sample(key, {"n": 50, "p": p}, (2000, 3)))
    assert y.shape == (2000, 3)
    assert np.allclose(y.sum(-1), 50)
    assert np.allclose(y.mean(0) / 50, p, atol=0.02)


def test_ordered_normal_is_order_statistics():
    """ordered transform + iid Normal prior = order statistics of 3
    standard normals: E[x_(1)] = -3/(2 sqrt(pi))."""
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "x", dists.Normal, {"mu": 0.0, "sigma": 1.0},
                    transform="ordered", shape=(3,))
    trace, _ = sample(ir, num_warmup=300, num_samples=600, num_chains=4,
                      seed=0)
    x = np.asarray(trace["x"]).reshape(-1, 3)
    assert np.all(np.diff(x, axis=-1) > 0)
    assert abs(x.mean(0)[0] + 3 / (2 * np.sqrt(np.pi))) < 0.06
    assert abs(x.mean(0)[1]) < 0.05


def test_stan_ordered_and_lkj_types():
    t1, _ = stan.sample("""
    parameters { ordered[3] x; }
    model { x ~ normal(0, 1); }
    """, {}, num_warmup=300, num_samples=500, num_chains=2, seed=0)
    x = t1["x"].reshape(-1, 3)
    assert np.all(np.diff(x, axis=-1) > 0)

    t2, _ = stan.sample("""
    parameters { cholesky_factor_corr[2] L; }
    model { L ~ lkj_corr_cholesky(1); }
    """, {}, num_warmup=300, num_samples=600, num_chains=4, seed=0)
    L = t2["L"].reshape(-1, 2, 2)
    r = (L[:, 1, :] * L[:, 0, :]).sum(-1)
    # LKJ(1) d=2: r uniform on (-1,1) -> sd 1/sqrt(3)
    assert abs(r.mean()) < 0.06
    assert abs(r.std() - 1 / np.sqrt(3)) < 0.04


def test_stan_multinomial_conjugate():
    counts = np.array([150.0, 90.0, 60.0])
    trace, _ = stan.sample("""
    data { vector[3] y; vector[3] alpha; }
    parameters { simplex[3] w; }
    model { w ~ dirichlet(alpha); y ~ multinomial(w); }
    """, {"y": counts, "alpha": np.full(3, 3.0)},
        num_warmup=300, num_samples=600, num_chains=2, seed=0)
    a = 3 + counts
    assert np.allclose(trace["w"].reshape(-1, 3).mean(0), a / a.sum(),
                       atol=0.015)


def test_stan_positive_ordered():
    trace, _ = stan.sample("""
    parameters { positive_ordered[2] s; }
    model { s ~ exponential(1); }
    """, {}, num_warmup=300, num_samples=500, num_chains=2, seed=0)
    s = trace["s"].reshape(-1, 2)
    assert np.all(s > 0) and np.all(s[:, 1] > s[:, 0])
    # exp(1) order stats of n=2: E = 1/2, 3/2
    assert abs(s.mean(0)[0] - 0.5) < 0.08
    assert abs(s.mean(0)[1] - 1.5) < 0.15


def test_zero_sum_normal():
    """ZeroSumNormal: draws sum to zero exactly, marginal sd matches
    sigma*sqrt(1-1/K), and the isometric transform round-trips."""
    from exmc_tpu.transforms import ZERO_SUM

    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.normal(size=5).astype(np.float32))
    x = np.asarray(ZERO_SUM.forward(z))
    assert abs(x.sum()) < 1e-5
    assert np.allclose(np.asarray(ZERO_SUM.inverse(jnp.asarray(x))), z,
                       atol=1e-5)
    # isometry: |x| == |z|
    assert abs(np.linalg.norm(x) - np.linalg.norm(np.asarray(z))) < 1e-5

    key = jax.random.PRNGKey(0)
    y = np.asarray(dists.ZeroSumNormal.sample(
        key, {"sigma": 2.0}, (4000, 4)))
    assert np.allclose(y.sum(-1), 0.0, atol=1e-4)
    assert np.allclose(y.std(0), 2.0 * np.sqrt(0.75), atol=0.08)

    ir = Builder.new_ir()
    ir = Builder.rv(ir, "x", dists.ZeroSumNormal, {"sigma": 2.0},
                    shape=(4,))
    trace, _ = sample(ir, num_warmup=300, num_samples=500, num_chains=4,
                      seed=0)
    xs = np.asarray(trace["x"]).reshape(-1, 4)
    assert np.allclose(xs.sum(-1), 0.0, atol=1e-4)
    assert np.allclose(xs.std(0), 2.0 * np.sqrt(0.75), atol=0.1)


def test_stan_sum_to_zero_vector():
    trace, _ = stan.sample("""
    parameters { sum_to_zero_vector[4] x; }
    model { x ~ normal(0, 2); }
    """, {}, num_warmup=300, num_samples=500, num_chains=2, seed=0)
    x = trace["x"].reshape(-1, 4)
    assert np.abs(x.sum(-1)).max() < 1e-3
    assert np.allclose(x.std(0), 2.0 * np.sqrt(0.75), atol=0.12)


def test_stan_categorical_one_indexed():
    """Stan categorical data is 1-indexed; the frontend shifts to the
    0-indexed Categorical dist (code-review r3 finding)."""
    rng = np.random.default_rng(0)
    ys = rng.choice([1.0, 2.0, 3.0], size=200, p=[0.5, 0.3, 0.2])
    trace, _ = stan.sample("""
    data { vector[200] y; vector[3] alpha; }
    parameters { simplex[3] w; }
    model { w ~ dirichlet(alpha); y ~ categorical(w); }
    """, {"y": ys, "alpha": np.full(3, 2.0)},
        num_warmup=300, num_samples=500, num_chains=2, seed=0)
    counts = np.bincount(ys.astype(int) - 1, minlength=3)
    a = 2 + counts
    assert np.allclose(trace["w"].reshape(-1, 3).mean(0), a / a.sum(),
                       atol=0.02)

    with pytest.raises(Exception, match="1-indexed"):
        stan.sample("""
        data { vector[3] y; vector[3] alpha; }
        parameters { simplex[3] w; }
        model { w ~ dirichlet(alpha); y ~ categorical(w); }
        """, {"y": np.array([0.0, 1.0, 2.0]), "alpha": np.full(3, 2.0)},
            num_warmup=10, num_samples=10)


def test_stan_rejects_bounds_on_constrained_types():
    with pytest.raises(Exception, match="bounds are not supported"):
        stan.sample("""
        parameters { ordered<lower=0, upper=1>[3] c; }
        model { c ~ normal(0, 1); }
        """, {}, num_warmup=10, num_samples=10)


def test_nested_rhat_rejects_single_superchain():
    from exmc_tpu import diagnostics as diag
    with pytest.raises(ValueError, match="2 superchains"):
        diag.nested_rhat(np.zeros((8, 5)), num_superchains=1)

"""Golden logpdf tests vs torch.distributions (independent oracle),
mirroring the reference's numeric-first test strategy (SURVEY.md §4:
dist_test.exs / new_dist_test.exs compare against explicit expressions).
"""

import math

import numpy as np
import pytest
import torch
import torch.distributions as td

import jax
import jax.numpy as jnp

from exmc_tpu import dists
from exmc_tpu import transforms as tf

ATOL = 2e-4  # f32 compute vs torch f64 reference


def t64(x):
    return torch.tensor(np.asarray(x), dtype=torch.float64)


def check(dist, params, torch_dist, xs):
    ours = np.asarray(dist.logpdf(jnp.asarray(xs, jnp.float32), params))
    theirs = torch_dist.log_prob(t64(xs)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=ATOL, rtol=1e-4)


XS_REAL = np.array([-2.3, -0.5, 0.0, 0.7, 1.9, 4.2])
XS_POS = np.array([0.05, 0.3, 1.0, 2.5, 7.0])
XS_UNIT = np.array([0.05, 0.3, 0.5, 0.77, 0.95])


def test_normal():
    check(dists.Normal, {"mu": 0.5, "sigma": 1.7}, td.Normal(0.5, 1.7), XS_REAL)


def test_half_normal():
    check(dists.HalfNormal, {"sigma": 1.3}, td.HalfNormal(1.3), XS_POS)


def test_exponential():
    check(dists.Exponential, {"lambda": 2.2}, td.Exponential(2.2), XS_POS)


def test_gamma():
    check(dists.Gamma, {"alpha": 2.5, "beta": 1.4}, td.Gamma(2.5, 1.4), XS_POS)


def test_beta():
    check(dists.Beta, {"alpha": 2.0, "beta": 3.5}, td.Beta(2.0, 3.5), XS_UNIT)


def test_uniform01():
    assert np.allclose(np.asarray(dists.Uniform01.logpdf(jnp.asarray(XS_UNIT), {})), 0.0)


def test_student_t():
    check(
        dists.StudentT,
        {"df": 4.0, "loc": 0.3, "scale": 1.2},
        td.StudentT(4.0, 0.3, 1.2),
        XS_REAL,
    )


def test_cauchy():
    check(dists.Cauchy, {"loc": 0.1, "scale": 2.0}, td.Cauchy(0.1, 2.0), XS_REAL)


def test_half_cauchy():
    check(dists.HalfCauchy, {"scale": 1.5}, td.HalfCauchy(1.5), XS_POS)


def test_lognormal():
    check(dists.LogNormal, {"mu": 0.2, "sigma": 0.9}, td.LogNormal(0.2, 0.9), XS_POS)


def test_laplace():
    check(dists.Laplace, {"mu": -0.3, "b": 1.1}, td.Laplace(-0.3, 1.1), XS_REAL)


def test_weibull():
    # torch Weibull(scale, concentration): scale=lambda, concentration=k
    check(
        dists.Weibull, {"k": 1.7, "lambda": 2.3}, td.Weibull(2.3, 1.7), XS_POS
    )


def test_weibull_log_survival():
    t = jnp.asarray(XS_POS)
    params = {"k": jnp.asarray(1.7), "lambda": jnp.asarray(2.3)}
    ls = np.asarray(dists.Weibull.log_survival(t, params))
    expected = -((XS_POS / 2.3) ** 1.7)
    np.testing.assert_allclose(ls, expected, atol=1e-5, rtol=1e-5)


def test_truncated_normal():
    params = {"mu": 0.0, "sigma": 1.0, "lower": -1.0, "upper": 1.0}
    # analytic: log[ phi(0) / (Phi(1) - Phi(-1)) ] = -0.53727
    # (the reference doctest claims -0.2676, truncated_normal.ex:10-12,
    # which is not the truncated-normal density at 0 — ours is correct)
    got = float(dists.TruncatedNormal.logpdf(jnp.asarray(0.0), params))
    expected = math.log(
        math.exp(-0.5 * math.log(2 * math.pi))
        / (td.Normal(0.0, 1.0).cdf(torch.tensor(1.0)).item() * 2 - 1.0)
    )
    assert abs(got - expected) < 1e-4


def test_bernoulli():
    ys = np.array([0.0, 1.0, 1.0, 0.0])
    check(dists.Bernoulli, {"p": 0.7}, td.Bernoulli(0.7), ys)


def test_poisson():
    ys = np.array([0.0, 1.0, 3.0, 7.0])
    check(dists.Poisson, {"mu": 2.5}, td.Poisson(2.5), ys)


def test_mv_normal():
    mu = np.array([0.5, -0.3, 1.0])
    a = np.array([[2.0, 0.3, 0.1], [0.3, 1.5, 0.2], [0.1, 0.2, 1.0]])
    x = np.array([0.1, 0.2, -0.5])
    ours = float(
        dists.MvNormal.logpdf(jnp.asarray(x, jnp.float32), {"mu": mu, "cov": a})
    )
    theirs = float(td.MultivariateNormal(t64(mu), t64(a)).log_prob(t64(x)))
    assert abs(ours - theirs) < 1e-4


def test_mv_normal_prepare_params():
    mu = np.zeros(2)
    cov = np.array([[1.0, 0.0], [0.0, 1.0]])
    prepared = dists.MvNormal.prepare_params({"mu": mu, "cov": cov})
    assert "chol" in prepared and "log_det_cov" in prepared
    # reference doctest value (mv_normal.ex:14-16): logpdf(0; I) = -1.8379
    got = float(dists.MvNormal.logpdf(jnp.zeros(2), prepared))
    assert abs(got - (-1.8379)) < 1e-3


def test_dirichlet():
    alpha = np.array([2.0, 3.0, 1.5])
    x = np.array([0.3, 0.5, 0.2])
    ours = float(dists.Dirichlet.logpdf(jnp.asarray(x, jnp.float32), {"alpha": alpha}))
    theirs = float(td.Dirichlet(t64(alpha)).log_prob(t64(x)))
    assert abs(ours - theirs) < 5e-4


def test_gaussian_random_walk():
    x = np.array([0.1, 0.2, 0.15, -0.3])
    sigma = 0.7
    ours = float(
        dists.GaussianRandomWalk.logpdf(jnp.asarray(x, jnp.float32), {"sigma": sigma})
    )
    # x[0] ~ N(0, sigma); diffs ~ N(0, sigma)
    diffs = np.concatenate([[x[0]], np.diff(x)])
    theirs = td.Normal(0.0, sigma).log_prob(t64(diffs)).sum().item()
    assert abs(ours - theirs) < 1e-4


def test_mixture():
    params = {
        "components": [dists.Normal, dists.Normal],
        "params": [{"mu": -2.0, "sigma": 1.0}, {"mu": 2.0, "sigma": 0.5}],
        "weights": np.array([0.3, 0.7]),
    }
    x = np.array([0.0, -2.0, 2.0])
    ours = np.asarray(dists.Mixture.logpdf(jnp.asarray(x, jnp.float32), params))
    mix = td.MixtureSameFamily(
        td.Categorical(t64([0.3, 0.7])),
        td.Normal(t64([-2.0, 2.0]), t64([1.0, 0.5])),
    )
    np.testing.assert_allclose(ours, mix.log_prob(t64(x)).numpy(), atol=1e-4)


def test_censored_normal():
    mu, sigma = 0.5, 1.2
    c = 1.0
    z = (c - mu) / sigma
    right = float(
        dists.Censored.log_likelihood("right", jnp.asarray(c), dists.Normal,
                                      {"mu": mu, "sigma": sigma})
    )
    expected = torch.log(1 - td.Normal(0.0, 1.0).cdf(torch.tensor(z))).item()
    assert abs(right - expected) < 1e-5
    left = float(
        dists.Censored.log_likelihood("left", jnp.asarray(c), dists.Normal,
                                      {"mu": mu, "sigma": sigma})
    )
    expected_l = torch.log(td.Normal(0.0, 1.0).cdf(torch.tensor(z))).item()
    assert abs(left - expected_l) < 1e-5


def test_censored_weibull_right():
    params = {"k": jnp.asarray(1.5), "lambda": jnp.asarray(2.0)}
    got = float(
        dists.Censored.log_likelihood("right", jnp.asarray(3.0), dists.Weibull, params)
    )
    assert abs(got - (-((3.0 / 2.0) ** 1.5))) < 1e-5


def test_censored_interval():
    got = float(
        dists.Censored.log_likelihood(
            "interval",
            {"lower": jnp.asarray(-1.0), "upper": jnp.asarray(1.0)},
            dists.Normal,
            {"mu": 0.0, "sigma": 1.0},
        )
    )
    expected = math.log(
        td.Normal(0.0, 1.0).cdf(torch.tensor(1.0)).item()
        - td.Normal(0.0, 1.0).cdf(torch.tensor(-1.0)).item()
    )
    assert abs(got - expected) < 1e-4


def test_custom_dist():
    custom = dists.Custom(
        logpdf_fn=lambda x, params: -0.5 * x**2, support="real"
    )
    got = float(custom.logpdf(jnp.asarray(2.0), {}))
    assert abs(got - (-2.0)) < 1e-6


# ---- samplers are statistically sane ----

@pytest.mark.parametrize(
    "dist,params,mean,tol",
    [
        (dists.Normal, {"mu": 1.0, "sigma": 2.0}, 1.0, 0.1),
        (dists.Exponential, {"lambda": 2.0}, 0.5, 0.05),
        (dists.Gamma, {"alpha": 3.0, "beta": 2.0}, 1.5, 0.1),
        (dists.Beta, {"alpha": 2.0, "beta": 2.0}, 0.5, 0.03),
        (dists.Weibull, {"k": 1.0, "lambda": 2.0}, 2.0, 0.15),
        (dists.Poisson, {"mu": 3.0}, 3.0, 0.15),
    ],
)
def test_sampler_means(dist, params, mean, tol):
    key = jax.random.PRNGKey(0)
    draws = dist.sample(key, {k: jnp.asarray(v) for k, v in params.items()}, (4000,))
    assert abs(float(jnp.mean(draws)) - mean) < 3 * tol


# ---- transforms ----

@pytest.mark.parametrize("name", ["log", "softplus", "logit"])
def test_transform_roundtrip(name):
    t = tf.get(name)
    z = jnp.asarray(np.linspace(-3, 3, 11), jnp.float32)
    x = t.forward(z)
    z2 = t.inverse(x)
    np.testing.assert_allclose(np.asarray(z2), np.asarray(z), atol=5e-4)


@pytest.mark.parametrize("name", ["log", "softplus", "logit"])
def test_transform_ladj_matches_autodiff(name):
    t = tf.get(name)
    z = jnp.asarray([-1.3, 0.4, 2.1], jnp.float32)
    jac = jax.jacfwd(t.forward)(z)
    expected = float(jnp.sum(jnp.log(jnp.abs(jnp.diagonal(jac)))))
    got = float(t.log_abs_det_jacobian(z))
    assert abs(got - expected) < 1e-4


def test_stick_breaking_simplex():
    t = tf.get("stick_breaking")
    z = jnp.asarray([0.3, -1.2, 0.8], jnp.float32)
    x = t.forward(z)
    assert x.shape == (4,)
    assert abs(float(jnp.sum(x)) - 1.0) < 1e-4
    assert bool(jnp.all(x > 0))
    z2 = t.inverse(x)
    np.testing.assert_allclose(np.asarray(z2), np.asarray(z), atol=5e-4)


def test_stick_breaking_ladj_matches_autodiff():
    t = tf.get("stick_breaking")
    z = jnp.asarray([0.3, -1.2, 0.8], jnp.float32)
    # Jacobian of first K-1 outputs wrt z is lower-triangular; its det is
    # the product of the diagonal
    jac = jax.jacfwd(t.forward)(z)[:-1, :]
    expected = float(jnp.log(jnp.abs(jnp.linalg.det(jac))))
    got = float(t.log_abs_det_jacobian(z))
    assert abs(got - expected) < 1e-3


def test_stick_breaking_batched():
    t = tf.get("stick_breaking")
    z = jnp.asarray(np.random.default_rng(0).normal(size=(5, 3)), jnp.float32)
    x = t.forward(z)
    assert x.shape == (5, 4)
    np.testing.assert_allclose(np.asarray(jnp.sum(x, axis=-1)), 1.0, atol=1e-4)


def test_log_transform_clamped():
    t = tf.get("log")
    big = jnp.asarray(1e6, jnp.float32)
    assert np.isfinite(float(t.forward(big)))

@pytest.mark.parametrize("t", [tf.LowerBoundTransform(2.5),
                               tf.UpperBoundTransform(-1.0),
                               tf.IntervalTransform(-2.0, 3.0)])
def test_bound_transforms_roundtrip_and_ladj(t):
    z = jnp.asarray([-1.3, 0.4, 2.1], jnp.float32)
    x = t.forward(z)
    if isinstance(t, tf.LowerBoundTransform):
        assert bool(jnp.all(x > t.lower))
    elif isinstance(t, tf.UpperBoundTransform):
        assert bool(jnp.all(x < t.upper))
    np.testing.assert_allclose(np.asarray(t.inverse(x)), np.asarray(z),
                               atol=5e-4)
    jac = jax.jacfwd(t.forward)(z)
    expected = float(jnp.sum(jnp.log(jnp.abs(jnp.diagonal(jac)))))
    assert abs(float(t.log_abs_det_jacobian(z)) - expected) < 1e-4


# ---- round-3 discrete-likelihood expansion (beyond the reference) ----

def test_binomial_logpdf_matches_formula():
    from math import comb, log
    d = dists.Binomial
    for n, y, p in [(10, 3, 0.4), (20, 0, 0.05), (5, 5, 0.9)]:
        want = log(comb(n, y)) + y * log(p) + (n - y) * log(1 - p)
        got = float(d.logpdf(float(y), {"n": float(n), "p": p}))
        assert abs(got - want) < 1e-4
    # logits path agrees with p path
    import numpy as np
    eta = 0.7
    p = 1 / (1 + np.exp(-eta))
    a = float(d.logpdf(4.0, {"n": 9.0, "logits": eta}))
    b = float(d.logpdf(4.0, {"n": 9.0, "p": p}))
    assert abs(a - b) < 1e-5


def test_negative_binomial_logpdf_poisson_limit():
    """alpha -> inf recovers Poisson(mu). alpha kept at 1e3 because the
    lgamma(y+alpha)-lgamma(alpha) difference loses all resolution in
    f32 beyond that; the analytic gap at alpha=1e3 is O(y^2/alpha)."""
    d = dists.NegativeBinomial
    pois = dists.Poisson
    for y in [0.0, 2.0, 7.0]:
        nb = float(d.logpdf(y, {"mu": 3.0, "alpha": 1e3}))
        po = float(pois.logpdf(y, {"mu": 3.0}))
        assert abs(nb - po) < 0.05


def test_negative_binomial_normalizes():
    import numpy as np
    d = dists.NegativeBinomial
    ys = np.arange(0, 400, dtype=float)
    lp = np.asarray(d.logpdf(ys, {"mu": 5.0, "alpha": 2.0}))
    assert abs(np.exp(lp).sum() - 1.0) < 1e-6


def test_categorical_logpdf_and_logits():
    import numpy as np
    d = dists.Categorical
    p = np.array([0.5, 0.3, 0.2])
    for y in [0, 1, 2]:
        got = float(d.logpdf(float(y), {"p": p}))
        assert abs(got - np.log(p[y])) < 1e-5
    logits = np.log(p)
    ys = np.array([0.0, 2.0, 1.0])
    a = np.asarray(d.logpdf(ys, {"logits": logits}))
    b = np.asarray(d.logpdf(ys, {"p": p}))
    assert np.allclose(a, b, atol=1e-5)


def test_discrete_samplers_moments():
    import jax
    import numpy as np
    key = jax.random.PRNGKey(0)
    y = np.asarray(dists.Binomial.sample(key, {"n": 20.0, "p": 0.3}, (4000,)))
    assert abs(y.mean() - 6.0) < 0.15
    y = np.asarray(dists.NegativeBinomial.sample(
        key, {"mu": 4.0, "alpha": 3.0}, (4000,)))
    assert abs(y.mean() - 4.0) < 0.25
    y = np.asarray(dists.Categorical.sample(
        key, {"p": np.array([0.6, 0.3, 0.1])}, (4000,)))
    f = np.bincount(y.astype(int), minlength=3) / 4000
    assert np.allclose(f, [0.6, 0.3, 0.1], atol=0.04)


def test_inverse_gamma():
    # torch ships InverseGamma from 1.13; fall back to the
    # change-of-variables identity through td.Gamma if absent
    xs = XS_POS
    ours = np.asarray(
        dists.InverseGamma.logpdf(jnp.asarray(xs, jnp.float32),
                                  {"alpha": 3.0, "beta": 2.0}))
    if hasattr(td, "InverseGamma"):
        theirs = td.InverseGamma(t64(3.0), t64(2.0)).log_prob(t64(xs)).numpy()
    else:
        # x ~ InvGamma(a, b) <=> 1/x ~ Gamma(a, b), |d(1/x)/dx| = x^-2
        theirs = (td.Gamma(t64(3.0), t64(2.0)).log_prob(t64(1.0 / xs))
                  - 2.0 * np.log(t64(xs))).numpy()
    np.testing.assert_allclose(ours, theirs, atol=ATOL, rtol=1e-4)


def test_gumbel():
    check(dists.Gumbel, {"loc": 0.4, "scale": 1.3}, td.Gumbel(0.4, 1.3),
          XS_REAL)


def test_beta_binomial():
    # independent oracle: numerically integrate Binomial(n, p) against
    # the Beta(a, b) density on a fine grid (no shared lgamma formula)
    n, a, b = 10, 2.0, 3.0
    ks = np.arange(0, 11, dtype=np.float64)
    ours = np.asarray(dists.BetaBinomial.logpdf(
        jnp.asarray(ks, jnp.float32), {"n": n, "alpha": a, "beta": b}))
    p = np.linspace(1e-6, 1 - 1e-6, 20001)
    beta_pdf = np.exp(td.Beta(t64(a), t64(b)).log_prob(t64(p)).numpy())
    pmf = np.array([
        np.trapezoid(
            np.exp(td.Binomial(n, probs=t64(p)).log_prob(t64(k)).numpy())
            * beta_pdf, p)
        for k in ks
    ])
    np.testing.assert_allclose(np.exp(ours), pmf, atol=1e-4, rtol=1e-3)
    assert np.exp(ours).sum() == pytest.approx(1.0, abs=1e-3)


def test_ordered_logistic():
    # explicit f64 sigmoid arithmetic as the oracle
    eta, c = 0.7, np.array([-1.0, 0.5, 2.0])
    sig = lambda t: 1.0 / (1.0 + np.exp(-t))
    full = np.concatenate([[1.0], sig(eta - c), [0.0]])
    probs = full[:-1] - full[1:]
    ys = np.arange(4, dtype=np.float32)
    ours = np.asarray(dists.OrderedLogistic.logpdf(
        jnp.asarray(ys), {"eta": eta, "cutpoints": jnp.asarray(c)}))
    np.testing.assert_allclose(np.exp(ours), probs, atol=1e-5, rtol=1e-4)
    assert np.exp(ours).sum() == pytest.approx(1.0, abs=1e-5)
    # extreme eta must stay finite (the log-sigmoid-difference path)
    far = np.asarray(dists.OrderedLogistic.logpdf(
        jnp.asarray([0.0, 3.0], jnp.float32),
        {"eta": 40.0, "cutpoints": jnp.asarray(c)}))
    assert np.all(np.isfinite(far))


def test_new_dists_sample_moments():
    key = jax.random.PRNGKey(0)
    ig = np.asarray(dists.InverseGamma.sample(
        key, {"alpha": 5.0, "beta": 8.0}, (40000,)))
    assert ig.mean() == pytest.approx(8.0 / 4.0, rel=0.05)  # b/(a-1)
    gu = np.asarray(dists.Gumbel.sample(
        key, {"loc": 1.0, "scale": 2.0}, (40000,)))
    assert gu.mean() == pytest.approx(1.0 + 2.0 * 0.5772, rel=0.05)
    bb = np.asarray(dists.BetaBinomial.sample(
        key, {"n": 10, "alpha": 2.0, "beta": 3.0}, (40000,)))
    assert bb.mean() == pytest.approx(10 * 2.0 / 5.0, rel=0.05)
    ol = np.asarray(dists.OrderedLogistic.sample(
        key, {"eta": 0.7, "cutpoints": jnp.asarray([-1.0, 0.5, 2.0])},
        (40000,)))
    sig = lambda t: 1.0 / (1.0 + np.exp(-t))
    full = np.concatenate([[1.0], sig(0.7 - np.array([-1.0, 0.5, 2.0])),
                           [0.0]])
    probs = full[:-1] - full[1:]
    emp = np.bincount(ol.astype(int), minlength=4) / ol.size
    np.testing.assert_allclose(emp, probs, atol=0.01)


def test_ordinal_regression_end_to_end():
    """OrderedLogistic + the ordered transform: recover cutpoints and
    slope from synthetic ordinal data via NUTS."""
    from exmc_tpu import Model, sample

    rng = np.random.default_rng(0)
    n = 300
    x = rng.normal(size=n).astype(np.float32)
    beta_true, c_true = 1.2, np.array([-1.0, 0.8])
    eta = beta_true * x
    sig = lambda t: 1.0 / (1.0 + np.exp(-t))
    full = np.concatenate(
        [np.ones((n, 1)), sig(eta[:, None] - c_true), np.zeros((n, 1))],
        axis=1)
    probs = full[:, :-1] - full[:, 1:]
    y = np.array([rng.choice(3, p=p / p.sum()) for p in probs],
                 np.float32)

    with Model() as m:
        m.rv("beta", dists.Normal, {"mu": 0.0, "sigma": 2.0})
        m.rv("c", dists.Normal, {"mu": 0.0, "sigma": 5.0},
             transform="ordered", shape=(2,))
        m.det("eta", lambda b: b * x, ["beta"])
        m.rv("y", dists.OrderedLogistic, {"eta": "eta", "cutpoints": "c"},
             shape=(n,))
        m.obs("y_obs", "y", y)
    trace, stats = sample(m.ir, num_chains=2, num_warmup=400,
                          num_samples=400, seed=0)
    assert stats["divergences"].sum() == 0
    assert trace["beta"].mean() == pytest.approx(beta_true, abs=0.35)
    c_post = trace["c"].reshape(-1, 2).mean(axis=0)
    np.testing.assert_allclose(c_post, c_true, atol=0.4)
    assert np.all(np.diff(trace["c"].reshape(-1, 2), axis=1) > 0)


def test_inverse_gamma_conjugate_posterior():
    """InvGamma(a, b) prior on a Normal variance with known mean is
    conjugate: posterior is InvGamma(a + n/2, b + SSE/2) — exact
    moment check."""
    from exmc_tpu import Model, sample

    rng = np.random.default_rng(1)
    y = rng.normal(0.0, 1.5, 80)
    a0, b0 = 3.0, 4.0
    with Model() as m:
        m.rv("v", dists.InverseGamma, {"alpha": a0, "beta": b0})
        m.det("sd", lambda v: jnp.sqrt(v), ["v"])
        m.rv("y", dists.Normal, {"mu": 0.0, "sigma": "sd"})
        m.obs("y_obs", "y", y)
    trace, stats = sample(m.ir, num_chains=2, num_warmup=400,
                          num_samples=600, seed=0)
    a_n = a0 + len(y) / 2
    b_n = b0 + 0.5 * float((y**2).sum())
    post_mean = b_n / (a_n - 1)
    post_sd = post_mean / np.sqrt(a_n - 2)
    assert stats["divergences"].sum() == 0
    assert trace["v"].mean() == pytest.approx(post_mean, abs=3 * post_sd / 5)
    assert trace["v"].std() == pytest.approx(post_sd, rel=0.25)


def test_stan_frontend_new_dists():
    from exmc_tpu import stan

    code = """
    data { int N; vector[N] y; vector[N] x; }
    parameters { real beta; ordered[2] c; }
    model {
      beta ~ normal(0, 2);
      c ~ normal(0, 5);
      y ~ ordered_logistic(beta * x, c);
    }
    """
    rng = np.random.default_rng(0)
    n = 120
    x = rng.normal(size=n)
    y = np.clip(np.digitize(1.2 * x + rng.logistic(size=n),
                            [-1.0, 0.8]) + 1, 1, 3)
    trace, stats = stan.sample(code, data={"N": n, "y": y, "x": x},
                               num_chains=2, num_warmup=300,
                               num_samples=300, seed=0)
    assert stats["divergences"].sum() == 0
    assert 0.5 < trace["beta"].mean() < 2.2


def test_beta_binomial_vector_n_sample():
    # regression (round-4 review): per-observation trial counts
    # crashed sample() via int(n) while logpdf supported them
    key = jax.random.PRNGKey(3)
    n = jnp.asarray([5.0, 10.0, 50.0])
    draws = np.asarray(dists.BetaBinomial.sample(
        key, {"n": n, "alpha": 2.0, "beta": 2.0}, (2000, 3)))
    assert draws.shape == (2000, 3)
    assert np.all(draws <= np.asarray(n))
    np.testing.assert_allclose(draws.mean(axis=0), np.asarray(n) * 0.5,
                               rtol=0.1)

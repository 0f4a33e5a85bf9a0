"""Particle-filter stack (reference smc_ex, D72/D73): bootstrap PF,
PMCMC, SMC^2 — validated against EXACT Kalman-filter quantities on the
linear-Gaussian state-space model (the same gold-standard style as the
validation battery)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from exmc_tpu.particle import particle_filter, pmcmc, smc2, systematic_resample
from exmc_tpu.particle.filter import make_log_marginal_fn


Q, R, T = 0.3, 0.5, 40


def make_data(seed=0, q=Q, r=R, t=T):
    rng = np.random.default_rng(seed)
    x = np.cumsum(rng.normal(0, q, t))
    y = x + rng.normal(0, r, t)
    return jnp.asarray(y, jnp.float32)


def kalman_loglik_and_filter(ys, q, r):
    """Exact log p(y_{1:T}) and filtered means for
    x_1 ~ N(0,q^2), x_t ~ N(x_{t-1}, q^2), y_t ~ N(x_t, r^2)."""
    ys = np.asarray(ys, np.float64)
    m, p, ll = 0.0, 0.0, 0.0
    means = []
    for y in ys:
        mp, pp = m, p + q * q
        s = pp + r * r
        ll += -0.5 * (np.log(2 * np.pi * s) + (y - mp) ** 2 / s)
        k = pp / s
        m = mp + k * (y - mp)
        p = (1 - k) * pp
        means.append(m)
    return ll, np.array(means)


def ssm_fns(q=None, r=None):
    """Model fns; params dict {"q","r"} overrides fixed values."""

    def init_fn(key, n, params):
        qq = params.get("q", q)
        return qq * jax.random.normal(key, (n,))

    def step_fn(key, x, t, params):
        qq = params.get("q", q)
        return x + qq * jax.random.normal(key, x.shape)

    def loglik_fn(x, y, t, params):
        rr = params.get("r", r)
        z = (y - x) / rr
        return -0.5 * z * z - jnp.log(rr) - 0.5 * jnp.log(2 * jnp.pi)

    return init_fn, step_fn, loglik_fn


def test_systematic_resample_targets_weights():
    key = jax.random.PRNGKey(0)
    log_w = jnp.log(jnp.asarray([0.1, 0.2, 0.3, 0.4]))
    counts = np.zeros(4)
    for i in range(200):
        idx = systematic_resample(jax.random.fold_in(key, i), log_w, n=100)
        counts += np.bincount(np.asarray(idx), minlength=4)
    freq = counts / counts.sum()
    np.testing.assert_allclose(freq, [0.1, 0.2, 0.3, 0.4], atol=0.01)


def test_pf_log_marginal_matches_kalman():
    ys = make_data()
    exact, exact_means = kalman_loglik_and_filter(ys, Q, R)
    init_fn, step_fn, loglik_fn = ssm_fns(Q, R)

    lls = []
    for s in range(30):
        out = particle_filter(init_fn, step_fn, loglik_fn, ys, 512,
                              jax.random.PRNGKey(s), {})
        lls.append(float(out["log_marginal"]))
    lls = np.asarray(lls)
    # unbiased in p-space; log estimates concentrate near the truth
    assert abs(np.mean(lls) - exact) < 0.5, (np.mean(lls), exact)
    assert np.std(lls) < 0.5


def test_pf_filtered_means_match_kalman():
    ys = make_data()
    _, exact_means = kalman_loglik_and_filter(ys, Q, R)
    init_fn, step_fn, loglik_fn = ssm_fns(Q, R)
    out = particle_filter(init_fn, step_fn, loglik_fn, ys, 4096,
                          jax.random.PRNGKey(1), {})
    got = np.asarray(out["filtered_means"])
    # filtered sds are >= 0.26 here; particle means track within MC error
    assert np.max(np.abs(got - exact_means)) < 0.15
    assert np.asarray(out["ess"]).min() > 0.05


def quad_posterior_r(ys, lo=0.2, hi=1.2, n=81):
    """Exact posterior of the observation scale r (log-uniform prior)
    via Kalman likelihood on a grid."""
    grid = np.linspace(lo, hi, n)
    ll = np.array([kalman_loglik_and_filter(ys, Q, float(r))[0] for r in grid])
    lp = ll  # flat prior on r in [lo, hi]
    w = np.exp(lp - lp.max())
    w /= np.trapezoid(w, grid)
    mean = np.trapezoid(w * grid, grid)
    sd = np.sqrt(np.trapezoid(w * (grid - mean) ** 2, grid))
    return mean, sd


def test_pmcmc_posterior_matches_kalman_quadrature():
    """PMMH on the observation scale targets the EXACT posterior
    (Andrieu et al. 2010 exactness despite the noisy likelihood)."""
    ys = make_data()
    exact_mean, exact_sd = quad_posterior_r(ys)
    init_fn, step_fn, loglik_fn = ssm_fns(q=Q)

    def wrap_loglik(x, y, t, params):
        return loglik_fn(x, y, t, {"r": params[0]})

    def wrap_step(key, x, t, params):
        return step_fn(key, x, t, {})

    def wrap_init(key, n, params):
        return init_fn(key, n, {})

    lm = make_log_marginal_fn(wrap_init, wrap_step, wrap_loglik, ys, 256)

    def log_prior(theta):
        r = theta[0]
        return jnp.where((r > 0.2) & (r < 1.2), 0.0, -jnp.inf)

    thetas, acc = pmcmc(lm, log_prior, jnp.asarray([0.6]), 600,
                        jax.random.PRNGKey(0), step_scale=0.08,
                        num_chains=4)
    draws = np.asarray(thetas)[:, 200:, 0].reshape(-1)
    assert 0.05 < float(np.mean(acc)) < 0.9
    assert abs(draws.mean() - exact_mean) < 2.5 * exact_sd / np.sqrt(20)
    assert 0.5 < draws.std() / exact_sd < 2.0


def test_smc2_posterior_and_evidence():
    ys = make_data()
    exact_mean, exact_sd = quad_posterior_r(ys)
    init_fn, step_fn, loglik_fn = ssm_fns(q=Q)

    def wrap_init(key, n, params):
        return init_fn(key, n, {})

    def wrap_step(key, x, t, params):
        return step_fn(key, x, t, {})

    def wrap_loglik(x, y, t, params):
        return loglik_fn(x, y, t, {"r": params[0]})

    def prior_sample(key, n):
        return jax.random.uniform(key, (n, 1), jnp.float32, 0.2, 1.2)

    def log_prior(theta):
        r = theta[0]
        return jnp.where((r > 0.2) & (r < 1.2), 0.0, -jnp.inf)

    out = smc2(wrap_init, wrap_step, wrap_loglik, prior_sample, log_prior,
               ys, n_theta=128, n_x=128, key=jax.random.PRNGKey(0))
    w = np.asarray(jax.nn.softmax(out["log_weights"]))
    th = np.asarray(out["thetas"])[:, 0]
    post_mean = float((w * th).sum())
    post_sd = float(np.sqrt((w * (th - post_mean) ** 2).sum()))
    assert abs(post_mean - exact_mean) < 3.0 * exact_sd / np.sqrt(10)
    assert 0.4 < post_sd / exact_sd < 2.5
    assert int(out["rejuvenations"]) >= 1
    # evidence: log p(y) under the flat prior = log mean_r p(y|r)
    grid = np.linspace(0.2, 1.2, 81)
    lls = np.array([kalman_loglik_and_filter(ys, Q, float(r))[0] for r in grid])
    exact_log_ev = np.log(np.trapezoid(np.exp(lls - lls.max()), grid)
                          / (1.2 - 0.2)) + lls.max()
    assert abs(float(out["log_evidence"]) - exact_log_ev) < 1.5

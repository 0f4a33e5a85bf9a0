"""Expanded gold-standard model zoo (round 2): the zero-egress analogue
of the reference's 33-model posteriordb battery
(reference benchmark/posteriordb/README.md:17-23, validation_results.md).

posteriordb's reference draws cannot be fetched here, so every target is
computed EXACTLY instead, by one of three mechanisms that are all
stronger than reference MCMC draws:

* conjugate/analytic posteriors (closed-form moments);
* high-precision 1-d quadrature: for any model with a single scalar
  free parameter the posterior mean/sd is a 1-d integral, evaluated on
  a dense float64 grid (trapezoid rule, ~1e-10 accurate) — this covers
  likelihoods with no conjugate prior (StudentT, Cauchy, Laplace,
  Weibull, TruncatedNormal, Mixture, Censored, logistic);
* exact linear-Gaussian inference (Kalman/RTS smoother) for the
  GaussianRandomWalk state-space model at T=1000.

Together with the round-1 six, the battery exercises every distribution
in the library, meas_obs (matmul + affine Jacobians), right/interval
censoring, the dense mass matrix, the stick-breaking simplex transform,
long-T latent paths, and models built through the Stan frontend.
"""

import math

import numpy as np
from scipy.special import log_ndtr, ndtr, gammaln

from exmc_tpu import Builder, dists
from exmc_tpu.benchmarks.validation import GoldStandard


# ---------------------------------------------------------------------------
# exact-target machinery
# ---------------------------------------------------------------------------

def quadrature_posterior(log_post_fn, lo, hi, n=100001):
    """Exact scalar posterior moments by dense-grid trapezoid quadrature.

    ``log_post_fn``: vectorized float64 unnormalized log posterior.
    Accurate to ~1e-10 for smooth densities — a stronger gold standard
    than posteriordb's reference MCMC draws."""
    th = np.linspace(lo, hi, n, dtype=np.float64)
    lp = np.asarray(log_post_fn(th), dtype=np.float64)
    lp = lp - lp.max()
    w = np.exp(lp)
    z = np.trapezoid(w, th)
    mean = np.trapezoid(w * th, th) / z
    var = np.trapezoid(w * (th - mean) ** 2, th) / z
    return float(mean), float(math.sqrt(var))


def kalman_smoother_grw(ys, q, r):
    """Exact marginal posterior means/sds of the latent path in
      x_1 ~ N(0, q^2);  x_t ~ N(x_{t-1}, q^2);  y_t ~ N(x_t, r^2)
    via the RTS smoother (float64). Matches GaussianRandomWalk's logpdf
    convention (first increment is x[0] itself, timeseries.py)."""
    T = len(ys)
    m_f = np.zeros(T)
    p_f = np.zeros(T)
    m_pred = np.zeros(T)
    p_pred = np.zeros(T)
    m, p = 0.0, 0.0
    for t in range(T):
        mp = m
        pp = p + q * q
        m_pred[t], p_pred[t] = mp, pp
        k = pp / (pp + r * r)
        m = mp + k * (ys[t] - mp)
        p = (1.0 - k) * pp
        m_f[t], p_f[t] = m, p
    m_s = np.zeros(T)
    p_s = np.zeros(T)
    m_s[-1], p_s[-1] = m_f[-1], p_f[-1]
    for t in range(T - 2, -1, -1):
        c = p_f[t] / p_pred[t + 1]
        m_s[t] = m_f[t] + c * (m_s[t + 1] - m_pred[t + 1])
        p_s[t] = p_f[t] + c * c * (p_s[t + 1] - p_pred[t + 1])
    return m_s, np.sqrt(p_s)


def _normal_lp(y, mu, sigma):
    z = (np.asarray(y)[..., None] - mu) / sigma
    return -0.5 * z * z - math.log(sigma) - 0.5 * math.log(2 * math.pi)


# ---------------------------------------------------------------------------
# conjugate / analytic targets
# ---------------------------------------------------------------------------

def exponential_gamma(seed=10):
    """Exponential likelihood + Gamma prior (conjugate)."""
    rng = np.random.default_rng(seed)
    n, lam_true, a0, b0 = 60, 2.0, 2.0, 1.0
    ys = rng.exponential(1.0 / lam_true, size=n)
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "lam", dists.Gamma, {"alpha": a0, "beta": b0})
    ir = Builder.rv(ir, "y", dists.Exponential, {"lambda": "lam"})
    ir = Builder.obs(ir, "y_obs", "y", ys)
    a, b = a0 + n, b0 + ys.sum()
    return GoldStandard(
        "exponential_gamma", ir, {"lam": a / b}, {"lam": math.sqrt(a) / b}
    )


def lognormal_conjugate(seed=11):
    """LogNormal likelihood with known sigma + Normal prior on mu: the
    log-data reduce it to the Normal-Normal conjugate pair."""
    rng = np.random.default_rng(seed)
    n, mu_true, sigma, prior_sd = 40, 0.8, 0.5, 5.0
    ys = rng.lognormal(mu_true, sigma, size=n)
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "mu", dists.Normal, {"mu": 0.0, "sigma": prior_sd})
    ir = Builder.rv(ir, "y", dists.LogNormal, {"mu": "mu", "sigma": sigma})
    ir = Builder.obs(ir, "y_obs", "y", ys)
    post_var = 1.0 / (1.0 / prior_sd**2 + n / sigma**2)
    post_mean = post_var * np.log(ys).sum() / sigma**2
    return GoldStandard(
        "lognormal_conjugate", ir, {"mu": post_mean},
        {"mu": math.sqrt(post_var)},
    )


def uniform01_bernoulli(seed=12):
    """Uniform(0,1) prior + Bernoulli likelihood = Beta(1+k, 1+n-k)."""
    rng = np.random.default_rng(seed)
    n, p_true = 120, 0.65
    ys = (rng.random(n) < p_true).astype(np.float64)
    k = ys.sum()
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "p", dists.Uniform01, {})
    ir = Builder.rv(ir, "y", dists.Bernoulli, {"p": "p"})
    ir = Builder.obs(ir, "y_obs", "y", ys)
    a, b = 1.0 + k, 1.0 + n - k
    mean = a / (a + b)
    sd = math.sqrt(a * b / ((a + b) ** 2 * (a + b + 1)))
    return GoldStandard("uniform01_bernoulli", ir, {"p": mean}, {"p": sd})


def custom_gaussian_conjugate(seed=13):
    """Custom dist with a hand-written Gaussian logpdf; conjugate
    Normal-Normal target validates the Custom dispatch path."""
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    n, mu_true, sigma, prior_sd = 50, -1.0, 1.0, 8.0
    ys = rng.normal(mu_true, sigma, size=n)
    gauss = dists.Custom(
        logpdf_fn=lambda x, params: -0.5 * ((x - params["loc"]) / sigma) ** 2
        - jnp.log(sigma) - 0.5 * jnp.log(2 * jnp.pi),
        support="real",
    )
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "mu", dists.Normal, {"mu": 0.0, "sigma": prior_sd})
    ir = Builder.rv(ir, "y", gauss, {"loc": "mu"})
    ir = Builder.obs(ir, "y_obs", "y", ys)
    post_var = 1.0 / (1.0 / prior_sd**2 + n / sigma**2)
    post_mean = post_var * ys.sum() / sigma**2
    return GoldStandard(
        "custom_gaussian_conjugate", ir, {"mu": post_mean},
        {"mu": math.sqrt(post_var)},
    )


def dirichlet_prior_moments():
    """Dirichlet prior with no data: posterior == prior, exact moments.
    Exercises the K -> K-1 stick-breaking transform end to end."""
    alpha = np.array([2.0, 3.0, 4.0])
    a0 = alpha.sum()
    mean = alpha / a0
    sd = np.sqrt(alpha * (a0 - alpha) / (a0**2 * (a0 + 1.0)))
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "w", dists.Dirichlet, {"alpha": alpha}, shape=(3,))
    return GoldStandard("dirichlet_prior", ir, {"w": mean}, {"w": sd})


def mvn_dense_mass():
    """Strongly correlated MvNormal prior target (rho=0.95, d=4) sampled
    with the DENSE mass matrix; exact moments are the prior's."""
    d, rho = 4, 0.95
    cov = rho * np.ones((d, d)) + (1 - rho) * np.eye(d)
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "x", dists.MvNormal, {"mu": np.zeros(d), "cov": cov})
    return GoldStandard(
        "mvn_dense_mass", ir, {"x": np.zeros(d)},
        {"x": np.sqrt(np.diag(cov))}, opts={"dense_mass": True},
    )


def linreg_meas_obs_matmul(seed=14):
    """meas_obs via a matmul lift: y = A x observed with A square
    invertible, x_i ~ Normal(mu, 1), mu free. The implied x = A^{-1}y is
    deterministic, so mu's posterior is the Normal-Normal conjugate
    (compiler meas_obs Jacobian path, reference
    lift_measurable_matmul.ex)."""
    rng = np.random.default_rng(seed)
    d, prior_sd = 3, 10.0
    a = np.array([[2.0, 0.3, 0.0], [0.1, 1.5, 0.2], [0.0, 0.4, 1.2]])
    x_true = rng.normal(0.7, 1.0, size=d)
    y = a @ x_true
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "mu", dists.Normal, {"mu": 0.0, "sigma": prior_sd})
    ir = Builder.rv(ir, "x", dists.Normal, {"mu": "mu", "sigma": 1.0},
                    shape=(d,))
    ir = Builder.det(ir, "yd", "matmul", [a, "x"])
    ir = Builder.obs(ir, "y_obs", "yd", y)
    x_implied = np.linalg.solve(a, y)
    post_var = 1.0 / (1.0 / prior_sd**2 + d)
    post_mean = post_var * x_implied.sum()
    return GoldStandard(
        "linreg_meas_obs_matmul", ir, {"mu": post_mean},
        {"mu": math.sqrt(post_var)},
    )


def affine_meas_obs(seed=15):
    """meas_obs via an affine lift: y = a*x + b observed (scalar),
    x ~ Normal(mu, 1), mu free -> conjugate given x = (y-b)/a."""
    a_c, b_c, prior_sd = 2.5, -1.0, 10.0
    y = 4.0
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "mu", dists.Normal, {"mu": 0.0, "sigma": prior_sd})
    ir = Builder.rv(ir, "x", dists.Normal, {"mu": "mu", "sigma": 1.0})
    ir = Builder.det(ir, "yd", "affine", [a_c, b_c, "x"])
    ir = Builder.obs(ir, "y_obs", "yd", y)
    x_implied = (y - b_c) / a_c
    post_var = 1.0 / (1.0 / prior_sd**2 + 1.0)
    post_mean = post_var * x_implied
    return GoldStandard(
        "affine_meas_obs", ir, {"mu": post_mean},
        {"mu": math.sqrt(post_var)},
    )


# ---------------------------------------------------------------------------
# quadrature-exact targets (non-conjugate scalar-parameter models)
# ---------------------------------------------------------------------------

def studentt_loc(seed=20):
    rng = np.random.default_rng(seed)
    n, df, loc_true = 40, 4.0, 1.2
    ys = loc_true + rng.standard_t(df, size=n)
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "mu", dists.Normal, {"mu": 0.0, "sigma": 5.0})
    ir = Builder.rv(ir, "y", dists.StudentT, {"df": df, "loc": "mu", "scale": 1.0})
    ir = Builder.obs(ir, "y_obs", "y", ys)

    def log_post(mu):
        z = ys[:, None] - mu[None, :]
        lik = -(df + 1) / 2 * np.log1p(z * z / df)
        return lik.sum(0) - 0.5 * (mu / 5.0) ** 2

    mean, sd = quadrature_posterior(log_post, -3.0, 6.0)
    return GoldStandard("studentt_loc", ir, {"mu": mean}, {"mu": sd})


def cauchy_loc(seed=21):
    rng = np.random.default_rng(seed)
    n, loc_true = 30, -0.5
    ys = loc_true + rng.standard_cauchy(size=n)
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "mu", dists.Normal, {"mu": 0.0, "sigma": 5.0})
    ir = Builder.rv(ir, "y", dists.Cauchy, {"loc": "mu", "scale": 1.0})
    ir = Builder.obs(ir, "y_obs", "y", ys)

    def log_post(mu):
        z = ys[:, None] - mu[None, :]
        return -np.log1p(z * z).sum(0) - 0.5 * (mu / 5.0) ** 2

    mean, sd = quadrature_posterior(log_post, -5.0, 4.0)
    return GoldStandard("cauchy_loc", ir, {"mu": mean}, {"mu": sd})


def laplace_loc(seed=22):
    rng = np.random.default_rng(seed)
    n, loc_true = 50, 0.7
    ys = rng.laplace(loc_true, 1.0, size=n)
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "mu", dists.Normal, {"mu": 0.0, "sigma": 5.0})
    ir = Builder.rv(ir, "y", dists.Laplace, {"mu": "mu", "b": 1.0})
    ir = Builder.obs(ir, "y_obs", "y", ys)

    def log_post(mu):
        z = np.abs(ys[:, None] - mu[None, :])
        return -z.sum(0) - 0.5 * (mu / 5.0) ** 2

    mean, sd = quadrature_posterior(log_post, -3.0, 4.0)
    return GoldStandard("laplace_loc", ir, {"mu": mean}, {"mu": sd})


def weibull_rate(seed=23):
    """Weibull likelihood with known shape k, Gamma prior on lambda."""
    rng = np.random.default_rng(seed)
    n, k, lam_true, a0, b0 = 60, 1.5, 2.0, 2.0, 1.0
    ys = lam_true * rng.weibull(k, size=n)
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "lam", dists.Gamma, {"alpha": a0, "beta": b0})
    ir = Builder.rv(ir, "y", dists.Weibull, {"k": k, "lambda": "lam"})
    ir = Builder.obs(ir, "y_obs", "y", ys)

    def log_post(lam):
        zt = ys[:, None] / lam[None, :]
        lik = (k - 1) * np.log(zt) - np.log(lam)[None, :] - zt**k
        return lik.sum(0) + (a0 - 1) * np.log(lam) - b0 * lam

    mean, sd = quadrature_posterior(log_post, 1e-3, 6.0)
    return GoldStandard("weibull_rate", ir, {"lam": mean}, {"lam": sd})


def halfnormal_scale(seed=24):
    """sigma ~ HalfNormal prior on a Normal scale (quadrature exact)."""
    rng = np.random.default_rng(seed)
    n, sigma_true = 50, 1.3
    ys = rng.normal(0.0, sigma_true, size=n)
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "sigma", dists.HalfNormal, {"sigma": 3.0})
    ir = Builder.rv(ir, "y", dists.Normal, {"mu": 0.0, "sigma": "sigma"})
    ir = Builder.obs(ir, "y_obs", "y", ys)
    ss = float((ys**2).sum())

    def log_post(s):
        return (-n * np.log(s) - ss / (2 * s * s)) - 0.5 * (s / 3.0) ** 2

    mean, sd = quadrature_posterior(log_post, 1e-3, 5.0)
    return GoldStandard("halfnormal_scale", ir, {"sigma": mean}, {"sigma": sd})


def truncnorm_loc(seed=25):
    rng = np.random.default_rng(seed)
    n, mu_true, lo, hi = 60, 0.8, -1.0, 3.0
    raw = rng.normal(mu_true, 1.0, size=4 * n)
    ys = raw[(raw > lo) & (raw < hi)][:n]
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "mu", dists.Normal, {"mu": 0.0, "sigma": 5.0})
    ir = Builder.rv(
        ir, "y", dists.TruncatedNormal,
        {"mu": "mu", "sigma": 1.0, "lower": lo, "upper": hi},
    )
    ir = Builder.obs(ir, "y_obs", "y", ys)

    def log_post(mu):
        z = ys[:, None] - mu[None, :]
        log_norm = np.log(ndtr(hi - mu) - ndtr(lo - mu))
        return (-0.5 * z * z).sum(0) - n * log_norm - 0.5 * (mu / 5.0) ** 2

    mean, sd = quadrature_posterior(log_post, -2.0, 4.0)
    return GoldStandard("truncnorm_loc", ir, {"mu": mean}, {"mu": sd})


def uniform_interval_normal(seed=26):
    """theta ~ Uniform(2, 5) prior + Normal likelihood: truncated-normal
    posterior, quadrature exact. Exercises the IntervalTransform."""
    rng = np.random.default_rng(seed)
    n, theta_true = 15, 2.6
    ys = rng.normal(theta_true, 1.0, size=n)
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "theta", dists.Uniform, {"lower": 2.0, "upper": 5.0})
    ir = Builder.rv(ir, "y", dists.Normal, {"mu": "theta", "sigma": 1.0})
    ir = Builder.obs(ir, "y_obs", "y", ys)

    def log_post(th):
        z = ys[:, None] - th[None, :]
        return (-0.5 * z * z).sum(0)

    mean, sd = quadrature_posterior(log_post, 2.0 + 1e-9, 5.0 - 1e-9)
    return GoldStandard("uniform_interval_normal", ir, {"theta": mean},
                        {"theta": sd})


def mixture_loc(seed=27):
    """Known-weight 2-component Normal mixture, one unknown component
    mean (quadrature exact over the scalar mu)."""
    rng = np.random.default_rng(seed)
    n1, n2 = 50, 50
    ys = np.concatenate([
        rng.normal(-2.0, 0.5, n1), rng.normal(3.0, 0.5, n2)
    ])
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "m1", dists.Normal, {"mu": 2.0, "sigma": 5.0})
    ir = Builder.rv(
        ir, "y", dists.Mixture,
        {
            "components": [dists.Normal, dists.Normal],
            "params": [{"mu": -2.0, "sigma": 0.5}, {"mu": "m1", "sigma": 0.5}],
            "weights": np.array([0.5, 0.5]),
        },
    )
    ir = Builder.obs(ir, "y_obs", "y", ys)

    def log_post(m):
        lp1 = _normal_lp(ys, -2.0, 0.5) + math.log(0.5)  # (n, grid)
        lp2 = (
            -0.5 * ((ys[:, None] - m[None, :]) / 0.5) ** 2
            - math.log(0.5) - 0.5 * math.log(2 * math.pi) + math.log(0.5)
        )
        mx = np.maximum(lp1, lp2)
        lik = mx + np.log(np.exp(lp1 - mx) + np.exp(lp2 - mx))
        return lik.sum(0) - 0.5 * ((m - 2.0) / 5.0) ** 2

    mean, sd = quadrature_posterior(log_post, 1.0, 5.0)
    return GoldStandard("mixture_loc", ir, {"m1": mean}, {"m1": sd})


def censored_right_normal(seed=28):
    """Right-censored Normal observations (obs meta censored="right"),
    quadrature with exact log-SF terms."""
    rng = np.random.default_rng(seed)
    n, mu_true, cut = 60, 1.0, 1.5
    raw = rng.normal(mu_true, 1.0, size=n)
    observed = raw[raw <= cut]
    n_cens = int((raw > cut).sum())
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "mu", dists.Normal, {"mu": 0.0, "sigma": 10.0})
    ir = Builder.rv(ir, "y", dists.Normal, {"mu": "mu", "sigma": 1.0})
    ir = Builder.obs(ir, "y_obs", "y", observed)
    ir = Builder.rv(ir, "y_c", dists.Normal, {"mu": "mu", "sigma": 1.0})
    ir = Builder.obs(ir, "y_c_obs", "y_c", np.full(n_cens, cut),
                     censored="right")

    def log_post(mu):
        z = observed[:, None] - mu[None, :]
        lik = (-0.5 * z * z).sum(0)
        lik = lik + n_cens * log_ndtr(-(cut - mu))  # log SF(cut; mu, 1)
        return lik - 0.5 * (mu / 10.0) ** 2

    mean, sd = quadrature_posterior(log_post, -1.0, 3.5)
    return GoldStandard("censored_right_normal", ir, {"mu": mean}, {"mu": sd})


def censored_interval_normal(seed=29):
    """Interval-censored Normal observations ({"lower","upper"} obs
    values), quadrature with exact CDF differences."""
    rng = np.random.default_rng(seed)
    n_exact, n_int, mu_true = 40, 30, 0.5
    ys = rng.normal(mu_true, 1.0, size=n_exact)
    lo_i, hi_i = -0.5, 1.5
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "mu", dists.Normal, {"mu": 0.0, "sigma": 10.0})
    ir = Builder.rv(ir, "y", dists.Normal, {"mu": "mu", "sigma": 1.0})
    ir = Builder.obs(ir, "y_obs", "y", ys)
    ir = Builder.rv(ir, "y_i", dists.Normal, {"mu": "mu", "sigma": 1.0})
    ir = Builder.obs(
        ir, "y_i_obs", "y_i",
        {"lower": np.full(n_int, lo_i), "upper": np.full(n_int, hi_i)},
        censored="interval",
    )

    def log_post(mu):
        z = ys[:, None] - mu[None, :]
        lik = (-0.5 * z * z).sum(0)
        lik = lik + n_int * np.log(ndtr(hi_i - mu) - ndtr(lo_i - mu))
        return lik - 0.5 * (mu / 10.0) ** 2

    mean, sd = quadrature_posterior(log_post, -1.5, 2.5)
    return GoldStandard("censored_interval_normal", ir, {"mu": mean},
                        {"mu": sd})


def poisson_log_link(seed=30):
    """Poisson regression with a log link through a det node: scalar
    coefficient, quadrature exact."""
    rng = np.random.default_rng(seed)
    n, beta_true = 80, 0.6
    x = rng.normal(0.0, 1.0, size=n)
    ys = rng.poisson(np.exp(beta_true * x)).astype(np.float64)
    import jax.numpy as jnp

    ir = Builder.new_ir()
    ir = Builder.rv(ir, "beta", dists.Normal, {"mu": 0.0, "sigma": 2.5})
    ir = Builder.det(ir, "rate", lambda b: jnp.exp(b * jnp.asarray(x)), ["beta"])
    ir = Builder.rv(ir, "y", dists.Poisson, {"mu": "rate"}, shape=(n,))
    ir = Builder.obs(ir, "y_obs", "y", ys)

    def log_post(beta):
        eta = x[:, None] * beta[None, :]
        lik = ys[:, None] * eta - np.exp(eta) - gammaln(ys + 1.0)[:, None]
        return lik.sum(0) - 0.5 * (beta / 2.5) ** 2

    mean, sd = quadrature_posterior(log_post, -0.5, 1.5)
    return GoldStandard("poisson_log_link", ir, {"beta": mean}, {"beta": sd})


# ---------------------------------------------------------------------------
# state-space: exact Kalman target at T=1000
# ---------------------------------------------------------------------------

def grw_kalman_t1000(seed=31):
    """GaussianRandomWalk latent path, T=1000, Normal observations at
    every step; exact marginals from the RTS smoother. Validates the
    long-T latent-sequence path (SURVEY §5.7, reference
    docs/STATE_SPACE_MODELS.md)."""
    rng = np.random.default_rng(seed)
    T, q, r = 1000, 0.1, 0.5
    x_true = np.cumsum(rng.normal(0.0, q, size=T))
    ys = x_true + rng.normal(0.0, r, size=T)
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "x", dists.GaussianRandomWalk, {"sigma": q},
                    shape=(T,))
    ir = Builder.rv(ir, "y", dists.Normal, {"mu": "x", "sigma": r},
                    shape=(T,))
    ir = Builder.obs(ir, "y_obs", "y", ys)
    m_s, sd_s = kalman_smoother_grw(ys, q, r)
    return GoldStandard(
        "grw_kalman_t1000", ir, {"x": m_s}, {"x": sd_s},
        opts={"num_warmup": 800, "num_samples": 800},
    )


# ---------------------------------------------------------------------------
# Stan-frontend-built models
# ---------------------------------------------------------------------------

def stan_eight_schools():
    """Eight schools built THROUGH the Stan frontend (vector params +
    data); published posterior moments as in the round-1 gold standard."""
    from exmc_tpu import stan

    code = """
    data { int J; vector[J] y; vector[J] sigma; }
    parameters { real mu; real<lower=0> tau; vector[J] theta; }
    model {
      mu ~ normal(0, 5);
      tau ~ half_cauchy(5);
      theta ~ normal(mu, tau);
      y ~ normal(theta, sigma);
    }
    """
    data = {
        "J": 8,
        "y": np.array([28.0, 8.0, -3.0, 7.0, -1.0, 1.0, 18.0, 12.0]),
        "sigma": np.array([15.0, 10.0, 16.0, 11.0, 9.0, 11.0, 10.0, 18.0]),
    }
    ir = stan.compile(code, data)
    return GoldStandard(
        "stan_eight_schools", ir,
        {"mu": 4.4, "tau": 3.6}, {"mu": 3.3, "tau": 3.2}, ncp=True,
    )


def stan_uniform_normal(seed=32):
    """Same target as uniform_interval_normal, built via Stan syntax
    'theta ~ uniform(2, 5)' (ADVICE r1 regression at battery level)."""
    from exmc_tpu import stan

    rng = np.random.default_rng(seed)
    n, theta_true = 15, 2.6
    ys = rng.normal(theta_true, 1.0, size=n)
    code = """
    data { vector[15] y; }
    parameters { real theta; }
    model {
      theta ~ uniform(2, 5);
      y ~ normal(theta, 1);
    }
    """
    ir = stan.compile(code, {"y": ys})

    def log_post(th):
        z = ys[:, None] - th[None, :]
        return (-0.5 * z * z).sum(0)

    mean, sd = quadrature_posterior(log_post, 2.0 + 1e-9, 5.0 - 1e-9)
    return GoldStandard("stan_uniform_normal", ir, {"theta": mean},
                        {"theta": sd})


def stan_logistic_1d(seed=33):
    """1-coefficient logistic regression via the Stan frontend's
    expression grammar (sigmoid + arithmetic); quadrature exact."""
    from exmc_tpu import stan

    rng = np.random.default_rng(seed)
    n, beta_true = 100, 1.2
    x = rng.normal(0.0, 1.0, size=n)
    p = 1.0 / (1.0 + np.exp(-beta_true * x))
    ys = (rng.random(n) < p).astype(np.float64)
    code = """
    data { vector[100] x; vector[100] y; }
    parameters { real beta; }
    model {
      beta ~ normal(0, 2.5);
      y ~ bernoulli(sigmoid(beta * x));
    }
    """
    ir = stan.compile(code, {"x": x, "y": ys})

    def log_post(beta):
        eta = x[:, None] * beta[None, :]
        lik = ys[:, None] * eta - np.log1p(np.exp(eta))
        return lik.sum(0) - 0.5 * (beta / 2.5) ** 2

    mean, sd = quadrature_posterior(log_post, -1.0, 4.0)
    return GoldStandard("stan_logistic_1d", ir, {"beta": mean},
                        {"beta": sd})


def stan_eight_schools_ncp():
    """Eight schools in REAL Stan NCP syntax — transformed parameters
    ``theta = mu + tau * theta_raw`` (round-2 frontend, VERDICT r1 task
    5); published posterior moments."""
    from exmc_tpu import stan

    code = """
    data { int J; vector[J] y; vector[J] sigma; }
    parameters { real mu; real<lower=0> tau; vector[J] theta_raw; }
    transformed parameters { vector[J] theta = mu + tau * theta_raw; }
    model {
      mu ~ normal(0, 5);
      tau ~ half_cauchy(5);
      theta_raw ~ normal(0, 1);
      y ~ normal(theta, sigma);
    }
    """
    data = {
        "J": 8,
        "y": np.array([28.0, 8.0, -3.0, 7.0, -1.0, 1.0, 18.0, 12.0]),
        "sigma": np.array([15.0, 10.0, 16.0, 11.0, 9.0, 11.0, 10.0, 18.0]),
    }
    ir = stan.compile(code, data)
    # the Stan program IS the NCP: no auto-NCP rewrite on top
    return GoldStandard(
        "stan_eight_schools_ncp", ir,
        {"mu": 4.4, "tau": 3.6}, {"mu": 3.3, "tau": 3.2}, ncp=False,
    )


def _laplace_is_moments(log_post, grad, hess, x0, n_draws=400_000, seed=0,
                        df=7.0):
    """Near-exact posterior moments for smooth log-concave targets:
    Laplace fit at the mode + self-normalized importance sampling with a
    multivariate-t proposal (float64). For the d=21 logistic below the
    IS effective sample size is >10^5, giving moment errors far below
    the 0.5-sd pass criterion."""
    from scipy.optimize import minimize

    res = minimize(lambda b: -log_post(b), x0, jac=lambda b: -grad(b),
                   method="BFGS", options={"maxiter": 500, "gtol": 1e-8})
    mode = res.x
    h = hess(mode)
    cov = np.linalg.inv(h)
    ch = np.linalg.cholesky(cov)
    d = len(mode)
    rng = np.random.default_rng(seed)
    z = rng.standard_normal((n_draws, d))
    g = rng.chisquare(df, n_draws) / df
    draws = mode + (z / np.sqrt(g)[:, None]) @ ch.T
    # log t-density (up to constants) for the self-normalized weights
    delta = draws - mode
    sol = np.linalg.solve(ch, delta.T).T
    maha = (sol**2).sum(axis=1)
    log_q = -0.5 * (df + d) * np.log1p(maha / df)
    log_p = log_post(draws.T)  # batched over the trailing axis
    log_w = log_p - log_q
    log_w -= log_w.max()
    w = np.exp(log_w)
    w /= w.sum()
    mean = (w[:, None] * draws).sum(axis=0)
    var = (w[:, None] * (draws - mean) ** 2).sum(axis=0)
    ess = 1.0 / (w**2).sum()
    return mean, np.sqrt(var), ess


def stan_logistic_d21(seed=35):
    """d=21 logistic regression (the reference's headline GLM scale,
    STANDARD_BENCHMARKS.md logistic row) built via the Stan frontend's
    matrix syntax; target from Laplace + 400k-draw importance sampling
    (float64, IS-ESS >> 10^4)."""
    from exmc_tpu import stan

    rng = np.random.default_rng(seed)
    n, k = 500, 21
    x = rng.normal(size=(n, k)).astype(np.float64)
    beta_true = rng.normal(0.0, 0.5, size=k)
    p = 1.0 / (1.0 + np.exp(-(x @ beta_true)))
    y = (rng.random(n) < p).astype(np.float64)
    code = """
    data { int N; int K; matrix[N, K] X; vector[N] y; }
    parameters { vector[K] beta; }
    model {
      beta ~ normal(0, 2.5);
      y ~ bernoulli(sigmoid(X * beta));
    }
    """
    ir = stan.compile(
        code, {"N": n, "K": k, "X": x.astype(np.float32),
               "y": y.astype(np.float32)},
    )
    tau = 2.5

    def log_post(b):
        # b: (k,) or (k, m) batched
        eta = x @ b
        yb = y if b.ndim == 1 else y[:, None]
        lik = (yb * eta - np.logaddexp(0.0, eta)).sum(axis=0)
        return lik - 0.5 * (b**2).sum(axis=0) / tau**2

    def grad(b):
        mu = 1.0 / (1.0 + np.exp(-(x @ b)))
        return x.T @ (y - mu) - b / tau**2

    def hess(b):
        mu = 1.0 / (1.0 + np.exp(-(x @ b)))
        w = mu * (1 - mu)
        return (x.T * w) @ x + np.eye(k) / tau**2

    mean, sd, ess = _laplace_is_moments(log_post, grad, hess, np.zeros(k),
                                        seed=seed)
    assert ess > 10_000, f"IS target unreliable (ess={ess:.0f})"
    return GoldStandard("stan_logistic_d21", ir, {"beta": mean},
                        {"beta": sd})


def _laplace_is_moments_dict(log_post, grad, hess, x0, todict,
                             n_draws=400_000, seed=0, df=7.0):
    """_laplace_is_moments variant for CONSTRAINED summaries of
    multivariate targets: ``todict(draws)`` maps unconstrained IS draws
    (m, d) to a dict name -> (m, ...) of constrained parameter values;
    returns (mean_dict, sd_dict, is_ess)."""
    from scipy.optimize import minimize

    res = minimize(lambda b: -log_post(b), x0, jac=lambda b: -grad(b),
                   method="BFGS", options={"maxiter": 1000, "gtol": 1e-7})
    mode = res.x
    h = hess(mode)
    cov = np.linalg.inv(h)
    # symmetrize against autodiff round-off before Cholesky
    cov = 0.5 * (cov + cov.T)
    ch = np.linalg.cholesky(cov)
    d = len(mode)
    rng = np.random.default_rng(seed)
    z = rng.standard_normal((n_draws, d))
    g = rng.chisquare(df, n_draws) / df
    draws = mode + (z / np.sqrt(g)[:, None]) @ ch.T
    delta = draws - mode
    sol = np.linalg.solve(ch, delta.T).T
    maha = (sol**2).sum(axis=1)
    log_q = -0.5 * (df + d) * np.log1p(maha / df)
    # chunked evaluation: todict/log_post may expand each draw into
    # (n_obs,)- or (J,)-sized intermediates — unchunked that is GBs of
    # float64 temporaries for 400k draws
    chunk = 20_000
    log_p = np.empty(n_draws)
    for s in range(0, n_draws, chunk):
        log_p[s:s + chunk] = log_post(draws[s:s + chunk].T)
    log_w = log_p - log_q
    log_w -= log_w.max()
    w = np.exp(log_w)
    w /= w.sum()
    ess = 1.0 / (w**2).sum()
    # two chunked passes: weighted means, then weighted variances
    sums, sqs = {}, {}
    for s in range(0, n_draws, chunk):
        part = todict(draws[s:s + chunk])
        wv = w[s:s + chunk]
        for name, vals in part.items():
            wb = wv.reshape((-1,) + (1,) * (vals.ndim - 1))
            sums[name] = sums.get(name, 0.0) + (wb * vals).sum(axis=0)
    for s in range(0, n_draws, chunk):
        part = todict(draws[s:s + chunk])
        wv = w[s:s + chunk]
        for name, vals in part.items():
            wb = wv.reshape((-1,) + (1,) * (vals.ndim - 1))
            sqs[name] = sqs.get(name, 0.0) + (
                wb * (vals - sums[name]) ** 2
            ).sum(axis=0)
    means = dict(sums)
    sds = {name: np.sqrt(v) for name, v in sqs.items()}
    return means, sds, ess


def radon_varying_intercept(seed=40, n_counties=85, n_homes=919):
    """Radon-style varying-intercept multilevel model (d=89) — the
    posteriordb battery's most common model class
    (reference benchmark/posteriordb/validation_results.md radon rows;
    VERDICT r2 #8). Minnesota-shaped synthetic data (85 counties with
    heavily skewed sizes, floor indicator), model:

        mu_a ~ N(0, 10); sigma_a ~ HalfNormal(1)
        alpha_j ~ N(mu_a, sigma_a), j = 1..85   (auto-NCP'd)
        beta ~ N(0, 10); sigma_y ~ HalfNormal(1)
        y_i ~ N(alpha[county_i] + beta * floor_i, sigma_y)

    Gold target: the alphas are MARGINALIZED ANALYTICALLY (the model is
    linear-Gaussian given the 4 hyperparameters; per-county Woodbury
    determinant/quadratic from sufficient statistics), Laplace-IS runs
    on the clean 4-d hyperparameter marginal (torch f64 autograd for
    its grad/Hessian; IS-ESS ~ the draw count), and alpha moments come
    from the exact conditional-Gaussian formulas averaged under the IS
    weights. NOTE (measured, this round): direct 89-d Laplace-IS fails
    in BOTH parameterizations — centered-unconstrained density is
    UNBOUNDED at the funnel tip (sigma_a -> 0 with alphas collapsed
    beats any interior point), and the non-centered joint mode inflates
    sigma_a with |z| shrunk (IS-ESS 1). Marginalization is the honest
    mechanism, and it is exact."""
    import torch

    rng = np.random.default_rng(seed)
    # skewed county sizes (posteriordb radon: 1..116 homes per county)
    raw = rng.pareto(1.1, size=n_counties) + 1.0
    sizes = np.maximum(1, (raw / raw.sum() * n_homes).astype(int))
    while sizes.sum() < n_homes:
        sizes[rng.integers(n_counties)] += 1
    while sizes.sum() > n_homes:
        j = rng.integers(n_counties)
        if sizes[j] > 1:
            sizes[j] -= 1
    county = np.repeat(np.arange(n_counties), sizes)
    floor_x = (rng.random(n_homes) < 0.45).astype(np.float64)
    true_alpha = rng.normal(1.46, 0.33, size=n_counties)
    y = rng.normal(true_alpha[county] - 0.69 * floor_x, 0.76)

    J, n = n_counties, n_homes

    # per-county sufficient statistics: within county j the residual
    # r_i = y_i - mu_a - beta x_i has |r|^2 and (sum r) expressible in
    # (S_y, S_x, S_yy, S_xy, S_xx, n_j)
    n_j = np.asarray(sizes, np.float64)
    S_y = np.array([y[county == j].sum() for j in range(J)])
    S_x = np.array([floor_x[county == j].sum() for j in range(J)])
    S_yy = np.array([(y[county == j] ** 2).sum() for j in range(J)])
    S_xy = np.array([(y[county == j] * floor_x[county == j]).sum()
                     for j in range(J)])
    S_xx = S_x  # x is 0/1 so x^2 = x

    def _marginal_terms(mu_a, beta, u, v):
        """Vectorized over trailing batch axes. Returns the marginal
        log-likelihood sum_j log N(y_j | mu_a + beta x_j, s2y I + s2a
        11^T) via Woodbury, with each per-county term from sufficient
        stats (works for numpy and torch inputs)."""
        mod = torch if isinstance(mu_a, torch.Tensor) else np
        s2a = mod.exp(2 * u)
        s2y = mod.exp(2 * v)
        # broadcast county axis first: shapes (J,) + batch
        nj = n_j.reshape((J,) + (1,) * getattr(mu_a, "ndim", 0)) \
            if mod is np else torch.tensor(n_j)
        Sy = S_y.reshape(nj.shape) if mod is np else torch.tensor(S_y)
        Sx = S_x.reshape(nj.shape) if mod is np else torch.tensor(S_x)
        Syy = S_yy.reshape(nj.shape) if mod is np else torch.tensor(S_yy)
        Sxy = S_xy.reshape(nj.shape) if mod is np else torch.tensor(S_xy)
        Sxx = S_xx.reshape(nj.shape) if mod is np else torch.tensor(S_xx)
        rsum = Sy - nj * mu_a - beta * Sx
        rsq = (Syy - 2 * mu_a * Sy - 2 * beta * Sxy
               + 2 * mu_a * beta * Sx + nj * mu_a ** 2 + beta ** 2 * Sxx)
        logdet = nj * mod.log(s2y) + mod.log(1 + nj * s2a / s2y)
        quad = rsq / s2y - (s2a / (s2y * (s2y + nj * s2a))) * rsum ** 2
        return (-0.5 * (logdet + quad)).sum(axis=0) \
            if mod is np else (-0.5 * (logdet + quad)).sum()

    def lp_hyper_torch(th):
        mu_a, beta, u, v = th[0], th[1], th[2], th[3]
        lp = -0.5 * (mu_a / 10.0) ** 2 - 0.5 * (beta / 10.0) ** 2
        lp = lp - 0.5 * torch.exp(2 * u) + u - 0.5 * torch.exp(2 * v) + v
        return lp + _marginal_terms(mu_a, beta, u, v)

    def log_post(b):
        if b.ndim == 1:
            with torch.no_grad():
                return float(lp_hyper_torch(torch.tensor(b)))
        mu_a, beta, u, v = b[0], b[1], b[2], b[3]
        lp = -0.5 * (mu_a / 10.0) ** 2 - 0.5 * (beta / 10.0) ** 2
        lp = lp - 0.5 * np.exp(2 * u) + u - 0.5 * np.exp(2 * v) + v
        return lp + _marginal_terms(mu_a, beta, u, v)

    def grad(b):
        th = torch.tensor(b, requires_grad=True)
        lp_hyper_torch(th).backward()
        return th.grad.numpy()

    def hess(b):
        return -torch.autograd.functional.hessian(
            lp_hyper_torch, torch.tensor(b)).numpy()

    def todict(draws):
        out = {
            "mu_a": draws[:, 0],
            "beta": draws[:, 1],
            "sigma_a": np.exp(draws[:, 2]),
            "sigma_y": np.exp(draws[:, 3]),
        }
        # exact conditional-Gaussian alpha per draw:
        # alpha_j | hyper, y ~ N(m_j, v_j),
        # 1/v_j = 1/s2a + n_j/s2y, m_j = v_j (mu_a/s2a + (S_y - b S_x)/s2y)
        mu_a, beta = draws[:, 0], draws[:, 1]
        s2a, s2y = np.exp(2 * draws[:, 2]), np.exp(2 * draws[:, 3])
        prec = 1.0 / s2a[:, None] + n_j[None, :] / s2y[:, None]
        v_j = 1.0 / prec
        m_j = v_j * (mu_a[:, None] / s2a[:, None]
                     + (S_y[None, :] - beta[:, None] * S_x[None, :])
                     / s2y[:, None])
        out["__alpha_mean"] = m_j
        out["__alpha_var"] = v_j
        return out

    x0 = np.array([y.mean(), -0.5, np.log(0.3), np.log(y.std() * 0.8)])
    means, sds, ess = _laplace_is_moments_dict(
        log_post, grad, hess, x0, todict, seed=seed)
    # 4-d IS against a t7 Laplace proposal: ESS ~ 1.5e4 of 4e5 (the
    # sigma_a marginal is right-skewed) => moment SE ~ 0.008 sd, far
    # below the 0.5-sd pass bar
    assert ess > 10_000, f"IS target unreliable (ess={ess:.0f})"
    # law of total expectation/variance for the marginal alpha moments
    am = means.pop("__alpha_mean")
    av_within = means.pop("__alpha_var")
    am_sd = sds.pop("__alpha_mean")
    sds.pop("__alpha_var")
    means["alpha"] = am
    sds["alpha"] = np.sqrt(av_within + am_sd ** 2)

    import jax.numpy as jnp

    county_j = jnp.asarray(county)
    floor_j = jnp.asarray(floor_x.astype(np.float32))

    ir = Builder.new_ir()
    ir = Builder.rv(ir, "mu_a", dists.Normal, {"mu": 0.0, "sigma": 10.0})
    ir = Builder.rv(ir, "sigma_a", dists.HalfNormal, {"sigma": 1.0})
    ir = Builder.rv(ir, "alpha", dists.Normal,
                    {"mu": "mu_a", "sigma": "sigma_a"}, shape=(J,))
    ir = Builder.rv(ir, "beta", dists.Normal, {"mu": 0.0, "sigma": 10.0})
    ir = Builder.rv(ir, "sigma_y", dists.HalfNormal, {"sigma": 1.0})
    ir = Builder.det(ir, "mu_y",
                     lambda a, b: a[county_j] + b * floor_j,
                     ["alpha", "beta"])
    ir = Builder.rv(ir, "y", dists.Normal,
                    {"mu": "mu_y", "sigma": "sigma_y"}, shape=(n,))
    ir = Builder.obs(ir, "y_obs", "y", y.astype(np.float32))
    return GoldStandard("radon_varying_intercept", ir, means, sds, ncp=True)


def kidiq_regression(seed=41, n=434):
    """kidiq-style linear regression (posteriordb's other most common
    shape, VERDICT r2 #8): kid_score ~ N(b0 + b1*mom_hs + b2*mom_iq,
    sigma), d=4 with an unknown scale. Gold target via Laplace-IS in
    unconstrained space (analytic grad/Hessian are simple here, but the
    torch-f64 path keeps one mechanism for the class)."""
    import torch

    rng = np.random.default_rng(seed)
    mom_hs = (rng.random(n) < 0.785).astype(np.float64)
    mom_iq = rng.normal(100.0, 15.0, size=n)
    y = rng.normal(26.0 + 6.0 * mom_hs + 0.56 * mom_iq, 18.0)
    # center IQ so the intercept is identified at sane scale
    iq_c = mom_iq - mom_iq.mean()
    X = np.stack([np.ones(n), mom_hs, iq_c], axis=1)

    yt, Xt = torch.tensor(y), torch.tensor(X)

    def lp_torch(th):
        b = th[:3]
        v = th[3]
        lp = -0.5 * (b[0] / 100.0) ** 2 - 0.5 * ((b[1:] / 10.0) ** 2).sum()
        lp = lp - 0.5 * torch.exp(2 * v) / 400.0 + v  # HalfNormal(20)
        resid = yt - Xt @ b
        return lp + (-0.5 * (resid / torch.exp(v)) ** 2).sum() - n * v

    def log_post(b):
        if b.ndim == 1:
            with torch.no_grad():
                return float(lp_torch(torch.tensor(b)))
        bb, v = b[:3], b[3]
        lp = -0.5 * (bb[0] / 100.0) ** 2 - 0.5 * ((bb[1:] / 10.0) ** 2).sum(axis=0)
        lp = lp - 0.5 * np.exp(2 * v) / 400.0 + v
        resid = y[:, None] - X @ bb
        return lp + (-0.5 * (resid / np.exp(v)) ** 2).sum(axis=0) - n * v

    def grad(b):
        th = torch.tensor(b, requires_grad=True)
        lp_torch(th).backward()
        return th.grad.numpy()

    def hess(b):
        return -torch.autograd.functional.hessian(
            lp_torch, torch.tensor(b)).numpy()

    def todict(draws):
        return {"b0": draws[:, 0], "b_hs": draws[:, 1], "b_iq": draws[:, 2],
                "sigma": np.exp(draws[:, 3])}

    x0 = np.array([y.mean(), 0.0, 0.0, np.log(y.std())])
    means, sds, ess = _laplace_is_moments_dict(
        log_post, grad, hess, x0, todict, seed=seed)
    assert ess > 50_000, f"IS target unreliable (ess={ess:.0f})"

    import jax.numpy as jnp

    hs_j = jnp.asarray(mom_hs.astype(np.float32))
    iq_j = jnp.asarray(iq_c.astype(np.float32))

    ir = Builder.new_ir()
    ir = Builder.rv(ir, "b0", dists.Normal, {"mu": 0.0, "sigma": 100.0})
    ir = Builder.rv(ir, "b_hs", dists.Normal, {"mu": 0.0, "sigma": 10.0})
    ir = Builder.rv(ir, "b_iq", dists.Normal, {"mu": 0.0, "sigma": 10.0})
    ir = Builder.rv(ir, "sigma", dists.HalfNormal, {"sigma": 20.0})
    ir = Builder.det(ir, "mu_y",
                     lambda b0, b1, b2: b0 + b1 * hs_j + b2 * iq_j,
                     ["b0", "b_hs", "b_iq"])
    ir = Builder.rv(ir, "y", dists.Normal,
                    {"mu": "mu_y", "sigma": "sigma"}, shape=(n,))
    ir = Builder.obs(ir, "y_obs", "y", y.astype(np.float32))
    return GoldStandard("kidiq_regression", ir, means, sds)


# ---------------------------------------------------------------------------
# geometry stress: funnel marginals under auto-NCP
# ---------------------------------------------------------------------------

def funnel_v_marginal():
    """Neal's funnel: v ~ N(0, 3), x_i | v ~ N(0, exp(v/2)) (d=9 + v).
    The exact marginal of v is its prior; validating v's moments checks
    the auto-NCP rewrite keeps the hierarchy calibrated (x's marginal
    has astronomical kurtosis, so only v is checked)."""
    import jax.numpy as jnp

    ir = Builder.new_ir()
    ir = Builder.rv(ir, "v", dists.Normal, {"mu": 0.0, "sigma": 3.0})
    ir = Builder.det(ir, "scale", lambda v: jnp.exp(v / 2.0), ["v"])
    ir = Builder.rv(ir, "x", dists.Normal, {"mu": 0.0, "sigma": "scale"},
                    shape=(9,))
    return GoldStandard("funnel_v_marginal", ir, {"v": 0.0}, {"v": 3.0},
                        ncp=True)


# ---------------------------------------------------------------------------
# improper flat prior (Stan's implicit default): exact ML posterior
# ---------------------------------------------------------------------------

def flat_prior_normal(seed=33):
    """Flat (improper) prior + Normal likelihood with known sigma: the
    posterior is exactly N(ybar, sigma^2/n) — validates the zero-logpdf
    Flat dist used by the Stan frontend's <offset=, multiplier=>
    lowering keeps the sampler on the likelihood alone."""
    rng = np.random.default_rng(seed)
    n, mu_true, sigma = 50, 1.7, 2.0
    ys = rng.normal(mu_true, sigma, size=n)
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "mu", dists.Flat, {})
    ir = Builder.rv(ir, "y", dists.Normal, {"mu": "mu", "sigma": sigma})
    ir = Builder.obs(ir, "y_obs", "y", ys)
    return GoldStandard(
        "flat_prior_normal", ir, {"mu": float(ys.mean())},
        {"mu": sigma / math.sqrt(n)},
    )


# ---------------------------------------------------------------------------
# round-3 discrete-likelihood expansion (Binomial/NegBin/Categorical)
# ---------------------------------------------------------------------------

def binomial_beta(seed=34):
    """Beta(2,2) prior + Binomial(20, p) likelihood: posterior exactly
    Beta(2 + sum y, 2 + sum n - sum y)."""
    rng = np.random.default_rng(seed)
    groups, trials, p_true, a0, b0 = 30, 20, 0.35, 2.0, 2.0
    ys = rng.binomial(trials, p_true, size=groups).astype(float)
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "p", dists.Beta, {"alpha": a0, "beta": b0})
    ir = Builder.rv(ir, "y", dists.Binomial, {"n": float(trials), "p": "p"})
    ir = Builder.obs(ir, "y_obs", "y", ys)
    a = a0 + ys.sum()
    b = b0 + groups * trials - ys.sum()
    mean = a / (a + b)
    sd = math.sqrt(a * b / ((a + b) ** 2 * (a + b + 1.0)))
    return GoldStandard("binomial_beta", ir, {"p": mean}, {"p": sd})


def negbin_rate(seed=35):
    """Gamma prior on the NegativeBinomial mean mu (alpha fixed):
    quadrature-exact. The mu-dependent log-posterior needs no lgamma —
    the combinatorial terms are constant in mu."""
    rng = np.random.default_rng(seed)
    n, mu_true, alpha = 50, 4.0, 3.0
    lam = rng.gamma(alpha, mu_true / alpha, size=n)
    ys = rng.poisson(lam).astype(float)
    a0, b0 = 2.0, 0.5  # Gamma(shape, rate) prior on mu
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "mu", dists.Gamma, {"alpha": a0, "beta": b0})
    ir = Builder.rv(ir, "y", dists.NegativeBinomial,
                    {"mu": "mu", "alpha": alpha})
    ir = Builder.obs(ir, "y_obs", "y", ys)

    s = ys.sum()

    def log_post(mu):
        lik = (n * alpha * math.log(alpha)
               - (n * alpha + s) * np.log(alpha + mu) + s * np.log(mu))
        prior = (a0 - 1.0) * np.log(mu) - b0 * mu
        return lik + prior

    mean, sd = quadrature_posterior(log_post, 1e-3, 12.0)
    return GoldStandard("negbin_rate", ir, {"mu": mean}, {"mu": sd})


def categorical_dirichlet(seed=36):
    """Dirichlet(2,2,2,2) prior + Categorical likelihood: posterior
    exactly Dirichlet(2 + counts)."""
    rng = np.random.default_rng(seed)
    K, n = 4, 120
    w_true = np.array([0.4, 0.3, 0.2, 0.1])
    ys = rng.choice(K, size=n, p=w_true).astype(float)
    a0 = np.full(K, 2.0)
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "w", dists.Dirichlet, {"alpha": a0})
    ir = Builder.rv(ir, "y", dists.Categorical, {"p": "w"})
    ir = Builder.obs(ir, "y_obs", "y", ys)
    counts = np.bincount(ys.astype(int), minlength=K)
    a = a0 + counts
    tot = a.sum()
    mean = a / tot
    sd = np.sqrt(a * (tot - a) / (tot**2 * (tot + 1.0)))
    return GoldStandard("categorical_dirichlet", ir, {"w": mean}, {"w": sd})


def multinomial_dirichlet(seed=38):
    """Dirichlet(3,3,3) prior + one Multinomial(300, w) count vector:
    posterior exactly Dirichlet(3 + counts)."""
    rng = np.random.default_rng(seed)
    K, n = 3, 300
    w_true = np.array([0.5, 0.3, 0.2])
    counts = rng.multinomial(n, w_true).astype(float)
    a0 = np.full(K, 3.0)
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "w", dists.Dirichlet, {"alpha": a0})
    ir = Builder.rv(ir, "y", dists.Multinomial, {"n": n, "p": "w"},
                    shape=(K,))
    ir = Builder.obs(ir, "y_obs", "y", counts, reduce="sum")
    a = a0 + counts
    tot = a.sum()
    mean = a / tot
    sd = np.sqrt(a * (tot - a) / (tot**2 * (tot + 1.0)))
    return GoldStandard("multinomial_dirichlet", ir, {"w": mean}, {"w": sd})


def ordered_normal_orderstats(seed=39):
    """ordered transform on an iid-Normal(0,1) K=3 vector: the
    constrained density IS the joint of 3 standard-normal order
    statistics — exact marginal means E[x_(1)] = -3/(2 sqrt(pi)),
    E[x_(2)] = 0 (David & Nagaraja); sds from a 4e6-sample sorted-iid
    MC (se ~4e-4, an order of magnitude below the 0.5-sd pass bar)."""
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "x", dists.Normal, {"mu": 0.0, "sigma": 1.0},
                    transform="ordered", shape=(3,))
    m1 = -3.0 / (2.0 * math.sqrt(math.pi))
    sd_outer = 0.74788
    sd_mid = 0.66954
    return GoldStandard(
        "ordered_normal_orderstats", ir,
        {"x": np.array([m1, 0.0, -m1])},
        {"x": np.array([sd_outer, sd_mid, sd_outer])},
    )


def zero_sum_normal_prior(seed=40):
    """ZeroSumNormal(sigma=2, K=4) prior: exact marginals
    N(0, sigma^2 (1 - 1/K)) -> sd = sqrt(3)."""
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "x", dists.ZeroSumNormal, {"sigma": 2.0},
                    shape=(4,))
    sd = 2.0 * math.sqrt(1.0 - 0.25)
    return GoldStandard(
        "zero_sum_normal_prior", ir,
        {"x": np.zeros(4)}, {"x": np.full(4, sd)},
    )


def lkj_marginals(seed=37):
    """LKJ(eta=2) prior on a d=3 correlation Cholesky factor: every
    marginal correlation r_ij of R = L L' is exactly
    2*Beta(eta-1+d/2, eta-1+d/2) - 1 -> mean 0, sd 1/sqrt(2*eta+d-1)
    (Lewandowski et al. 2009). Checked through the ``derived`` hook on
    all three correlations (r12 = L[1,0] directly; r13, r23 via L L')."""
    eta, d = 2.0, 3
    sd = 1.0 / math.sqrt(2.0 * eta + d - 1.0)
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "L", dists.LKJCholesky, {"eta": eta}, shape=(d, d))

    def corr(i, j):
        def fn(trace):
            L = np.asarray(trace["L"])  # (chains, draws, d, d)
            return (L[:, :, i, :] * L[:, :, j, :]).sum(axis=-1)
        return fn

    return GoldStandard(
        "lkj_marginals", ir,
        {"r12": 0.0, "r13": 0.0, "r23": 0.0},
        {"r12": sd, "r13": sd, "r23": sd},
        derived={"r12": corr(1, 0), "r13": corr(2, 0), "r23": corr(2, 1)},
    )


def kilpisjarvi_real_regression():
    """REAL-DATA gold (VERDICT r3 item 7): linear trend in the actual
    Kilpisjärvi summer-temperature record 1952-2013 (62 real
    observations, exmc_tpu/datasets; the Aalto BDA course's running
    regression example). Model (BDA course ch. 11 notebook):

        alpha ~ N(10, 10); beta ~ N(0, 1); sigma ~ HalfNormal(5)
        temp_i ~ N(alpha + beta * (year_i - 1982.5)/10, sigma)

    Target via Laplace-IS on the 3-d unconstrained posterior (float64,
    IS-ESS >> 10^4). The reference's real-data validation used an
    external posteriordb checkout; its repo ships no radon/kidiq CSVs
    (radon_data.exs is synthetic) — this dataset IS shipped and real."""
    from exmc_tpu.datasets import load_kilpisjarvi

    k = load_kilpisjarvi()
    x = (k["year"] - 1982.5) / 10.0     # decades, centered
    y = k["temp_summer"].astype(np.float64)
    n = len(y)

    def log_post(b):
        # b: (3,) or (3, m); coords (alpha, beta, log sigma)
        a, be, v = b[0], b[1], b[2]
        lp = (-0.5 * ((a - 10.0) / 10.0) ** 2 - 0.5 * be ** 2
              - 0.5 * np.exp(2 * v) / 25.0 + v)
        mu = (a + np.outer(x, be)) if b.ndim > 1 else a + x * be
        yb = y[:, None] if b.ndim > 1 else y
        return lp + (-0.5 * ((yb - mu) / np.exp(v)) ** 2).sum(axis=0) - n * v

    def grad(b):
        a, be, v = b
        s2 = np.exp(2 * v)
        r = y - a - x * be
        return np.array([
            -(a - 10.0) / 100.0 + r.sum() / s2,
            -be + (x * r).sum() / s2,
            -np.exp(2 * v) / 25.0 + 1.0 + (r ** 2).sum() / s2 - n,
        ])

    def hess(b):
        a, be, v = b
        s2 = np.exp(2 * v)
        r = y - a - x * be
        h = np.zeros((3, 3))
        h[0, 0] = 1.0 / 100.0 + n / s2
        h[1, 1] = 1.0 + (x ** 2).sum() / s2
        h[0, 1] = h[1, 0] = x.sum() / s2
        h[0, 2] = h[2, 0] = 2.0 * r.sum() / s2
        h[1, 2] = h[2, 1] = 2.0 * (x * r).sum() / s2
        h[2, 2] = 2.0 * np.exp(2 * v) / 25.0 + 2.0 * (r ** 2).sum() / s2
        return h

    def todict(draws):
        return {"alpha": draws[:, 0], "beta": draws[:, 1],
                "sigma": np.exp(draws[:, 2])}

    x0 = np.array([y.mean(), 0.0, np.log(y.std())])
    means, sds, ess = _laplace_is_moments_dict(
        log_post, grad, hess, x0, todict, seed=7)
    assert ess > 10_000, f"IS target unreliable (ess={ess:.0f})"

    import jax.numpy as jnp

    xj = jnp.asarray(x.astype(np.float32))
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "alpha", dists.Normal, {"mu": 10.0, "sigma": 10.0})
    ir = Builder.rv(ir, "beta", dists.Normal, {"mu": 0.0, "sigma": 1.0})
    ir = Builder.rv(ir, "sigma", dists.HalfNormal, {"sigma": 5.0})
    ir = Builder.det(ir, "mu_t", lambda a, b: a + b * xj, ["alpha", "beta"])
    ir = Builder.rv(ir, "temp", dists.Normal,
                    {"mu": "mu_t", "sigma": "sigma"}, shape=(n,))
    ir = Builder.obs(ir, "temp_obs", "temp", y.astype(np.float32))
    return GoldStandard("kilpisjarvi_real_regression", ir, means, sds)


def diabetes_real_logistic():
    """REAL-DATA gold (VERDICT r3 item 7): logistic regression on the
    actual Pima Indians Diabetes dataset (768 patients, 8 predictors,
    exmc_tpu/datasets; the BDA notebooks' logistic example). Features
    standardized; alpha, beta ~ N(0, 2.5). Target via Laplace-IS on the
    9-d unconstrained posterior (analytic f64 grad/Hessian, the
    stan_logistic_d21 mechanism on real data)."""
    from exmc_tpu.datasets import load_diabetes

    dd = load_diabetes()
    Xr = dd["X"].astype(np.float64)
    Xs = (Xr - Xr.mean(axis=0)) / Xr.std(axis=0)
    y = dd["y"].astype(np.float64)
    n, k = Xs.shape
    X1 = np.concatenate([np.ones((n, 1)), Xs], axis=1)  # intercept first
    tau = 2.5

    def log_post(b):
        eta = X1 @ b
        yb = y if b.ndim == 1 else y[:, None]
        lik = (yb * eta - np.logaddexp(0.0, eta)).sum(axis=0)
        return lik - 0.5 * (b ** 2).sum(axis=0) / tau ** 2

    def grad(b):
        mu = 1.0 / (1.0 + np.exp(-(X1 @ b)))
        return X1.T @ (y - mu) - b / tau ** 2

    def hess(b):
        mu = 1.0 / (1.0 + np.exp(-(X1 @ b)))
        w = mu * (1 - mu)
        return (X1.T * w) @ X1 + np.eye(k + 1) / tau ** 2

    def todict(draws):
        return {"alpha": draws[:, 0], "beta": draws[:, 1:]}

    means, sds, ess = _laplace_is_moments_dict(
        log_post, grad, hess, np.zeros(k + 1), todict, seed=11)
    assert ess > 10_000, f"IS target unreliable (ess={ess:.0f})"

    ir = Builder.new_ir()
    ir = Builder.rv(ir, "alpha", dists.Normal, {"mu": 0.0, "sigma": 2.5})
    ir = Builder.rv(ir, "beta", dists.Normal, {"mu": 0.0, "sigma": 2.5},
                    shape=(k,))
    ir = Builder.det(ir, "xb", "matmul", [Xs.astype(np.float32), "beta"])
    ir = Builder.det(ir, "eta", "add", ["xb", "alpha"])
    ir = Builder.rv(ir, "y", dists.Bernoulli, {"logits": "eta"}, shape=(n,))
    ir = Builder.obs(ir, "y_obs", "y", y.astype(np.float32))
    return GoldStandard("diabetes_real_logistic", ir, means, sds)




# ---------------------------------------------------------------------------
# round-4 third-session dists: InverseGamma / Gumbel / BetaBinomial /
# OrderedLogistic — every distribution must be hit by a gold posterior
# ---------------------------------------------------------------------------

def inverse_gamma_variance(seed=40):
    """InvGamma prior on a Normal variance with known mean: conjugate,
    posterior exactly InvGamma(a0 + n/2, b0 + SSE/2)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    n, a0, b0 = 60, 3.0, 4.0
    ys = rng.normal(0.0, 1.4, n)
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "v", dists.InverseGamma, {"alpha": a0, "beta": b0})
    ir = Builder.det(ir, "sd", lambda v: jnp.sqrt(v), ["v"])
    ir = Builder.rv(ir, "y", dists.Normal, {"mu": 0.0, "sigma": "sd"})
    ir = Builder.obs(ir, "y_obs", "y", ys)
    a_n = a0 + n / 2.0
    b_n = b0 + 0.5 * float((ys ** 2).sum())
    mean = b_n / (a_n - 1.0)
    sd = mean / math.sqrt(a_n - 2.0)
    return GoldStandard("inverse_gamma_variance", ir, {"v": mean},
                        {"v": sd})


def gumbel_loc(seed=41):
    """Gumbel likelihood with a Normal prior on the location,
    quadrature exact."""
    rng = np.random.default_rng(seed)
    n, loc_true = 40, 0.8
    ys = rng.gumbel(loc_true, 1.0, n)
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "mu", dists.Normal, {"mu": 0.0, "sigma": 5.0})
    ir = Builder.rv(ir, "y", dists.Gumbel, {"loc": "mu", "scale": 1.0})
    ir = Builder.obs(ir, "y_obs", "y", ys)

    def log_post(mu):
        z = ys[:, None] - mu[None, :]
        return (-z - np.exp(-z)).sum(0) - 0.5 * (mu / 5.0) ** 2

    mean, sd = quadrature_posterior(log_post, -2.0, 4.0)
    return GoldStandard("gumbel_loc", ir, {"mu": mean}, {"mu": sd})


def beta_binomial_conc(seed=42):
    """BetaBinomial(n, a, b) counts with beta fixed and a Gamma prior
    on alpha (overdispersion direction), quadrature exact via
    scipy.special.gammaln in float64."""
    from scipy.special import gammaln

    rng = np.random.default_rng(seed)
    m, trials, a_true, b_fix = 50, 20, 2.0, 3.0
    p = rng.beta(a_true, b_fix, m)
    ks = rng.binomial(trials, p).astype(np.float64)
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "a", dists.Gamma, {"alpha": 2.0, "beta": 0.5})
    ir = Builder.rv(ir, "k", dists.BetaBinomial,
                    {"n": float(trials), "alpha": "a", "beta": b_fix},
                    shape=(m,))
    ir = Builder.obs(ir, "k_obs", "k", ks)

    def log_post(a):
        aa = a[None, :]
        kk = ks[:, None]
        ll = (gammaln(kk + aa) + gammaln(trials - kk + b_fix)
              - gammaln(trials + aa + b_fix)
              - gammaln(aa) - gammaln(b_fix) + gammaln(aa + b_fix))
        return ll.sum(0) + (2.0 - 1.0) * np.log(a) - 0.5 * a

    mean, sd = quadrature_posterior(log_post, 1e-3, 15.0)
    return GoldStandard("beta_binomial_conc", ir, {"a": mean}, {"a": sd})


def ordered_logistic_eta(seed=43):
    """Ordinal outcomes with FIXED cutpoints and a Normal prior on the
    common linear predictor, quadrature exact."""
    rng = np.random.default_rng(seed)
    n, eta_true = 80, 0.6
    c = np.array([-1.0, 0.9])
    sig = lambda t: 1.0 / (1.0 + np.exp(-t))
    full = np.concatenate([[1.0], sig(eta_true - c), [0.0]])
    probs = full[:-1] - full[1:]
    ys = rng.choice(3, size=n, p=probs / probs.sum()).astype(np.float64)
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "eta", dists.Normal, {"mu": 0.0, "sigma": 2.0})
    ir = Builder.rv(ir, "y", dists.OrderedLogistic,
                    {"eta": "eta", "cutpoints": c}, shape=(n,))
    ir = Builder.obs(ir, "y_obs", "y", ys)

    counts = np.bincount(ys.astype(int), minlength=3).astype(np.float64)

    def log_post(eta):
        sg = [np.ones_like(eta), sig(eta - c[0]), sig(eta - c[1]),
              np.zeros_like(eta)]
        lps = [np.log(np.clip(sg[k] - sg[k + 1], 1e-300, None))
               for k in range(3)]
        ll = sum(counts[k] * lps[k] for k in range(3))
        return ll - 0.5 * (eta / 2.0) ** 2

    mean, sd = quadrature_posterior(log_post, -2.5, 3.5)
    return GoldStandard("ordered_logistic_eta", ir, {"eta": mean},
                        {"eta": sd})


def crossed_random_effects_lmm(seed=50, n_rows=30, n_cols=20):
    """CROSSED random effects at real scale (round-5 VERDICT item 7:
    the posteriordb model class the zoo lacked — radon is NESTED):

        mu ~ N(0,10); sigma_a, sigma_b, sigma_y ~ HalfNormal(1)
        a_i ~ N(0, sigma_a), i=1..30;  b_j ~ N(0, sigma_b), j=1..20
        y_ij ~ N(mu + a_i + b_j, sigma_y)   (balanced full cross, n=600)

    d = 54. Gold target is EXACT: for the balanced design the marginal
    covariance sigma_y^2 I + sigma_a^2 (I x J_J) + sigma_b^2 (J_I x I)
    eigen-decomposes into the classical two-way ANOVA spaces — grand
    mean (lam1 = s2y + J s2a + I s2b), row contrasts (s2y + J s2a,
    m=I-1), column contrasts (s2y + I s2b, m=J-1), interaction
    residuals (s2y) — so the 4-d hyperparameter marginal is closed-form
    in the ANOVA sufficient statistics. Laplace-IS integrates it, and
    the conditional (a, b) | hyper moments come from a rank-2 Woodbury
    inverse of the crossed posterior precision (the a-b coupling
    Z_a'Z_b = 1 1' is rank one each way), numerically verified against
    a dense solve at the mode below."""
    import torch

    I, J = n_rows, n_cols
    n = I * J
    rng = np.random.default_rng(seed)
    a_true = rng.normal(0.0, 0.6, I)
    b_true = rng.normal(0.0, 0.4, J)
    y = (2.0 + a_true[:, None] + b_true[None, :]
         + rng.normal(0.0, 0.8, (I, J)))

    ybar = y.mean()
    ra = y.mean(axis=1)           # row means (I,)
    rb = y.mean(axis=0)           # col means (J,)
    ssa = J * ((ra - ybar) ** 2).sum()
    ssb = I * ((rb - ybar) ** 2).sum()
    sse = ((y - ra[:, None] - rb[None, :] + ybar) ** 2).sum()

    def _marginal_ll(mu, u, v, w, mod=np):
        s2a, s2b, s2y = mod.exp(2 * u), mod.exp(2 * v), mod.exp(2 * w)
        lam1 = s2y + J * s2a + I * s2b
        lam_a = s2y + J * s2a
        lam_b = s2y + I * s2b
        return -0.5 * (
            mod.log(lam1) + (I - 1) * mod.log(lam_a)
            + (J - 1) * mod.log(lam_b) + (I - 1) * (J - 1) * mod.log(s2y)
            + n * (ybar - mu) ** 2 / lam1 + ssa / lam_a + ssb / lam_b
            + sse / s2y
        )

    def _lp(th, mod=np):
        mu, u, v, w = th[0], th[1], th[2], th[3]
        lp = -0.5 * (mu / 10.0) ** 2
        for s in (u, v, w):  # HalfNormal(1) scales in log space
            lp = lp - 0.5 * mod.exp(2 * s) + s
        return lp + _marginal_ll(mu, u, v, w, mod)

    def log_post(b):
        if b.ndim == 1:
            return float(_lp(b))
        return _lp(b)

    def grad(b):
        th = torch.tensor(b, requires_grad=True)
        _lp(th, mod=torch).backward()
        return th.grad.numpy()

    def hess(b):
        return -torch.autograd.functional.hessian(
            lambda t: _lp(t, mod=torch), torch.tensor(b)).numpy()

    def _cond_moments(mu, s2a, s2b, s2y):
        """(a, b) | hyper, y posterior means + variances via the rank-2
        Woodbury inverse; all inputs (m,) draw batches."""
        alpha = J / s2y + 1.0 / s2a       # a-block precision diag
        beta = I / s2y + 1.0 / s2b        # b-block precision diag
        h_a = J * (ra[None, :] - mu[:, None]) / s2y[:, None]   # (m, I)
        h_b = I * (rb[None, :] - mu[:, None]) / s2y[:, None]   # (m, J)
        t = n * (ybar - mu) / s2y          # both column sums of h
        # M = S^-1 + U' D^-1 U with S = (1/s2y) [[0,1],[1,0]]
        m11, m22, m12 = I / alpha, J / beta, s2y
        det = m11 * m22 - m12 ** 2
        g1 = (m22 * (t / alpha) - m12 * (t / beta)) / det
        g2 = (-m12 * (t / alpha) + m11 * (t / beta)) / det
        mean_a = (h_a - g1[:, None]) / alpha[:, None]
        mean_b = (h_b - g2[:, None]) / beta[:, None]
        var_a = 1.0 / alpha - (m22 / det) / alpha ** 2
        var_b = 1.0 / beta - (m11 / det) / beta ** 2
        return mean_a, mean_b, var_a, var_b

    # numeric self-check of the Woodbury algebra at one interior point
    chk = np.array([1.9, np.log(0.5), np.log(0.45), np.log(0.75)])
    s2a_c, s2b_c = np.exp(2 * chk[1:2]), np.exp(2 * chk[2:3])
    s2y_c = np.exp(2 * chk[3:4])
    P = np.zeros((I + J, I + J))
    P[:I, :I] = np.eye(I) * (J / s2y_c + 1 / s2a_c)
    P[I:, I:] = np.eye(J) * (I / s2y_c + 1 / s2b_c)
    P[:I, I:] = 1.0 / s2y_c
    P[I:, :I] = 1.0 / s2y_c
    cov_dense = np.linalg.inv(P)
    h_dense = np.concatenate([
        J * (ra - chk[0]) / s2y_c, I * (rb - chk[0]) / s2y_c])
    m_dense = cov_dense @ h_dense
    ma, mb, va, vb = _cond_moments(
        chk[:1] + 0.0, s2a_c, s2b_c, s2y_c)
    assert np.allclose(ma[0], m_dense[:I], atol=1e-8)
    assert np.allclose(mb[0], m_dense[I:], atol=1e-8)
    assert np.allclose(va[0], np.diag(cov_dense)[:I], atol=1e-10)
    assert np.allclose(vb[0], np.diag(cov_dense)[I:], atol=1e-10)

    def todict(draws):
        mu = draws[:, 0]
        s2a, s2b = np.exp(2 * draws[:, 1]), np.exp(2 * draws[:, 2])
        s2y = np.exp(2 * draws[:, 3])
        mean_a, mean_b, var_a, var_b = _cond_moments(mu, s2a, s2b, s2y)
        return {
            "mu": mu,
            "sigma_a": np.sqrt(s2a),
            "sigma_b": np.sqrt(s2b),
            "sigma_y": np.sqrt(s2y),
            "__a_mean": mean_a,
            "__a_var": np.broadcast_to(var_a[:, None], mean_a.shape),
            "__b_mean": mean_b,
            "__b_var": np.broadcast_to(var_b[:, None], mean_b.shape),
        }

    x0 = np.array([ybar, np.log(0.5), np.log(0.4), np.log(0.8)])
    means, sds, ess = _laplace_is_moments_dict(
        log_post, grad, hess, x0, todict, seed=seed)
    assert ess > 10_000, f"IS target unreliable (ess={ess:.0f})"
    for name in ("a", "b"):
        m = means.pop(f"__{name}_mean")
        v_within = means.pop(f"__{name}_var")
        m_sd = sds.pop(f"__{name}_mean")
        sds.pop(f"__{name}_var")
        means[name] = m
        sds[name] = np.sqrt(v_within + m_sd ** 2)

    import jax.numpy as jnp

    row_idx = jnp.asarray(np.repeat(np.arange(I), J))
    col_idx = jnp.asarray(np.tile(np.arange(J), I))

    ir = Builder.new_ir()
    ir = Builder.rv(ir, "mu", dists.Normal, {"mu": 0.0, "sigma": 10.0})
    ir = Builder.rv(ir, "sigma_a", dists.HalfNormal, {"sigma": 1.0})
    ir = Builder.rv(ir, "sigma_b", dists.HalfNormal, {"sigma": 1.0})
    ir = Builder.rv(ir, "sigma_y", dists.HalfNormal, {"sigma": 1.0})
    ir = Builder.rv(ir, "a", dists.Normal,
                    {"mu": 0.0, "sigma": "sigma_a"}, shape=(I,))
    ir = Builder.rv(ir, "b", dists.Normal,
                    {"mu": 0.0, "sigma": "sigma_b"}, shape=(J,))
    ir = Builder.det(ir, "mu_y",
                     lambda m, a, b: m + a[row_idx] + b[col_idx],
                     ["mu", "a", "b"])
    ir = Builder.rv(ir, "y", dists.Normal,
                    {"mu": "mu_y", "sigma": "sigma_y"}, shape=(n,))
    ir = Builder.obs(ir, "y_obs", "y", y.reshape(-1).astype(np.float32))
    return GoldStandard("crossed_random_effects_lmm", ir, means, sds,
                        ncp=True)


def avtest_binomial_glmm():
    """Logistic-binomial GLMM on REAL data (round-5 VERDICT item 7):
    AV-TEST engine detection counts (exmc_tpu/datasets
    avtest_detection.csv, pooled over months — ~45k Bernoulli trials
    per engine):

        mu ~ N(0,10); sigma_a ~ HalfNormal(1)
        a_e ~ N(0, sigma_a), e = 1..10 engines
        k_e ~ Binomial(N_e, logit^-1(mu + a_e))

    Gold target is EXACT (quadrature, no MCMC/IS): substituting
    t = mu + a_e, every engine's latent integral becomes
    int phi(t - mu; sigma) L_e(t) dt over a SHARED t-grid, so the whole
    (mu, log sigma) posterior surface is three dense-matrix
    contractions (kernel x likelihood table); hyper moments come from
    the 2-d grid and a_e moments from the same contractions with
    (t - mu) weights + law of total variance. Grid containment is
    asserted (boundary mass < 1e-8)."""
    from exmc_tpu.datasets import load_csv

    raw = load_csv("avtest_detection")
    engines = sorted(set(raw["engine"]))
    N_e = np.array([raw["n_tested"][raw["engine"] == e].sum()
                    for e in engines], np.float64)
    k_e = np.array([raw["n_detected"][raw["engine"] == e].sum()
                    for e in engines], np.float64)
    E = len(engines)

    # shared t-grid likelihood tables, max-normalized per engine
    t = np.linspace(1.4, 7.4, 2801)
    dt = t[1] - t[0]
    # log sig(t) = -log1p(exp(-t)); log sig(-t) = -log1p(exp(t))
    ll = (k_e[None, :] * (-np.log1p(np.exp(-t)))[:, None]
          + (N_e - k_e)[None, :] * (-np.log1p(np.exp(t)))[:, None])
    ll -= ll.max(axis=0, keepdims=True)
    L = np.exp(ll)                                   # (T, E)

    mus = np.linspace(1.6, 7.8, 201)
    us = np.linspace(np.log(0.25), np.log(5.5), 181)  # log sigma
    sig = np.exp(us)

    # per-sigma Gaussian kernels K[s] (mu-grid, t-grid); contractions
    diff = t[None, :] - mus[:, None]                 # (M, T)
    m0 = np.empty((len(us), len(mus), E))            # int phi L
    m1 = np.empty_like(m0)                           # int (t-mu) phi L
    m2 = np.empty_like(m0)                           # int (t-mu)^2 phi L
    for s, sg in enumerate(sig):
        K = np.exp(-0.5 * (diff / sg) ** 2) / (np.sqrt(2 * np.pi) * sg)
        m0[s] = (K * dt) @ L
        m1[s] = ((K * diff) * dt) @ L
        m2[s] = ((K * diff ** 2) * dt) @ L
    m0 = np.clip(m0, 1e-300, None)

    # log posterior over the (sigma, mu) grid
    lpost = np.log(m0).sum(axis=2)                   # (S, M)
    lpost += (-0.5 * (mus[None, :] / 10.0) ** 2)     # mu prior
    lpost += (-0.5 * np.exp(2 * us) + us)[:, None]   # HalfNormal + jac
    lpost -= lpost.max()
    w = np.exp(lpost)
    w /= w.sum()
    # containment: the grid must hold essentially all the mass
    edge = w[0, :].sum() + w[-1, :].sum() + w[:, 0].sum() + w[:, -1].sum()
    assert edge < 1e-7, f"grid clipped the posterior (edge mass {edge:.2e})"

    mu_mean = (w * mus[None, :]).sum()
    mu_sd = np.sqrt((w * (mus[None, :] - mu_mean) ** 2).sum())
    s_mean = (w * sig[:, None]).sum()
    s_sd = np.sqrt((w * (sig[:, None] - s_mean) ** 2).sum())
    # a_e | grid point: mean m1/m0, var m2/m0 - mean^2; total variance
    a_cond_mean = m1 / m0
    a_cond_var = m2 / m0 - a_cond_mean ** 2
    a_mean = (w[:, :, None] * a_cond_mean).sum(axis=(0, 1))
    a_var = (w[:, :, None] * (a_cond_var
                              + (a_cond_mean - a_mean) ** 2)).sum(axis=(0, 1))

    ir = Builder.new_ir()
    ir = Builder.rv(ir, "mu", dists.Normal, {"mu": 0.0, "sigma": 10.0})
    ir = Builder.rv(ir, "sigma_a", dists.HalfNormal, {"sigma": 1.0})
    ir = Builder.rv(ir, "a", dists.Normal,
                    {"mu": 0.0, "sigma": "sigma_a"}, shape=(E,))
    ir = Builder.det(ir, "logits", lambda m, a: m + a, ["mu", "a"])
    ir = Builder.rv(ir, "k", dists.Binomial,
                    {"n": N_e.astype(np.float32), "logits": "logits"},
                    shape=(E,))
    ir = Builder.obs(ir, "k_obs", "k", k_e.astype(np.float32))
    return GoldStandard(
        "avtest_binomial_glmm", ir,
        {"mu": mu_mean, "sigma_a": s_mean, "a": a_mean},
        {"mu": mu_sd, "sigma_a": s_sd, "a": np.sqrt(a_var)},
        ncp=True,
    )


def kilpisjarvi_ordinal():
    """Ordinal regression with FREE ordered cutpoints on REAL data
    (round-5 VERDICT item 7): Kilpisjärvi summers 1952-2013 classified
    into empirical terciles (cold / typical / warm), regressed on
    standardized year:

        beta ~ N(0, 2); c ~ N(0, 5) on the ordered region (K-1 = 2)
        y_i ~ OrderedLogistic(beta * x_i, c)

    Exercises the ordered transform + OrderedLogistic jointly in a
    regression (the zoo's ordered_logistic_eta fixes the cutpoints).
    Gold target is EXACT 3-d grid quadrature over (beta, c1, delta =
    c2 - c1 > 0) — the shear to (c1, delta) has unit Jacobian — with
    boundary-mass containment asserted."""
    from exmc_tpu.datasets import load_kilpisjarvi

    data = load_kilpisjarvi()
    temp = data["temp_summer"]
    year = data["year"].astype(np.float64)
    x = (year - year.mean()) / year.std()
    q1, q2 = np.quantile(temp, [1 / 3, 2 / 3])
    y = (temp > q1).astype(int) + (temp > q2).astype(int)

    betas = np.linspace(-1.2, 2.2, 121)
    c1s = np.linspace(-2.6, 1.6, 121)
    deltas = np.linspace(1e-3, 4.0, 121)

    def log_sig(z):
        return -np.log1p(np.exp(-np.abs(z))) + np.minimum(z, 0.0)

    B, C, D = np.meshgrid(betas, c1s, deltas, indexing="ij")
    ll = np.zeros_like(B)
    for xi, yi in zip(x, y):
        e1 = B * xi - C           # eta - c1
        if yi == 0:
            ll += log_sig(-e1)
        elif yi == 2:
            ll += log_sig(e1 - D)
        else:
            # log(sig(e1) - sig(e1 - D)), stable via logsig difference
            la, lb = log_sig(e1), log_sig(e1 - D)
            ll += la + np.log1p(-np.exp(np.minimum(lb - la, -1e-12)))
    lp = (ll - 0.5 * (B / 2.0) ** 2
          - 0.5 * (C / 5.0) ** 2 - 0.5 * ((C + D) / 5.0) ** 2)
    lp -= lp.max()
    w = np.exp(lp)
    w /= w.sum()
    edge = (w[0].sum() + w[-1].sum() + w[:, 0].sum() + w[:, -1].sum()
            + w[:, :, -1].sum())  # delta -> 0 edge is a real boundary
    assert edge < 1e-6, f"grid clipped the posterior (edge mass {edge:.2e})"

    b_mean = (w * B).sum()
    b_sd = np.sqrt((w * (B - b_mean) ** 2).sum())
    c1_mean = (w * C).sum()
    c1_sd = np.sqrt((w * (C - c1_mean) ** 2).sum())
    c2 = C + D
    c2_mean = (w * c2).sum()
    c2_sd = np.sqrt((w * (c2 - c2_mean) ** 2).sum())

    ir = Builder.new_ir()
    ir = Builder.rv(ir, "beta", dists.Normal, {"mu": 0.0, "sigma": 2.0})
    ir = Builder.rv(ir, "c", dists.Normal, {"mu": 0.0, "sigma": 5.0},
                    transform="ordered", shape=(2,))
    xj = np.asarray(x, np.float32)
    ir = Builder.det(ir, "eta", lambda b: b * xj, ["beta"])
    ir = Builder.rv(ir, "y", dists.OrderedLogistic,
                    {"eta": "eta", "cutpoints": "c"}, shape=(len(y),))
    ir = Builder.obs(ir, "y_obs", "y", y.astype(np.float64))
    return GoldStandard(
        "kilpisjarvi_ordinal", ir,
        {"beta": b_mean, "c": np.array([c1_mean, c2_mean])},
        {"beta": b_sd, "c": np.array([c1_sd, c2_sd])},
    )


EXTRA_GOLD_STANDARDS = [
    exponential_gamma,
    lognormal_conjugate,
    uniform01_bernoulli,
    custom_gaussian_conjugate,
    dirichlet_prior_moments,
    mvn_dense_mass,
    linreg_meas_obs_matmul,
    affine_meas_obs,
    studentt_loc,
    cauchy_loc,
    laplace_loc,
    weibull_rate,
    halfnormal_scale,
    truncnorm_loc,
    uniform_interval_normal,
    mixture_loc,
    censored_right_normal,
    censored_interval_normal,
    poisson_log_link,
    grw_kalman_t1000,
    stan_eight_schools,
    stan_uniform_normal,
    stan_logistic_1d,
    stan_eight_schools_ncp,
    stan_logistic_d21,
    funnel_v_marginal,
    radon_varying_intercept,
    kidiq_regression,
    flat_prior_normal,
    binomial_beta,
    inverse_gamma_variance,
    gumbel_loc,
    beta_binomial_conc,
    ordered_logistic_eta,
    negbin_rate,
    categorical_dirichlet,
    lkj_marginals,
    multinomial_dirichlet,
    ordered_normal_orderstats,
    zero_sum_normal_prior,
    kilpisjarvi_real_regression,
    diabetes_real_logistic,
    crossed_random_effects_lmm,
    avtest_binomial_glmm,
    kilpisjarvi_ordinal,
]

"""Univariate continuous distributions (13 of the reference's 21).

Parameterizations match the reference module-for-module (see
reference lib/exmc/dist/*.ex); every scale parameter is floored at 1e-30
(DECISIONS D55) and every logpdf is a pure jnp expression so the whole
model density fuses into one XLA computation.
"""

import math

import jax
import jax.numpy as jnp

from exmc_tpu import math as xm
from exmc_tpu.dists.base import Distribution, register


class Normal(Distribution):
    """Normal(mu, sigma) — reference normal.ex:15-24."""

    name = "normal"

    def logpdf(self, x, params):
        mu, sigma = params["mu"], xm.floor_scale(params["sigma"])
        z = (x - mu) / sigma
        return -0.5 * z * z - jnp.log(sigma) - xm.LOG_SQRT_2PI

    def sample(self, key, params, shape=()):
        return params["mu"] + params["sigma"] * jax.random.normal(key, shape)


class Flat(Distribution):
    """Improper uniform over the reals (Stan's implicit default prior).

    logpdf is identically zero; used by the Stan frontend's
    ``<offset=, multiplier=>`` affine-parameter lowering, where the
    density is supplied by a separate factor node over the constrained
    value. ``sample`` draws uniform(-2, 2) — Stan's unconstrained-init
    convention — so init machinery works; the prior itself is improper
    and has no normalizable sampler.
    """

    name = "flat"

    def logpdf(self, x, params):
        return jnp.zeros_like(x)

    def sample(self, key, params, shape=()):
        return jax.random.uniform(key, shape, minval=-2.0, maxval=2.0)


class HalfNormal(Distribution):
    """HalfNormal(sigma), x > 0 — reference half_normal.ex:15-28."""

    name = "half_normal"

    def logpdf(self, x, params):
        sigma = xm.floor_scale(params["sigma"])
        z = x / sigma
        return 0.5 * math.log(2.0 / math.pi) - jnp.log(sigma) - 0.5 * z * z

    def support(self, params):
        return "positive"

    def default_transform(self, params):
        return "softplus"

    def sample(self, key, params, shape=()):
        return params["sigma"] * jnp.abs(jax.random.normal(key, shape))


class Exponential(Distribution):
    """Exponential(lambda) with rate lambda — reference exponential.ex."""

    name = "exponential"

    def logpdf(self, x, params):
        lam = xm.floor_scale(params["lambda"])
        return jnp.log(lam) - lam * x

    def support(self, params):
        return "positive"

    def default_transform(self, params):
        return "log"

    def sample(self, key, params, shape=()):
        return jax.random.exponential(key, shape) / params["lambda"]


class Gamma(Distribution):
    """Gamma(alpha, beta) shape/rate — reference gamma.ex (lgamma-based)."""

    name = "gamma"

    def logpdf(self, x, params):
        alpha, beta = params["alpha"], xm.floor_scale(params["beta"])
        return (
            alpha * jnp.log(beta)
            + (alpha - 1.0) * jnp.log(x)
            - beta * x
            - xm.lgamma(alpha)
        )

    def support(self, params):
        return "positive"

    def default_transform(self, params):
        return "log"

    def sample(self, key, params, shape=()):
        return jax.random.gamma(key, params["alpha"], shape) / params["beta"]


class Beta(Distribution):
    """Beta(alpha, beta) on (0,1) — reference beta.ex (lbeta-based)."""

    name = "beta"

    def logpdf(self, x, params):
        a, b = params["alpha"], params["beta"]
        return (a - 1.0) * jnp.log(x) + (b - 1.0) * jnp.log1p(-x) - xm.lbeta(a, b)

    def support(self, params):
        return "unit"

    def default_transform(self, params):
        return "logit"

    def sample(self, key, params, shape=()):
        return jax.random.beta(key, params["alpha"], params["beta"], shape)


class Uniform01(Distribution):
    """Uniform on (0,1) — reference uniform01.ex (logpdf = 0)."""

    name = "uniform01"

    def logpdf(self, x, params):
        return jnp.zeros_like(x)

    def support(self, params):
        return "unit"

    def default_transform(self, params):
        return "logit"

    def sample(self, key, params, shape=()):
        return jax.random.uniform(key, shape)


class Uniform(Distribution):
    """Uniform(lower, upper) — general-bounds extension of the
    reference's Uniform01 (uniform01.ex): constant density
    ``-log(upper-lower)``; when bounds are compile-time constants the
    default transform is the bounded IntervalTransform so NUTS explores
    unconstrained space (ADVICE r1: Stan's ``y ~ uniform(a, b)``)."""

    name = "uniform"

    def logpdf(self, x, params):
        lower = params.get("lower", 0.0)
        upper = params.get("upper", 1.0)
        return -jnp.log(upper - lower) + jnp.zeros_like(x)

    def support(self, params):
        return "interval"

    def default_transform(self, params):
        lower = params.get("lower", 0.0)
        upper = params.get("upper", 1.0)
        if isinstance(lower, (int, float)) and isinstance(upper, (int, float)):
            from exmc_tpu.transforms import IntervalTransform

            if (lower, upper) == (0.0, 1.0):
                return "logit"
            return IntervalTransform(float(lower), float(upper))
        return None  # non-constant bounds: caller must constrain explicitly

    def sample(self, key, params, shape=()):
        lower = params.get("lower", 0.0)
        upper = params.get("upper", 1.0)
        return lower + (upper - lower) * jax.random.uniform(key, shape)


class StudentT(Distribution):
    """StudentT(df, loc, scale) — reference student_t.ex (lgamma-based)."""

    name = "student_t"

    def logpdf(self, x, params):
        df = params["df"]
        loc = params.get("loc", 0.0)
        scale = xm.floor_scale(params.get("scale", 1.0))
        z = (x - loc) / scale
        return (
            xm.lgamma((df + 1.0) / 2.0)
            - xm.lgamma(df / 2.0)
            - 0.5 * jnp.log(df * math.pi)
            - jnp.log(scale)
            - (df + 1.0) / 2.0 * jnp.log1p(z * z / df)
        )

    def sample(self, key, params, shape=()):
        loc = params.get("loc", 0.0)
        scale = params.get("scale", 1.0)
        return loc + scale * jax.random.t(key, params["df"], shape)


class Cauchy(Distribution):
    """Cauchy(loc, scale) — reference cauchy.ex."""

    name = "cauchy"

    def logpdf(self, x, params):
        loc = params.get("loc", 0.0)
        scale = xm.floor_scale(params["scale"])
        z = (x - loc) / scale
        return -jnp.log(math.pi * scale) - jnp.log1p(z * z)

    def sample(self, key, params, shape=()):
        loc = params.get("loc", 0.0)
        return loc + params["scale"] * jax.random.cauchy(key, shape)


class HalfCauchy(Distribution):
    """HalfCauchy(scale), x > 0 — reference half_cauchy.ex."""

    name = "half_cauchy"

    def logpdf(self, x, params):
        scale = xm.floor_scale(params["scale"])
        z = x / scale
        return math.log(2.0 / math.pi) - jnp.log(scale) - jnp.log1p(z * z)

    def support(self, params):
        return "positive"

    def default_transform(self, params):
        return "log"

    def sample(self, key, params, shape=()):
        return params["scale"] * jnp.abs(jax.random.cauchy(key, shape))


class LogNormal(Distribution):
    """LogNormal(mu, sigma), x > 0 — reference lognormal.ex."""

    name = "lognormal"

    def logpdf(self, x, params):
        mu, sigma = params["mu"], xm.floor_scale(params["sigma"])
        lx = jnp.log(x)
        z = (lx - mu) / sigma
        return -lx - jnp.log(sigma) - xm.LOG_SQRT_2PI - 0.5 * z * z

    def support(self, params):
        return "positive"

    def default_transform(self, params):
        return "log"

    def sample(self, key, params, shape=()):
        return jnp.exp(params["mu"] + params["sigma"] * jax.random.normal(key, shape))


class Laplace(Distribution):
    """Laplace(mu, b) — reference laplace.ex."""

    name = "laplace"

    def logpdf(self, x, params):
        mu, b = params["mu"], xm.floor_scale(params["b"])
        return -jnp.log(2.0 * b) - jnp.abs(x - mu) / b

    def sample(self, key, params, shape=()):
        return params["mu"] + params["b"] * jax.random.laplace(key, shape)


class TruncatedNormal(Distribution):
    """TruncatedNormal(mu, sigma, lower, upper) — reference
    truncated_normal.ex (erf-based normalization)."""

    name = "truncated_normal"

    def logpdf(self, x, params):
        mu, sigma = params["mu"], xm.floor_scale(params["sigma"])
        lower, upper = params["lower"], params["upper"]
        z = (x - mu) / sigma
        base = -0.5 * z * z - jnp.log(sigma) - xm.LOG_SQRT_2PI
        a = (lower - mu) / sigma
        b = (upper - mu) / sigma
        log_norm = jnp.log(xm.normal_cdf(b) - xm.normal_cdf(a))
        return base - log_norm

    def sample(self, key, params, shape=()):
        mu, sigma = params["mu"], params["sigma"]
        a = (params["lower"] - mu) / sigma
        b = (params["upper"] - mu) / sigma
        return mu + sigma * jax.random.truncated_normal(key, a, b, shape)


class Weibull(Distribution):
    """Weibull(k, lambda), x > 0 — reference weibull.ex:17-27; includes
    ``log_survival`` used by right-censored reliability obs (weibull.ex:50-53)."""

    name = "weibull"

    def logpdf(self, t, params):
        k, lam = params["k"], xm.floor_scale(params["lambda"])
        zt = t / lam
        return jnp.log(k) - jnp.log(lam) + (k - 1.0) * jnp.log(zt) - zt**k

    def log_survival(self, t, params):
        k, lam = params["k"], xm.floor_scale(params["lambda"])
        return -((t / lam) ** k)

    def log_cdf(self, t, params):
        return xm.log1mexp(self.log_survival(t, params))

    def support(self, params):
        return "positive"

    def default_transform(self, params):
        return "log"

    def sample(self, key, params, shape=()):
        u = jax.random.exponential(key, shape)  # -log U
        return params["lambda"] * u ** (1.0 / params["k"])


NORMAL = register(Normal())
FLAT = register(Flat())
HALF_NORMAL = register(HalfNormal())
EXPONENTIAL = register(Exponential())
GAMMA = register(Gamma())
BETA = register(Beta())
UNIFORM01 = register(Uniform01())
UNIFORM = register(Uniform())
STUDENT_T = register(StudentT())
CAUCHY = register(Cauchy())
HALF_CAUCHY = register(HalfCauchy())
LOGNORMAL = register(LogNormal())
LAPLACE = register(Laplace())
TRUNCATED_NORMAL = register(TruncatedNormal())
WEIBULL = register(Weibull())


class InverseGamma(Distribution):
    """InverseGamma(alpha, beta): x > 0, the conjugate prior for a
    Normal variance — beyond the reference (standard Stan/PyMC
    surface). p(x) = beta^alpha / Gamma(alpha) x^-(alpha+1) e^(-beta/x).
    """

    name = "inverse_gamma"

    def logpdf(self, x, params):
        alpha = params["alpha"]
        beta = xm.floor_scale(params["beta"])
        return (
            alpha * jnp.log(beta)
            - xm.lgamma(alpha)
            - (alpha + 1.0) * jnp.log(x)
            - beta / x
        )

    def support(self, params):
        return "positive"

    def default_transform(self, params):
        return "log"

    def sample(self, key, params, shape=()):
        return jnp.asarray(params["beta"]) / jax.random.gamma(
            key, params["alpha"], shape)


class Gumbel(Distribution):
    """Gumbel(loc, scale) extreme-value type-I — beyond the reference
    (standard Stan surface). logpdf = -log(s) - z - exp(-z)."""

    name = "gumbel"

    def logpdf(self, x, params):
        loc = params.get("loc", 0.0)
        scale = xm.floor_scale(params.get("scale", 1.0))
        z = (x - loc) / scale
        return -jnp.log(scale) - z - jnp.exp(-z)

    def sample(self, key, params, shape=()):
        loc = params.get("loc", 0.0)
        scale = params.get("scale", 1.0)
        return loc + scale * jax.random.gumbel(key, shape)


INVERSE_GAMMA = register(InverseGamma())
GUMBEL = register(Gumbel())

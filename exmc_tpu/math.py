"""Differentiable special-function helpers.

The reference hand-rolls a Lanczos lgamma and an Abramowitz-Stegun erfc
because Nx lacked them (reference math.ex:6-62, censored.ex:44-76).
On TPU we use XLA's native implementations via ``jax.scipy.special`` —
exact erf/gammaln kernels, fully differentiable, fused by XLA.
"""

import math

import jax.numpy as jnp
from jax.scipy import special as jsp

from exmc_tpu.config import SCALE_FLOOR

LOG_2PI = math.log(2.0 * math.pi)
LOG_SQRT_2PI = 0.5 * LOG_2PI
SQRT2 = math.sqrt(2.0)


def lgamma(x):
    """log Gamma(x). Replaces the reference's Lanczos(g=7) series (math.ex:28-56)."""
    return jsp.gammaln(x)


def lbeta(a, b):
    """log B(a, b) = lgamma(a) + lgamma(b) - lgamma(a+b) (reference math.ex:59-62)."""
    return jsp.gammaln(a) + jsp.gammaln(b) - jsp.gammaln(a + b)


def floor_scale(sigma):
    """Floor scale params at 1e-30 so a bad warmup point never divides by
    zero (reference DECISIONS D55, applied in every dist module)."""
    return jnp.maximum(sigma, SCALE_FLOOR)


def normal_cdf(z):
    """Phi(z) via exact erf (reference censored.ex:44-47 uses an A&S
    approximation with ~1.5e-7 error; XLA has the exact kernel)."""
    return jsp.ndtr(z)


def log_normal_cdf(z):
    """log Phi(z), stable in the deep lower tail (log_ndtr)."""
    return jsp.log_ndtr(z)


def log_normal_sf(z):
    """log(1 - Phi(z)) = log Phi(-z) (reference censored.ex:50-54)."""
    return jsp.log_ndtr(-z)


def logsumexp(x, axis=None):
    return jsp.logsumexp(x, axis=axis)


def log1mexp(x):
    """log(1 - exp(x)) for x <= 0, numerically stable."""
    return jnp.where(
        x > -math.log(2.0),
        jnp.log(-jnp.expm1(x)),
        jnp.log1p(-jnp.exp(x)),
    )


def logit(p):
    return jnp.log(p) - jnp.log1p(-p)


def softplus(x):
    return jnp.logaddexp(x, 0.0)


def inv_softplus(y):
    """Inverse of softplus: log(expm1(y)) = y + log(1 - exp(-y))."""
    return y + log1mexp(-y)

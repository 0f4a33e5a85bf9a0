"""Discrete distributions — observation-only likelihoods.

As in the reference (bernoulli.ex, poisson.ex), these are used as
likelihoods for observed data only; NUTS cannot sample discrete free RVs.
"""

import jax
import jax.numpy as jnp

from exmc_tpu import math as xm
from exmc_tpu.dists.base import Distribution, register


class Bernoulli(Distribution):
    """Bernoulli(p) — reference bernoulli.ex (logit default transform)."""

    name = "bernoulli"

    def logpdf(self, y, params):
        p = jnp.clip(params["p"], 1e-12, 1.0 - 1e-12)
        return y * jnp.log(p) + (1.0 - y) * jnp.log1p(-p)

    def support(self, params):
        return "unit"

    def default_transform(self, params):
        return "logit"

    def sample(self, key, params, shape=()):
        return jax.random.bernoulli(key, params["p"], shape).astype(jnp.float32)


class Poisson(Distribution):
    """Poisson(mu) — reference poisson.ex (rate param named ``mu``)."""

    name = "poisson"

    def logpdf(self, y, params):
        mu = xm.floor_scale(params["mu"])
        return y * jnp.log(mu) - mu - xm.lgamma(y + 1.0)

    def support(self, params):
        return "positive"

    def default_transform(self, params):
        return "log"

    def sample(self, key, params, shape=()):
        return jax.random.poisson(key, params["mu"], shape).astype(jnp.float32)


BERNOULLI = register(Bernoulli())
POISSON = register(Poisson())

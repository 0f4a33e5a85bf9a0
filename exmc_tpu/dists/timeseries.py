"""Time-series distributions: GaussianRandomWalk.

The reference computes the GRW logpdf as a vectorized first-difference
expression (gaussian_random_walk.ex:21-58); we do the same with
``jnp.diff`` so the T-step latent path (e.g. the d=102 stochastic
volatility benchmark) stays one fused VPU pass.
"""

import jax
import jax.numpy as jnp

from exmc_tpu import math as xm
from exmc_tpu.dists.base import Distribution, register


class GaussianRandomWalk(Distribution):
    """GaussianRandomWalk(sigma) over a length-T vector:
    x[0] ~ Normal(0, sigma); x[t] ~ Normal(x[t-1], sigma).
    Reference gaussian_random_walk.ex:21-58.
    """

    name = "gaussian_random_walk"

    def logpdf(self, x, params):
        sigma = xm.floor_scale(params["sigma"])
        increments = jnp.concatenate([x[..., :1], jnp.diff(x, axis=-1)], axis=-1)
        z = increments / sigma
        return jnp.sum(
            -0.5 * z * z - jnp.log(sigma) - xm.LOG_SQRT_2PI, axis=-1
        )

    def sample(self, key, params, shape=()):
        if not shape:
            steps = params["steps"]
            shape = (steps,)
        z = params["sigma"] * jax.random.normal(key, shape)
        return jnp.cumsum(z, axis=-1)


GAUSSIAN_RANDOM_WALK = register(GaussianRandomWalk())

"""Multivariate distributions: MvNormal, Dirichlet.

MvNormal keeps the reference's eager-parameter-preparation idea
(mv_normal.ex:41-50: cov -> precision + logdet *before* tracing) but uses
a Cholesky factor instead of an explicit inverse — the triangular solve
is both cheaper and better-conditioned, and under jit it is free to
compute at trace time when cov is constant.
"""

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

from exmc_tpu import math as xm
from exmc_tpu.dists.base import Distribution, register


class MvNormal(Distribution):
    """MvNormal(mu, cov) on R^d — reference mv_normal.ex.

    ``prepare_params`` converts {mu, cov} -> {mu, chol, log_det_cov} once
    at compile time (cf. mv_normal.ex prepare_params hooked at
    compiler.ex:477-483); logpdf then runs only a triangular solve + dot.
    """

    name = "mv_normal"

    def prepare_params(self, params):
        if "chol" in params:
            return params
        cov = jnp.asarray(params["cov"])
        chol = jnp.linalg.cholesky(cov)
        log_det_cov = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol)))
        return {"mu": params["mu"], "chol": chol, "log_det_cov": log_det_cov}

    def logpdf(self, x, params):
        params = self.prepare_params(params)
        mu, chol, log_det = params["mu"], params["chol"], params["log_det_cov"]
        d = mu.shape[-1]
        diff = x - mu
        w = solve_triangular(chol, diff, lower=True)
        mahal = jnp.sum(w * w, axis=-1)
        return -0.5 * (d * xm.LOG_2PI + log_det + mahal)

    def sample(self, key, params, shape=()):
        if "cov" in params:
            chol = jnp.linalg.cholesky(jnp.asarray(params["cov"]))
        else:
            chol = params["chol"]
        mu = jnp.asarray(params["mu"])
        z = jax.random.normal(key, tuple(shape) if shape else mu.shape)
        return mu + z @ chol.T


class Dirichlet(Distribution):
    """Dirichlet(alpha) on the simplex Delta^K — reference dirichlet.ex.

    Default transform is stick_breaking (K constrained -> K-1
    unconstrained dims, reference transform.ex:84-100).
    """

    name = "dirichlet"

    def logpdf(self, x, params):
        alpha = jnp.asarray(params["alpha"])
        log_norm = jnp.sum(xm.lgamma(alpha), axis=-1) - xm.lgamma(
            jnp.sum(alpha, axis=-1)
        )
        return jnp.sum((alpha - 1.0) * jnp.log(x), axis=-1) - log_norm

    def support(self, params):
        return "simplex"

    def default_transform(self, params):
        return "stick_breaking"

    def sample(self, key, params, shape=()):
        alpha = jnp.asarray(params["alpha"])
        return jax.random.dirichlet(key, alpha, shape[:-1] if shape else ())


MV_NORMAL = register(MvNormal())
DIRICHLET = register(Dirichlet())

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
        mu, chol = jnp.asarray(params["mu"]), params["chol"]
        log_det = params.get("log_det_cov")
        if log_det is None:
            # chol passed directly (e.g. a sampled LKJCholesky ref):
            # prepare_params could not precompute the determinant
            log_det = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol)))
        d = mu.shape[-1]
        diff = x - mu
        if diff.ndim == 1:
            w = solve_triangular(chol, diff, lower=True)
        else:
            # batched rows (n, d) against one (d, d) factor: solve all
            # rows as the columns of one matrix b (triangular_solve does
            # not broadcast batch dims)
            flat = diff.reshape(-1, d)
            w = solve_triangular(chol, flat.T, lower=True).T.reshape(
                diff.shape)
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


class Multinomial(Distribution):
    """Multinomial(n, p) over count vectors summing to n — beyond the
    reference; completes the Dirichlet-conjugate family (obs-only
    likelihood, like Bernoulli/Poisson)."""

    name = "multinomial"

    def logpdf(self, y, params):
        p = jnp.asarray(params["p"])
        n = jnp.sum(y, axis=-1)
        eps = jnp.finfo(jnp.result_type(p, jnp.float32)).eps
        comb = xm.lgamma(n + 1.0) - jnp.sum(xm.lgamma(y + 1.0), axis=-1)
        return comb + jnp.sum(y * jnp.log(jnp.clip(p, eps, 1.0)), axis=-1)

    def support(self, params):
        return "simplex"

    def default_transform(self, params):
        return "stick_breaking"

    def sample(self, key, params, shape=()):
        p = jnp.asarray(params["p"])
        n = jnp.asarray(params["n"], jnp.float32)
        batch = tuple(shape[:-1]) if shape else ()
        return jax.random.multinomial(
            key, n, p, shape=batch + p.shape[-1:]).astype(jnp.float32)


class ZeroSumNormal(Distribution):
    """Exchangeable normal constrained to sum(x) = 0 (PyMC's
    ZeroSumNormal) — the identifiable prior for categorical effects
    alongside an intercept; beyond the reference. Requires an explicit
    ``shape=(K,)``; default transform ``zero_sum`` (isometric, zero
    Jacobian), so the density on the K-1 free coordinates is iid
    N(0, sigma): logpdf(x) = -(K-1)/2 log(2 pi sigma^2)
    - |x|^2 / (2 sigma^2). Marginals: Var[x_k] = sigma^2 (1 - 1/K)."""

    name = "zero_sum_normal"

    def logpdf(self, x, params):
        sigma = xm.floor_scale(params.get("sigma", 1.0))
        k = x.shape[-1]
        return (-(k - 1) / 2.0 * (xm.LOG_2PI + 2.0 * jnp.log(sigma))
                - 0.5 * jnp.sum(x * x, axis=-1) / (sigma * sigma))

    def support(self, params):
        return "zero_sum"

    def default_transform(self, params):
        return "zero_sum"

    def sample(self, key, params, shape=()):
        from exmc_tpu.transforms import ZERO_SUM

        sigma = params.get("sigma", 1.0)
        if len(shape) == 0:
            raise ValueError("ZeroSumNormal.sample needs shape=(..., K)")
        z = sigma * jax.random.normal(key, tuple(shape[:-1]) + (shape[-1] - 1,))
        return ZERO_SUM.forward(z)


MV_NORMAL = register(MvNormal())
DIRICHLET = register(Dirichlet())
MULTINOMIAL = register(Multinomial())
ZERO_SUM_NORMAL = register(ZeroSumNormal())


class LKJCholesky(Distribution):
    """LKJ prior on the Cholesky factor L of a correlation matrix
    (Lewandowski-Kurowicka-Joe 2009; Stan lkj_corr_cholesky) — beyond
    the reference (no correlation-matrix support there). Requires an
    explicit ``shape=(d, d)``; default transform ``cholesky_corr``.

    logpdf (unnormalized — the constant depends only on (eta, d), so
    ``eta`` must be a fixed number, not a sampled ref):
        sum_{i=1}^{d-1} (d - i + 2*eta - 3) * log L[i, i]

    Under the canonical-partial-correlation construction the column-j
    CPCs are independent scaled Beta(b_j, b_j) on (-1, 1) with
    b_j = eta + (d - j - 2)/2 (0-indexed j), so every marginal
    correlation r_ij is Beta(eta - 1 + d/2, .) scaled: mean 0,
    sd 1/sqrt(2*eta + d - 1) — the exact targets the gold model checks.
    """

    name = "lkj_cholesky"

    def validate_ir_params(self, params):
        if isinstance(params.get("eta"), str):
            raise ValueError(
                "LKJCholesky eta must be a fixed constant, not a sampled "
                "parameter ref: the logpdf drops the eta-dependent "
                "normalizing constant c(eta, d), so a posterior over eta "
                "would be silently wrong (code-review r3)"
            )

    def logpdf(self, L, params):
        eta = params["eta"]
        d = L.shape[-1]
        diag = jnp.diagonal(L, axis1=-2, axis2=-1)
        i = jnp.arange(d, dtype=L.dtype)
        coeff = d - i + 2.0 * eta - 3.0
        # row 0 has L[0,0] = 1 (log = 0), coefficient irrelevant
        return jnp.sum(coeff * jnp.log(jnp.maximum(diag, 1e-30)), axis=-1)

    def support(self, params):
        return "cholesky_corr"

    def default_transform(self, params):
        return "cholesky_corr"

    def sample(self, key, params, shape=()):
        from exmc_tpu.transforms import CHOLESKY_CORR

        eta = params["eta"]
        if len(shape) < 2 or shape[-1] != shape[-2]:
            raise ValueError("LKJCholesky.sample needs shape=(..., d, d)")
        d = shape[-1]
        batch = shape[:-2]
        # column-j CPC ~ 2*Beta(b_j, b_j) - 1, b_j = eta + (d - j - 2)/2
        xs = []
        for i in range(1, d):
            for j in range(i):
                b = eta + (d - j - 2) / 2.0
                key, sub = jax.random.split(key)
                xs.append(2.0 * jax.random.beta(sub, b, b, batch) - 1.0)
        x = jnp.stack(xs, axis=-1)
        return CHOLESKY_CORR.forward(jnp.arctanh(
            jnp.clip(x, -1.0 + 1e-7, 1.0 - 1e-7)))


LKJ_CHOLESKY = register(LKJCholesky())

"""Discrete distributions — observation-only likelihoods.

As in the reference (bernoulli.ex, poisson.ex), these are used as
likelihoods for observed data only; NUTS cannot sample discrete free RVs.
"""

import jax
import jax.numpy as jnp

from exmc_tpu import math as xm
from exmc_tpu.dists.base import Distribution, register


class Bernoulli(Distribution):
    """Bernoulli(p) — reference bernoulli.ex (logit default transform).

    Also accepts ``logits`` instead of ``p`` for the numerically stable
    log-sigmoid path (essential in f32: clipping p at 1-1e-12 rounds to
    exactly 1.0 in float32 and log1p(-p) returns -inf at moderate
    logits — the bug class DECISIONS D53-55 warns about)."""

    name = "bernoulli"

    def logpdf(self, y, params):
        if "logits" in params:
            eta = params["logits"]
            # y*logsigmoid(eta) + (1-y)*logsigmoid(-eta)
            return y * eta - jnp.logaddexp(0.0, eta)
        p = jnp.asarray(params["p"])
        eps = jnp.finfo(jnp.result_type(p, jnp.float32)).eps
        p = jnp.clip(p, eps, 1.0 - eps)
        return y * jnp.log(p) + (1.0 - y) * jnp.log1p(-p)

    def support(self, params):
        return "unit"

    def default_transform(self, params):
        return "logit"

    def sample(self, key, params, shape=()):
        if "logits" in params:
            p = jax.nn.sigmoid(jnp.asarray(params["logits"]))
        else:
            p = params["p"]
        return jax.random.bernoulli(key, p, shape).astype(jnp.float32)


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


class Binomial(Distribution):
    """Binomial(n, p) likelihood — beyond the reference's 21 dists (the
    first likelihood a PyMC user reaches for after Bernoulli). Accepts
    ``logits`` like Bernoulli for the stable log-sigmoid path."""

    name = "binomial"

    def logpdf(self, y, params):
        n = jnp.asarray(params["n"])
        comb = xm.lgamma(n + 1.0) - xm.lgamma(y + 1.0) - xm.lgamma(n - y + 1.0)
        if "logits" in params:
            eta = params["logits"]
            return comb + y * eta - n * jnp.logaddexp(0.0, eta)
        p = jnp.asarray(params["p"])
        eps = jnp.finfo(jnp.result_type(p, jnp.float32)).eps
        p = jnp.clip(p, eps, 1.0 - eps)
        return comb + y * jnp.log(p) + (n - y) * jnp.log1p(-p)

    def support(self, params):
        return "unit"

    def default_transform(self, params):
        return "logit"

    def sample(self, key, params, shape=()):
        if "logits" in params:
            p = jax.nn.sigmoid(jnp.asarray(params["logits"]))
        else:
            p = jnp.asarray(params["p"])
        n = jnp.asarray(params["n"])
        shp = tuple(shape) if shape else jnp.broadcast_shapes(
            jnp.shape(n), jnp.shape(p))
        return jax.random.binomial(key, n, p, shp).astype(jnp.float32)


class NegativeBinomial(Distribution):
    """NegativeBinomial(mu, alpha) — PyMC's mean/overdispersion
    parameterization (alpha -> inf recovers Poisson(mu)); beyond the
    reference. y ~ NB: p(y) = C(y+alpha-1, y) (alpha/(alpha+mu))^alpha
    (mu/(alpha+mu))^y."""

    name = "negative_binomial"

    def logpdf(self, y, params):
        mu = xm.floor_scale(params["mu"])
        alpha = xm.floor_scale(params["alpha"])
        comb = (xm.lgamma(y + alpha) - xm.lgamma(alpha)
                - xm.lgamma(y + 1.0))
        return (comb + alpha * (jnp.log(alpha) - jnp.log(alpha + mu))
                + y * (jnp.log(mu) - jnp.log(alpha + mu)))

    def support(self, params):
        return "positive"

    def default_transform(self, params):
        return "log"

    def sample(self, key, params, shape=()):
        # gamma-Poisson mixture: lam ~ Gamma(alpha, alpha/mu), y ~ Poisson(lam)
        mu = jnp.asarray(params["mu"])
        alpha = jnp.asarray(params["alpha"])
        k1, k2 = jax.random.split(key)
        lam = jax.random.gamma(k1, alpha, shape) * (mu / alpha)
        return jax.random.poisson(k2, lam).astype(jnp.float32)


class Categorical(Distribution):
    """Categorical(p) over {0..K-1} — beyond the reference. ``p`` is a
    length-K probability vector (typically a Dirichlet RV ref or a
    softmax det node); y is integer-coded. Also accepts ``logits``."""

    name = "categorical"

    def logpdf(self, y, params):
        if "logits" in params:
            logp = jax.nn.log_softmax(jnp.asarray(params["logits"]), axis=-1)
        else:
            p = jnp.asarray(params["p"])
            eps = jnp.finfo(jnp.result_type(p, jnp.float32)).eps
            logp = jnp.log(jnp.clip(p, eps, 1.0))
        y = jnp.asarray(y, jnp.int32)
        return jnp.take_along_axis(
            jnp.broadcast_to(logp, y.shape + logp.shape[-1:]),
            y[..., None], axis=-1)[..., 0]

    def support(self, params):
        return "simplex"

    def default_transform(self, params):
        return "stick_breaking"

    def sample(self, key, params, shape=()):
        if "logits" in params:
            logits = jnp.asarray(params["logits"])
        else:
            p = jnp.asarray(params["p"])
            logits = jnp.log(jnp.clip(p, 1e-30, 1.0))
        return jax.random.categorical(key, logits, shape=shape or None).astype(
            jnp.float32)


BINOMIAL = register(Binomial())
NEGATIVE_BINOMIAL = register(NegativeBinomial())
CATEGORICAL = register(Categorical())


class BetaBinomial(Distribution):
    """BetaBinomial(n, alpha, beta): Binomial with a Beta-marginalized
    success probability — beyond the reference (standard Stan surface
    for overdispersed counts). pmf = C(n,k) B(k+a, n-k+b) / B(a,b)."""

    name = "beta_binomial"

    def logpdf(self, y, params):
        n = jnp.asarray(params["n"])
        a = xm.floor_scale(params["alpha"])
        b = xm.floor_scale(params["beta"])
        comb = xm.lgamma(n + 1.0) - xm.lgamma(y + 1.0) - xm.lgamma(
            n - y + 1.0)
        return comb + xm.lbeta(y + a, n - y + b) - xm.lbeta(a, b)

    def sample(self, key, params, shape=()):
        k1, k2 = jax.random.split(key)
        p = jax.random.beta(k1, params["alpha"], params["beta"], shape)
        # jax.random.binomial broadcasts n, so per-observation trial
        # counts work here exactly as in logpdf
        n = jnp.asarray(params["n"], jnp.float32)
        return jax.random.binomial(k2, n, p, shape or None).astype(
            jnp.float32)


class OrderedLogistic(Distribution):
    """OrderedLogistic(eta, cutpoints): ordinal outcome y in 0..K-1
    (NOTE: 0-indexed here; the Stan frontend shifts its 1-indexed data)
    with K-1 ORDERED cutpoints — pair with the ordered transform for
    sampled cutpoints. Beyond the reference (standard Stan surface).

    P(y = k) = sigmoid(eta - c_k) - sigmoid(eta - c_{k+1}) with the
    cutpoint vector padded by -inf/+inf; computed in log space via
    log-sigmoid differences (f32-stable at extreme eta - c)."""

    name = "ordered_logistic"

    def logpdf(self, y, params):
        eta = jnp.asarray(params["eta"])
        c = jnp.asarray(params["cutpoints"])
        y = jnp.asarray(y).astype(jnp.int32)
        eta = jnp.broadcast_to(eta, y.shape)  # scalar eta, vector y
        # log sigmoid(eta - c_k) for the padded cutpoint ladder:
        # k=0 -> 0 (sigmoid of +inf), k=K -> -inf-ish handled by gather
        la_all = -jnp.logaddexp(0.0, -(eta[..., None] - c))  # (..., K-1)
        pad_lo = jnp.zeros(la_all.shape[:-1] + (1,), la_all.dtype)
        la = jnp.concatenate([pad_lo, la_all], axis=-1)  # log sig, k=0..K-1
        # log(sig_k - sig_{k+1}) = la_k + log1p(-exp(la_{k+1} - la_k));
        # the ladder is strictly decreasing so the diff is positive
        K = la.shape[-1]
        lb = jnp.concatenate(
            [la_all, jnp.full(la_all.shape[:-1] + (1,), -jnp.inf,
                              la_all.dtype)], axis=-1)
        log_p = la + jnp.log1p(
            -jnp.exp(jnp.minimum(lb - la, -1e-7)))
        return jnp.take_along_axis(log_p, y[..., None], axis=-1)[..., 0]

    def sample(self, key, params, shape=()):
        eta = jnp.asarray(params["eta"])
        c = jnp.asarray(params["cutpoints"])
        probs_hi = jax.nn.sigmoid(eta[..., None] - c)
        sig = jnp.concatenate(
            [jnp.ones_like(probs_hi[..., :1]), probs_hi,
             jnp.zeros_like(probs_hi[..., :1])], axis=-1)
        p = sig[..., :-1] - sig[..., 1:]
        logits = jnp.log(jnp.clip(p, 1e-30, 1.0))
        out = jax.random.categorical(key, logits, shape=shape or None)
        return out.astype(jnp.float32)


BETA_BINOMIAL = register(BetaBinomial())
ORDERED_LOGISTIC = register(OrderedLogistic())

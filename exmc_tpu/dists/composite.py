"""Composite distributions: Mixture, Censored, Custom.

* Mixture — logsumexp over component log-densities (reference mixture.ex:12-25).
* Censored — CDF/SF-based likelihoods for right/left/interval censoring,
  triggered by obs meta ``censored=`` (reference censored.ex:17-42,
  compiler.ex:274-277,299-313).
* Custom — user-supplied logpdf closure; the escape hatch that carried the
  reference's logistic/funnel/SV benchmarks (reference custom.ex, cited at
  STANDARD_BENCHMARKS.md:89). In JAX the closure is just a traceable
  function; observation data registered via ``Builder.data`` is passed to
  the closure as a keyword (the analogue of the reference's "__obs_data"
  value-map key, compiler.ex:114-119).
"""

import inspect

import jax
import jax.numpy as jnp

from exmc_tpu import math as xm
from exmc_tpu.dists.base import Distribution, register, get as get_dist


class Mixture(Distribution):
    """Finite mixture: logsumexp_k(log w_k + logpdf_k(x)) — reference mixture.ex.

    params: {"components": [dist, ...], "params": [params_k, ...],
             "weights": array[K]}  (weights may be a string ref, e.g. to a
             Dirichlet RV, resolved by the compiler before this is called).
    """

    name = "mixture"

    def logpdf(self, x, params):
        components = [get_dist(c) for c in params["components"]]
        comp_params = params["params"]
        log_w = jnp.log(jnp.asarray(params["weights"]))
        lps = [
            d.logpdf(x, p) + log_w[..., k]
            for k, (d, p) in enumerate(zip(components, comp_params))
        ]
        return xm.logsumexp(jnp.stack(lps, axis=0), axis=0)

    def support(self, params):
        return get_dist(params["components"][0]).support(params["params"][0])

    def default_transform(self, params):
        return get_dist(params["components"][0]).default_transform(params["params"][0])

    def sample(self, key, params, shape=()):
        components = [get_dist(c) for c in params["components"]]
        comp_params = params["params"]
        k_key, *s_keys = jax.random.split(key, len(components) + 1)
        w = jnp.asarray(params["weights"])
        idx = jax.random.categorical(k_key, jnp.log(w), shape=shape)
        draws = jnp.stack(
            [d.sample(sk, p, shape) for d, p, sk in zip(components, comp_params, s_keys)],
            axis=0,
        )
        return jnp.take_along_axis(
            draws, idx[None].astype(jnp.int32), axis=0
        ).squeeze(0) if shape else draws[idx]


class Censored(Distribution):
    """Censored observation likelihoods (reference censored.ex:17-42).

    right at c:    logp = log SF(c)
    left at c:     logp = log CDF(c)
    interval:      logp = log(CDF(b) - CDF(a)), value = {"lower", "upper"}

    Dispatches to the base dist's ``log_survival``/``log_cdf`` when it has
    one (e.g. Weibull reliability, weibull.ex:50-53), else uses the exact
    Normal log-CDF via log_ndtr (the reference used an Abramowitz-Stegun
    erfc approximation, censored.ex:59-76; XLA has the exact kernel).
    """

    name = "censored"

    def log_likelihood(self, censor_type, value, dist, params):
        dist = get_dist(dist)
        if censor_type == "right":
            if hasattr(dist, "log_survival"):
                return dist.log_survival(value, params)
            return self._normal_log_sf(value, params)
        if censor_type == "left":
            if hasattr(dist, "log_cdf"):
                return dist.log_cdf(value, params)
            return self._normal_log_cdf(value, params)
        if censor_type == "interval":
            lower, upper = value["lower"], value["upper"]
            if hasattr(dist, "log_cdf"):
                lc_hi = dist.log_cdf(upper, params)
                lc_lo = dist.log_cdf(lower, params)
                return lc_hi + xm.log1mexp(lc_lo - lc_hi)
            mu, sigma = params["mu"], xm.floor_scale(params["sigma"])
            z_lo = (lower - mu) / sigma
            z_hi = (upper - mu) / sigma
            return jnp.log(xm.normal_cdf(z_hi) - xm.normal_cdf(z_lo))
        raise ValueError(f"unknown censor type: {censor_type!r}")

    @staticmethod
    def _z(value, params):
        mu = params.get("mu", 0.0)
        sigma = xm.floor_scale(params["sigma"])
        return (value - mu) / sigma

    def _normal_log_sf(self, value, params):
        return xm.log_normal_sf(self._z(value, params))

    def _normal_log_cdf(self, value, params):
        return xm.log_normal_cdf(self._z(value, params))


class Custom(Distribution):
    """User-defined density (reference custom.ex:30-95).

    Construct with closures::

        Custom(logpdf_fn=lambda x, params, data=None: ...,
               support="real", transform=None, sample_fn=None)

    ``logpdf_fn`` may accept an optional ``data`` keyword to receive the
    IR-level observation data registered with ``Builder.data`` — the
    TPU-native analogue of the reference's "__obs_data" key. Because JAX
    models are pure functions of arrays, Custom densities serialize across
    hosts for free (the reference's "closure barrier",
    DISTRIBUTED_BENCHMARKS.md:110-142, does not exist here).
    """

    name = "custom"

    def __init__(self, logpdf_fn, support="real", transform=None, sample_fn=None):
        self.logpdf_fn = logpdf_fn
        self._support = support
        self._transform = transform
        self.sample_fn = sample_fn
        self._wants_data = "data" in inspect.signature(logpdf_fn).parameters

    def logpdf(self, x, params):
        data = params.get("__data__") if isinstance(params, dict) else None
        user_params = {k: v for k, v in params.items() if k != "__data__"}
        if self._wants_data:
            return self.logpdf_fn(x, user_params, data=data)
        return self.logpdf_fn(x, user_params)

    def support(self, params):
        return self._support

    def default_transform(self, params):
        return self._transform

    def sample(self, key, params, shape=()):
        if self.sample_fn is None:
            raise NotImplementedError("Custom dist has no sample_fn")
        return self.sample_fn(key, params, shape)


MIXTURE = register(Mixture())
CENSORED = register(Censored())

"""Distribution protocol.

Mirrors the reference ``Exmc.Dist`` behaviour (reference dist.ex:6-10):
``logpdf(value, params)``, ``support(params)``, ``transform(params)``
(the default constraint transform attached by the rewrite pass), and an
optional ``sample``. Differences from the reference, by design:

* ``sample`` takes a ``jax.random`` key and a shape and is itself
  jit/vmap-compatible — replacing the reference's host-side ``:rand``
  samplers (e.g. normal.ex:33-39) so prior/posterior-predictive draws
  run on-device in bulk.
* ``prepare_params`` is an eager hook run once at compile time
  (MvNormal cov -> (chol, logdet); reference mv_normal.ex:41-50).

All logpdfs are pure jnp expressions, differentiable end-to-end; they
return an array with the same batch shape as ``value`` (scalar obs ->
scalar logp; vector obs -> per-element logp, reduced later by obs meta,
reference compiler.ex:401-418).
"""


class Distribution:
    name = "distribution"
    # parameters are dicts: name -> array | python number | string ref

    def logpdf(self, value, params):
        raise NotImplementedError

    def support(self, params):
        """One of: "real", "positive", "unit", "simplex", or a custom tag."""
        return "real"

    def default_transform(self, params):
        """Name of the default constraint transform, or None."""
        return None

    def sample(self, key, params, shape=()):
        raise NotImplementedError(f"{self.name} has no sampler")

    def prepare_params(self, params):
        """Eagerly pre-process constant params at compile time."""
        return params

    def validate_ir_params(self, params):
        """Compile-time check on RAW IR params (string refs intact);
        raise for parameterizations the logpdf cannot honor."""

    def __repr__(self):
        return f"<dist:{self.name}>"


_REGISTRY = {}


def register(dist):
    _REGISTRY[dist.name] = dist
    return dist


def get(name):
    if isinstance(name, Distribution):
        return name
    try:
        return _REGISTRY[name]
    except KeyError:
        raise ValueError(f"unknown distribution: {name!r}") from None


def all_dists():
    return dict(_REGISTRY)

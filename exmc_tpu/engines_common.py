"""Shared machinery for the many-chain ensemble engines (ChEES, MEADS).

Both engines have the same outer shape — a jitted two-scan kernel keyed
by (model signature, hyperparameters) in a small LRU cache, and a
postprocessing step that moves the sampling-scan outputs to
chains-first and constrains the flat draws. Factored here so a fix to
either lands once (review finding, round 4: the cache and postprocess
blocks were near-verbatim duplicates across chees.py/meads.py).
"""

from collections import OrderedDict

import numpy as np
import jax
import jax.numpy as jnp

from exmc_tpu.compiler import CompiledModel, constrain_flat
from exmc_tpu.config import default_dtype


class KernelCache:
    """LRU of (model, jitted run) keyed like the NUTS sampler cache.

    Without this every ``sample_*`` call re-traces the whole kernel
    (jit wraps a fresh closure per call — measured ~0.5 s/call retrace
    on CPU, which skewed the first committed CHEES_BENCH against ChEES
    while NUTS rode its sampler cache)."""

    def __init__(self, maxsize=8):
        self._cache = OrderedDict()
        self._maxsize = maxsize

    def clear(self):
        self._cache.clear()

    @staticmethod
    def model_sig(ir, ncp):
        """Cache signature for the model argument: identity for
        precompiled models, structural IR signature otherwise."""
        from exmc_tpu.nuts.sampler import ir_signature

        if isinstance(ir, CompiledModel):
            return ("model-id", id(ir))
        return ("ir", ir_signature(ir), bool(ncp))

    def get_or_build(self, key, model, builder):
        """Return the cached (model, run) for ``key`` or jit
        ``builder()`` and cache it. The dtype is appended to the key
        automatically (a default_dtype flip must not hit stale
        kernels)."""
        key = key + (np.dtype(default_dtype()).name,)
        hit = self._cache.get(key)
        if hit is not None:
            self._cache.move_to_end(key)
            return hit
        run = jax.jit(builder())
        self._cache[key] = (model, run)
        while len(self._cache) > self._maxsize:
            self._cache.popitem(last=False)
        return model, run


def postprocess_ensemble(outs, model, data, num_chains, num_samples,
                         return_unconstrained, extra_stats):
    """Sampling-scan outputs (samples, chains, ...) -> the (trace,
    stats) pair both engines return: chains-first stats arrays, the
    per-chain divergence count, and constrained named draws (unless
    ``return_unconstrained``)."""
    def post(a):
        return np.moveaxis(np.asarray(a), 0, 1)

    draws = post(outs["q"])
    stats = {
        "logp": post(outs["logp"]),
        "accept_prob": post(outs["accept_prob"]),
        "diverging": post(outs["diverging"]),
        "energy": post(outs["energy"]),
    }
    stats.update(extra_stats)
    stats["divergences"] = stats["diverging"].sum(axis=-1)

    if return_unconstrained:
        return draws, stats
    d = model.size
    dtype = default_dtype()
    flat = draws.reshape(-1, d)
    named = jax.vmap(lambda f: constrain_flat(model.ir, model.pm, f, data))(
        jnp.asarray(flat, dtype))
    trace = {
        k: np.asarray(v).reshape((num_chains, num_samples) + v.shape[1:])
        for k, v in named.items()
    }
    return trace, stats

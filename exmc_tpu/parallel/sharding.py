"""Mesh + sharding primitives.

Axes convention:
    "dp" — chain parallelism (the reference's process/node-parallel
           chains, sampler.ex:992-1176 / distributed.ex)
    "sp" — data (likelihood) parallelism for large-n models (the
           reference had no analogue; its d=21 logistic benchmark was
           0.21x PyMC partly because one BEAM node scored all 500 rows —
           here the rows shard across chips and one psum combines them)
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map


def make_mesh(n_devices=None, dp=None, sp=1, devices=None):
    """Build a (dp, sp) mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    if dp is None:
        dp = n_devices // sp
    assert dp * sp == n_devices, f"dp({dp}) * sp({sp}) != {n_devices}"
    arr = np.asarray(devices).reshape(dp, sp)
    return Mesh(arr, axis_names=("dp", "sp"))


def make_data_parallel_vag(model, mesh):
    """Build ``vag(q, data) -> (logp, grad)`` over ICI-sharded data.

    ``data`` (n, ...) is split over the "sp" axis; each device evaluates
    the model's log-density on its shard (data enters as a JIT argument,
    D69) and partial values/grads are psum'ed. Requires the model's obs
    terms to be additive over data rows (reduce="sum", the default for
    vector obs — builder.ex:97-102 D34) and data registered via
    ``Builder.data``.

    Prior terms are counted once: each shard evaluates prior + local
    likelihood, and the duplicated prior is corrected after the psum
    (an empty data shard zeroes every obs term, leaving just the prior).

    Composes under vmap (chain batching) and GSPMD "dp" sharding — this
    is the product path behind ``sample_chains_sharded(..., sp>1)``
    (reference distributed.ex:56-209 had no likelihood sharding at all).
    """
    sp = mesh.shape["sp"]

    def local_vag(q, data_shard):
        # full logp on the shard: prior + shard likelihood
        return jax.value_and_grad(lambda qq: model.logp(qq, data_shard))(q)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P("sp")),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def vag_sharded(q, data_arr):
        v, g = local_vag(q, data_arr)
        v = jax.lax.psum(v, "sp")
        g = jax.lax.psum(g, "sp")
        return v, g

    @jax.jit
    def vag(q, data):
        # jitted at the wrapper level: an eager call would re-trace the
        # prior-dedup value_and_grad closure on EVERY evaluation
        # (measured 820 ms/call vs 14 ms single-device on the virtual
        # mesh before this; inside the NUTS pipeline the enclosing jit
        # already absorbed it)
        assert data.shape[0] % sp == 0, (
            f"data rows {data.shape[0]} not divisible by sp={sp}"
        )
        v, g = vag_sharded(q, data)
        if sp > 1:
            # prior was summed sp times; subtract the extra (sp-1) copies
            empty = jnp.zeros((0,) + data.shape[1:], data.dtype)
            pv, pg = jax.value_and_grad(lambda qq: model.logp(qq, empty))(q)
            v = v - (sp - 1) * pv
            g = g - (sp - 1) * pg
        return v, g

    return vag


def shard_data(mesh, data):
    """Place an (n, ...) data array row-sharded over "sp"."""
    return jax.device_put(jnp.asarray(data), NamedSharding(mesh, P("sp")))


def data_parallel_vag(model, mesh, data):
    """Closure form of :func:`make_data_parallel_vag` (round-1 API):
    returns (vag_fn(q) -> (logp, grad), sharded_data)."""
    vag = make_data_parallel_vag(model, mesh)
    sharded = shard_data(mesh, data)
    return (lambda q: vag(q, sharded)), sharded


def shard_chains(mesh, *arrays):
    """Place chain-major arrays with the chain axis sharded over "dp"
    (tuning broadcast = replicated trailing axes, the ICI analogue of the
    reference's :erpc tuning broadcast, distributed.ex:126-156)."""
    out = []
    for a in arrays:
        spec = P("dp", *([None] * (a.ndim - 1)))
        out.append(jax.device_put(a, NamedSharding(mesh, spec)))
    return tuple(out)

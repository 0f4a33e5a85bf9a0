"""PointMap: bijection between the flat unconstrained vector and named values.

The flat unconstrained vector is the sole interface between the compiler
and every sampler (reference DECISIONS D10/D15). Free RVs are the RV
nodes not targeted by any observation (point_map.ex:124-145, D9), sorted
alphabetically for a deterministic layout (point_map.ex:36-37, D13).

Entries carry static (offset, length, shapes, transform) metadata, so
``unpack`` compiles to static slices + reshapes — fully differentiable
and free under XLA (the reference needed Nx.slice closures,
point_map.ex:85-91).
"""

from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

from exmc_tpu import transforms as tf
from exmc_tpu.config import default_dtype
from exmc_tpu.dists.base import get as get_dist
from exmc_tpu.ir import IR, free_rv_nodes


@dataclass(frozen=True)
class Entry:
    id: str
    offset: int
    length: int
    shape: tuple                 # constrained shape
    ushape: tuple                # unconstrained shape
    transform: object = None     # name (str), Transform instance, or None


def _infer_shape(node):
    """Event shape: declared node.shape, else inferred from constant params
    (vector-valued dists like MvNormal/Dirichlet), else scalar."""
    if node.shape is not None:
        return tuple(node.shape)
    dist = get_dist(node.op[1])
    params = node.op[2]
    if dist.name == "mv_normal" and not isinstance(params.get("mu"), str):
        return tuple(np.asarray(params["mu"]).shape)
    if dist.name == "dirichlet" and not isinstance(params.get("alpha"), str):
        return tuple(np.asarray(params["alpha"]).shape)
    if dist.name == "gaussian_random_walk":
        raise ValueError(
            f"GaussianRandomWalk RV {node.id!r} requires an explicit shape"
        )
    if dist.name == "lkj_cholesky":
        raise ValueError(
            f"LKJCholesky RV {node.id!r} requires an explicit shape=(d, d)"
        )
    if dist.name == "zero_sum_normal":
        raise ValueError(
            f"ZeroSumNormal RV {node.id!r} requires an explicit shape=(K,)"
        )
    # elementwise dists broadcast over constant array params
    shapes = [
        np.asarray(v).shape
        for v in params.values()
        if not isinstance(v, (str, list, tuple, dict))
    ]
    shapes = [s for s in shapes if s]
    if shapes:
        return tuple(np.broadcast_shapes(*shapes))
    return ()


@dataclass(frozen=True)
class PointMap:
    entries: tuple
    size: int

    @staticmethod
    def build(ir: IR) -> "PointMap":
        entries = []
        offset = 0
        for node in free_rv_nodes(ir):
            transform = node.op[3] if len(node.op) == 4 else None
            shape = _infer_shape(node)
            t = tf.get(transform)
            ushape = t.unconstrained_shape(shape)
            length = int(np.prod(ushape)) if ushape else 1
            # transform may be a name (str), None, or a Transform instance
            # (e.g. IntervalTransform from the Stan frontend) — stored as-is
            entries.append(
                Entry(
                    id=node.id,
                    offset=offset,
                    length=length,
                    shape=shape,
                    ushape=tuple(ushape),
                    transform=transform,
                )
            )
            offset += length
        return PointMap(entries=tuple(entries), size=offset)

    def entry(self, node_id: str) -> Entry:
        for e in self.entries:
            if e.id == node_id:
                return e
        raise KeyError(node_id)

    # -- flat <-> named, all static-shape jnp ops (jit/vmap/grad-safe) --

    def unpack(self, flat) -> dict:
        """flat unconstrained -> {id: z} with unconstrained shapes
        (point_map.ex:85-91)."""
        out = {}
        for e in self.entries:
            z = jnp.reshape(flat[e.offset : e.offset + e.length], e.ushape)
            out[e.id] = z
        return out

    def pack(self, zmap: dict):
        """{id: z unconstrained} -> flat (point_map.ex:65-80)."""
        parts = [
            jnp.reshape(jnp.asarray(zmap[e.id], dtype=default_dtype()), (e.length,))
            for e in self.entries
        ]
        if not parts:
            return jnp.zeros((0,), dtype=default_dtype())
        return jnp.concatenate(parts)

    def to_constrained(self, flat) -> dict:
        """flat -> {id: constrained x} applying each entry's transform
        (point_map.ex:103-112). NCP reconstruction is a compiler/sampler
        concern and happens on top of this."""
        out = {}
        for e in self.entries:
            z = jnp.reshape(flat[e.offset : e.offset + e.length], e.ushape)
            out[e.id] = tf.get(e.transform).forward(z)
        return out

    def to_unconstrained(self, xmap: dict):
        """{id: constrained x} -> flat via inverse transforms
        (point_map.ex:114-122)."""
        zmap = {}
        for e in self.entries:
            x = jnp.asarray(xmap[e.id], dtype=default_dtype())
            zmap[e.id] = tf.get(e.transform).inverse(x)
        return self.pack(zmap)

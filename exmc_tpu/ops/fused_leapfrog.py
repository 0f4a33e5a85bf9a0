"""Pallas fused leapfrog chain for elementwise-Gaussian potentials.

The TPU-native counterpart of the reference's optional Vulkan shader
path: ``Nx.Vulkan.leapfrog_chain_normal`` — a fused K-step leapfrog for
univariate-Normal targets, d<=256, f32 (reference tree.ex:622-672,
nx_vulkan in mix.exs:73-99). Generalized here to any diagonal-Gaussian
potential logp(q) = -0.5 sum(prec * (q-mu)^2) with a diagonal metric,
batched over chains.

K steps stay entirely in VMEM: one (TILE_C, d) block of positions and
momenta per grid step, the VPU doing 2 FMA sweeps per leapfrog step,
zero HBM traffic between steps.

RETIRED AS A DISPATCH TARGET (round 2, measured on a real v5e chip —
the MLX-honesty precedent, reference DECISIONS D58): across dispatch-
bound shapes (C=1024, d=8..256, K=32: 0.83-1.12x) and compute-bound
shapes (C=4096-8192, d=64-256, K=2048-4096: 0.61-0.77x), the
hand-written kernel is at best parity with and usually SLOWER than the
plain ``lax.scan`` formulation below — XLA already keeps the carry
on-chip and fuses the elementwise chain optimally, and the Pallas
VMEM-blocking adds overhead without saving any HBM traffic. The sampler
therefore has NO dispatch path to this op; it stays as a tested
template for future kernels whose access patterns XLA cannot fuse
(e.g. the binary-counter checkpoint stacks in tree.py, where manual
VMEM residency could matter).

Returns the final (q, p) after K steps plus the final logp per chain.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, p_ref, mu_ref, prec_ref, inv_mass_ref, eps_ref,
            q_out, p_out, logp_out, *, num_steps):
    q = q_ref[:]
    p = p_ref[:]
    mu = mu_ref[:]
    prec = prec_ref[:]
    inv_mass = inv_mass_ref[:]
    eps = eps_ref[0, 0]

    def grad(qq):
        return -prec * (qq - mu)

    def body(_, carry):
        q, p = carry
        p_half = p + 0.5 * eps * grad(q)
        q_new = q + eps * inv_mass * p_half
        p_new = p_half + 0.5 * eps * grad(q_new)
        return q_new, p_new

    q, p = jax.lax.fori_loop(0, num_steps, body, (q, p))
    q_out[:] = q
    p_out[:] = p
    diff = q - mu
    logp_out[:] = -0.5 * jnp.sum(prec * diff * diff, axis=1, keepdims=True)


def fused_leapfrog_gaussian(q, p, mu, prec, inv_mass, eps, num_steps,
                            *, tile_c=None, interpret=None):
    """Run ``num_steps`` leapfrog steps for all chains in one fused
    Pallas kernel.

    q, p: (C, d) f32; mu, prec, inv_mass: (d,); eps: scalar.
    Returns (q_final (C,d), p_final (C,d), logp_final (C,))."""
    c, d = q.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if tile_c is None:
        tile_c = min(c, 256)
    assert c % tile_c == 0, f"chains {c} not divisible by tile {tile_c}"

    mu2 = jnp.broadcast_to(jnp.asarray(mu, q.dtype), (1, d))
    prec2 = jnp.broadcast_to(jnp.asarray(prec, q.dtype), (1, d))
    im2 = jnp.broadcast_to(jnp.asarray(inv_mass, q.dtype), (1, d))
    eps2 = jnp.asarray(eps, q.dtype).reshape(1, 1)

    grid = (c // tile_c,)
    chain_spec = pl.BlockSpec((tile_c, d), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM)

    q_f, p_f, logp = pl.pallas_call(
        partial(_kernel, num_steps=num_steps),
        grid=grid,
        in_specs=[
            chain_spec,
            chain_spec,
            row_spec,
            row_spec,
            row_spec,
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            chain_spec,
            chain_spec,
            pl.BlockSpec((tile_c, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((c, d), q.dtype),
            jax.ShapeDtypeStruct((c, d), q.dtype),
            jax.ShapeDtypeStruct((c, 1), q.dtype),
        ],
        interpret=interpret,
    )(q, p, mu2, prec2, im2, eps2)
    return q_f, p_f, logp[:, 0]


def reference_leapfrog_gaussian(q, p, mu, prec, inv_mass, eps, num_steps):
    """XLA lax.scan reference implementation for cross-checking."""

    def grad(qq):
        return -prec * (qq - mu)

    def body(carry, _):
        q, p = carry
        p_half = p + 0.5 * eps * grad(q)
        q_new = q + eps * inv_mass * p_half
        p_new = p_half + 0.5 * eps * grad(q_new)
        return (q_new, p_new), None

    (q, p), _ = jax.lax.scan(body, (q, p), None, length=num_steps)
    diff = q - mu
    logp = -0.5 * jnp.sum(prec * diff * diff, axis=-1)
    return q, p, logp

"""Differentiable 2D steady-state heat solver (reference
physics/heat_2d.ex): -div(kappa grad T) = 0, Dirichlet BCs, Jacobi
iteration with conductivity-weighted 5-point stencil.

TPU-native: the Jacobi loop is a ``lax.fori_loop`` (the reference
unrolled 50 iterations at trace time, heat_2d.ex:28-46 — an unrolled
graph compiles slowly and caps iteration count; the fori_loop compiles
once regardless). Neighbor shifts are pad+slice, fused by XLA into one
stencil kernel per step. Fully differentiable wrt kappa for
PDE-constrained Bayesian inversion.
"""

import jax
import jax.numpy as jnp


def _shift(a, dy, dx):
    """Zero-padded shift: result[i,j] = a[i-dy, j-dx]."""
    pad = ((max(dy, 0), max(-dy, 0)), (max(dx, 0), max(-dx, 0)))
    padded = jnp.pad(a, pad)
    ny, nx = a.shape
    return padded[max(-dy, 0) : max(-dy, 0) + ny, max(-dx, 0) : max(-dx, 0) + nx]


def _init_temperature(ny, nx, bc_top, bc_bottom, dtype):
    frac = (jnp.arange(ny, dtype=dtype) / (ny - 1))[:, None]
    t = bc_top * (1.0 - frac) + bc_bottom * frac
    return jnp.broadcast_to(t, (ny, nx))


def _interior_mask(ny, nx, dtype):
    m = jnp.zeros((ny, nx), dtype)
    return m.at[1:-1, 1:-1].set(1.0)


def solve(kappa, iterations=50, bc_top=1.0, bc_bottom=0.0):
    """Solve for the temperature field given a (ny, nx) conductivity map.
    Returns the (ny, nx) temperature field (reference heat_2d.ex:28)."""
    kappa = jnp.asarray(kappa)
    ny, nx = kappa.shape
    dtype = kappa.dtype
    t_bc = _init_temperature(ny, nx, bc_top, bc_bottom, dtype)
    mask = _interior_mask(ny, nx, dtype)

    def step(_, t):
        num = jnp.zeros_like(t)
        den = jnp.zeros_like(t)
        for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
            k_n = _shift(kappa, dy, dx)
            t_n = _shift(t, dy, dx)
            num = num + k_n * t_n
            den = den + k_n
        t_new = num / jnp.maximum(den, 1e-10)
        return mask * t_new + (1.0 - mask) * t_bc

    return jax.lax.fori_loop(0, iterations, step, t_bc)


def read_sensors(temperature, positions="bottom_row"):
    """Extract sensor readings (reference heat_2d.ex read_sensors)."""
    if positions == "bottom_row":
        return temperature[-1, :]
    rows = jnp.asarray([p[0] for p in positions])
    cols = jnp.asarray([p[1] for p in positions])
    return temperature[rows, cols]

"""Leapfrog integrator + metric (mass matrix) operations.

Reference: leapfrog.ex:14-75 (half-kick, drift, eval, half-kick;
diag/dense mass dispatch D38; momentum sampling via L^{-T} z for dense).

Here the leapfrog step is inlined into the NUTS while_loop at trace
time — the reference's fused step_fn / BatchedLeapfrog while-loop
(compiler.ex:143-170 D27, batched_leapfrog.ex:30-102 D39) both collapse
into this one function traced inside the tree kernel.

Sign convention: we carry logp (not potential energy); the kick uses
+grad(logp).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular


class Metric(NamedTuple):
    """Euclidean metric. ``inv`` is the inverse mass matrix: (d,) diag or
    (d, d) dense. ``chol_inv`` caches sqrt(inv) (diag) / cholesky(inv)
    (dense) for momentum sampling; recomputed only at adaptation-window
    boundaries."""

    inv: jnp.ndarray
    chol_inv: jnp.ndarray

    @property
    def dense(self) -> bool:
        return self.inv.ndim == 2


def make_metric(inv) -> Metric:
    inv = jnp.asarray(inv)
    if inv.ndim == 2:
        return Metric(inv=inv, chol_inv=jnp.linalg.cholesky(inv))
    return Metric(inv=inv, chol_inv=jnp.sqrt(inv))


def velocity(metric: Metric, p):
    """v = M^{-1} p (leapfrog.ex:56-61, rank dispatch)."""
    if metric.dense:
        return metric.inv @ p
    return metric.inv * p


def kinetic_energy(metric: Metric, p):
    """K = 0.5 p^T M^{-1} p (leapfrog.ex:39-47)."""
    return 0.5 * jnp.dot(p, velocity(metric, p))


def sample_momentum(key, metric: Metric, d):
    """p ~ N(0, M). Diag: z / sqrt(M^{-1}) (sampler.ex:393-407); dense:
    with M^{-1} = L L^T, p = L^{-T} z (sampler.ex:412-427).

    A diag entry inv == 0 means the coordinate is FROZEN (infinite
    mass — the NUTS-within-Gibbs mode, sampler ``gibbs_scales``):
    its momentum is 0 so the coordinate never drifts and contributes
    no kinetic energy; gradient kicks still touch its p but velocity
    and kinetic both read inv * p = 0."""
    z = jax.random.normal(key, (d,), dtype=metric.inv.dtype)
    if metric.dense:
        return solve_triangular(metric.chol_inv.T, z, lower=False)
    return jnp.where(metric.chol_inv > 0, z / metric.chol_inv, 0.0)


def leapfrog(vag_fn, q, p, grad, eps, metric: Metric):
    """One leapfrog step (leapfrog.ex:14-32). ``vag_fn(q) -> (logp, grad)``.

    Returns (q1, p1, logp1, grad1)."""
    p_half = p + 0.5 * eps * grad
    q1 = q + eps * velocity(metric, p_half)
    logp1, grad1 = vag_fn(q1)
    p1 = p_half + 0.5 * eps * grad1
    return q1, p1, logp1, grad1

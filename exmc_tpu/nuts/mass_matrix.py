"""Welford online (co)variance estimation for the mass matrix.

Matches reference mass_matrix.ex: diagonal by default, dense opt-in
(D37/D38); Stan shrinkage ``(n/(n+5))*var + (5/(n+5))*1e-3`` with a 1e-6
floor (mass_matrix.ex:82-143); per-window reset (D44 companion:
divergent samples are excluded from updates by the warmup loop).

State is a jnp pytree in the warmup scan carry; for dense mode the m2
accumulator is (d, d) and finalize returns a full covariance.
"""

from typing import NamedTuple

import jax.numpy as jnp


class WelfordState(NamedTuple):
    n: jnp.ndarray       # scalar count
    mean: jnp.ndarray    # (d,)
    m2: jnp.ndarray      # (d,) diag or (d, d) dense


def welford_init(d, dense=False, dtype=jnp.float32):
    m2 = jnp.zeros((d, d), dtype) if dense else jnp.zeros((d,), dtype)
    return WelfordState(
        n=jnp.zeros((), dtype), mean=jnp.zeros((d,), dtype), m2=m2
    )


def welford_update(state: WelfordState, x, enabled=True):
    """Online update; ``enabled=False`` (e.g. divergent draw, D44) is a
    no-op so the update stays branch-free under vmap."""
    n = state.n + 1.0
    delta = x - state.mean
    mean = state.mean + delta / n
    delta2 = x - mean
    if state.m2.ndim == 2:
        m2 = state.m2 + jnp.outer(delta, delta2)
    else:
        m2 = state.m2 + delta * delta2
    new = WelfordState(n=n, mean=mean, m2=m2)
    w = jnp.asarray(enabled, dtype=x.dtype)
    return WelfordState(
        n=state.n * (1 - w) + new.n * w,
        mean=state.mean * (1 - w) + new.mean * w,
        m2=state.m2 * (1 - w) + new.m2 * w,
    )


def welford_merge_across(state: WelfordState, axis_name):
    """Merge per-chain Welford states across a vmap/shard axis as if all
    chains' samples were one stream (Chan et al. parallel variance).

    TPU-native improvement over the reference: with a thousand vmapped
    chains, one adaptation window pools 1000x the samples — mass
    estimates converge in far fewer warmup iterations (the reference's
    per-process chains could only share tuning by broadcasting chain
    0's, sampler.ex:1053-1080)."""
    import jax

    n_tot = jax.lax.psum(state.n, axis_name)
    safe = jnp.maximum(n_tot, 1.0)
    mean_tot = jax.lax.psum(state.n * state.mean, axis_name) / safe
    delta = state.mean - mean_tot
    if state.m2.ndim == 2:
        corr = state.n * jnp.outer(delta, delta)
    else:
        corr = state.n * delta * delta
    m2_tot = jax.lax.psum(state.m2 + corr, axis_name)
    return WelfordState(n=n_tot, mean=mean_tot, m2=m2_tot)


def welford_finalize(state: WelfordState, prev):
    """Finalize to a variance (diag) or covariance (dense) with Stan
    shrinkage + floor (mass_matrix.ex:82-143). Falls back to ``prev``
    when fewer than 2 samples accumulated (early/empty windows)."""
    n = jnp.maximum(state.n, 2.0)
    alpha = 5.0 / (state.n + 5.0)
    if state.m2.ndim == 2:
        cov = state.m2 / (n - 1.0)
        d = cov.shape[0]
        shrunk = (1.0 - alpha) * cov + alpha * 1e-3 * jnp.eye(d, dtype=cov.dtype)
        # keep positive-definiteness: floor the diagonal
        shrunk = shrunk + 1e-6 * jnp.eye(d, dtype=cov.dtype)
        ok = state.n >= 2.0
        return jnp.where(ok, shrunk, prev)
    var = state.m2 / (n - 1.0)
    shrunk = (1.0 - alpha) * var + alpha * 1e-3
    shrunk = jnp.maximum(shrunk, 1e-6)
    ok = state.n >= 2.0
    return jnp.where(ok, shrunk, prev)

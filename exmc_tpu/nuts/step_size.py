"""Dual-averaging step-size adaptation (Hoffman & Gelman 2014 / Nesterov).

Constants match the reference (step_size.ex:13-48): gamma=0.05, t0=10,
kappa=0.75, mu=log(10*eps0). The critical lesson carried over verbatim:
``log_epsilon_bar`` is initialized from epsilon, NOT 0
(step_size.ex:18-22) — otherwise early finalize() returns eps=1.

Unlike the reference (Erlang floats on the host, D17), the DA state is a
jnp pytree living inside the warmup scan carry, so per-chain adaptation
vmaps across thousands of chains.
"""

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

GAMMA = 0.05
T0 = 10.0
KAPPA = 0.75


class DualAveragingState(NamedTuple):
    mu: jnp.ndarray
    log_eps: jnp.ndarray
    log_eps_bar: jnp.ndarray
    h_bar: jnp.ndarray
    t: jnp.ndarray


def da_init(eps):
    log_eps = jnp.log(eps)
    return DualAveragingState(
        mu=jnp.log(10.0 * eps),
        log_eps=log_eps,
        log_eps_bar=log_eps,  # init from eps, not 0 (step_size.ex:18-22)
        h_bar=jnp.zeros_like(log_eps),
        t=jnp.zeros_like(log_eps),
    )


def da_update(state: DualAveragingState, accept_prob, target_accept):
    """One dual-averaging update (step_size.ex:34-46)."""
    accept_prob = jnp.where(jnp.isfinite(accept_prob), accept_prob, 0.0)
    t = state.t + 1.0
    w = 1.0 / (t + T0)
    h_bar = (1.0 - w) * state.h_bar + w * (target_accept - accept_prob)
    log_eps = state.mu - jnp.sqrt(t) / GAMMA * h_bar
    eta = t**-KAPPA
    log_eps_bar = eta * log_eps + (1.0 - eta) * state.log_eps_bar
    return DualAveragingState(state.mu, log_eps, log_eps_bar, h_bar, t)


def da_finalize(state: DualAveragingState):
    return jnp.exp(state.log_eps_bar)


def find_reasonable_epsilon(
    joint_fn, q, logp, grad, key, metric, eps0=1.0, max_iters=100
):
    """Double/halve epsilon until the one-step acceptance crosses 0.5
    (reference sampler.ex:451-530), as a bounded ``lax.while_loop`` so it
    runs inside the jitted warmup kernel at every adaptation-window
    boundary (the reference re-searches epsilon after each window too).

    ``joint_fn(q, p, logp, grad, eps)`` performs one leapfrog step and
    returns the new joint log-density; ``metric`` supplies momentum
    sampling. NaN-safe: a non-finite delta counts as delta=-inf (halve).
    """
    from exmc_tpu.nuts.leapfrog import leapfrog, kinetic_energy, sample_momentum

    r = sample_momentum(key, metric, q.shape[0])
    joint0 = logp - kinetic_energy(metric, r)
    log_half = math.log(0.5)

    def delta_at(eps):
        q1, r1, logp1, grad1 = leapfrog(joint_fn, q, r, grad, eps, metric)
        joint1 = logp1 - kinetic_energy(metric, r1)
        d = joint1 - joint0
        return jnp.where(jnp.isfinite(d), d, -jnp.inf)

    eps0 = jnp.asarray(eps0, dtype=q.dtype)
    d0 = delta_at(eps0)
    direction = jnp.where(d0 > log_half, 1.0, -1.0)

    def cond(carry):
        eps, d, i = carry
        crossed = jnp.where(direction > 0, d <= log_half, d > log_half)
        in_range = (eps > 1e-10) & (eps < 1e7)
        return (~crossed) & in_range & (i < max_iters)

    def body(carry):
        eps, _, i = carry
        eps = eps * jnp.exp2(direction)
        return eps, delta_at(eps), i + 1

    eps, _, _ = jax.lax.while_loop(cond, body, (eps0, d0, jnp.zeros((), jnp.int32)))
    # overshoot by one factor of 2 in the doubling direction is standard;
    # back off when we grew (the last doubling crossed below 0.5)
    eps = jnp.where(direction > 0, eps * 0.5, eps)
    return jnp.clip(eps, 1e-10, 1e7)

"""Bootstrap particle filter (reference smc_ex ParticleFilter, D72).

Functional state-space model interface (all jit/vmap-compatible):

    init_fn(key, n, params)        -> x0: (n, *state_shape)
    step_fn(key, x, t, params)     -> x': (n, *state_shape)
    loglik_fn(x, y, t, params)     -> (n,) per-particle obs log-liks

``particle_filter`` runs the whole T-step filter as one ``lax.scan``
with systematic resampling at EVERY step (the reference's BPF choice),
returning the unbiased log-marginal-likelihood estimate
log p̂(y_{1:T} | params) plus filtered state means — the inner loop of
PMCMC and SMC^2.
"""

from functools import partial

import jax
import jax.numpy as jnp


def systematic_resample(key, log_w, n=None):
    """Systematic resampling: returns ancestor indices (n,).

    One uniform offset, n evenly-spaced points through the normalized
    CDF — O(n), low-variance, and a single searchsorted gather on TPU
    (reference smc_ex resample; same scheme the SMC sampler uses)."""
    if n is None:
        n = log_w.shape[0]
    w = jax.nn.softmax(log_w)
    cdf = jnp.cumsum(w)
    u0 = jax.random.uniform(key, (), w.dtype, 0.0, 1.0 / n)
    pts = u0 + jnp.arange(n, dtype=w.dtype) / n
    return jnp.clip(jnp.searchsorted(cdf, pts), 0, log_w.shape[0] - 1)


def particle_filter(init_fn, step_fn, loglik_fn, ys, n_particles, key,
                    params, ess_threshold=0.5):
    """Bootstrap PF over observations ``ys`` (T, *obs_shape).

    Adaptive resampling: systematic resample only when the normalized
    ESS drops below ``ess_threshold`` (Chopin's default 0.5); otherwise
    weights carry over — fewer gathers, lower variance.

    Returns dict with:
      log_marginal — unbiased log p̂(y_{1:T})
      filtered_means — (T, *state_shape) weighted particle means
      ess — (T,) normalized effective sample size per step
    """
    t_total = ys.shape[0]
    key, init_key = jax.random.split(key)
    x0 = init_fn(init_key, n_particles, params)
    log_w0 = jnp.zeros((n_particles,), jnp.float32)

    def step(carry, inp):
        x, log_w, log_ml, key = carry
        t, y = inp
        key, rkey, skey = jax.random.split(key, 3)

        # adaptive systematic resampling
        w = jax.nn.softmax(log_w)
        ess = 1.0 / jnp.sum(w * w) / n_particles

        def do_resample(args):
            x, log_w = args
            idx = systematic_resample(rkey, log_w)
            return jnp.take(x, idx, axis=0), jnp.zeros_like(log_w)

        x, log_w = jax.lax.cond(
            ess < ess_threshold, do_resample, lambda a: a, (x, log_w)
        )

        # propagate through the transition, weight by the obs likelihood
        x = step_fn(skey, x, t, params)
        ll = loglik_fn(x, y, t, params)
        log_w_new = log_w + ll
        # incremental marginal-likelihood contribution:
        # log [ sum(w_prev * exp(ll)) ] with w_prev the normalized weights
        log_norm_prev = jax.scipy.special.logsumexp(log_w)
        log_norm_new = jax.scipy.special.logsumexp(log_w_new)
        log_ml = log_ml + log_norm_new - log_norm_prev

        w_new = jax.nn.softmax(log_w_new)
        mean = jnp.tensordot(w_new, x, axes=(0, 0))
        return (x, log_w_new, log_ml, key), (mean, ess)

    ts = jnp.arange(t_total)
    (x, log_w, log_ml, key), (means, ess) = jax.lax.scan(
        step, (x0, log_w0, jnp.zeros((), jnp.float32), key), (ts, ys)
    )
    return {
        "log_marginal": log_ml,
        "filtered_means": means,
        "ess": ess,
        "final_particles": x,
        "final_log_weights": log_w,
    }


def make_log_marginal_fn(init_fn, step_fn, loglik_fn, ys, n_particles,
                         ess_threshold=0.5):
    """(key, params) -> log p̂(y | params); the PMCMC/SMC^2 building
    block (vmappable over params for theta-particle fleets)."""

    @partial(jax.jit, static_argnums=())
    def fn(key, params):
        return particle_filter(
            init_fn, step_fn, loglik_fn, ys, n_particles, key, params,
            ess_threshold,
        )["log_marginal"]

    return fn

"""SMC^2 (reference smc_ex OnlineSMC2, D73; Chopin/Jacob/Papaspiliopoulos
2013): sequential Bayesian inference for state-space models with
intractable likelihoods.

N_theta parameter particles, each carrying its own N_x-particle
bootstrap filter. At each observation every theta-particle's filter
advances one step and the incremental predictive likelihood reweights
the theta-cloud; when the theta-ESS collapses, the cloud resamples and
rejuvenates with particle-MCMC moves whose likelihoods come from fresh
filter runs over y_{1:t} (a time-masked full-length scan, so the whole
algorithm stays one fixed-shape XLA program).

Where the reference fans BEAM tasks over theta-particles (88-core
Task.async_stream), here the theta axis is a ``vmap`` — hundreds of
complete particle filters advance in each fused device step.
"""

import jax
import jax.numpy as jnp

from exmc_tpu.particle.filter import systematic_resample


def _make_masked_pf(init_fn, step_fn, loglik_fn, ys, n_x,
                    ess_threshold=0.5):
    """PF over the fixed-length ys that only ACTS for steps < t_cut:
    returns (log_ml, x_state, log_w) at time t_cut. Fixed shapes make
    rejuvenation jittable at any interior time."""
    t_total = ys.shape[0]

    def run(key, params, t_cut):
        key, init_key = jax.random.split(key)
        x0 = init_fn(init_key, n_x, params)
        log_w0 = jnp.zeros((n_x,), jnp.float32)

        def step(carry, inp):
            x, log_w, log_ml, key = carry
            t, y = inp
            active = t < t_cut
            key, rkey, skey = jax.random.split(key, 3)
            w = jax.nn.softmax(log_w)
            ess = 1.0 / jnp.sum(w * w) / n_x

            def do_resample(args):
                x, log_w = args
                idx = systematic_resample(rkey, log_w)
                return jnp.take(x, idx, axis=0), jnp.zeros_like(log_w)

            x_r, log_w_r = jax.lax.cond(
                active & (ess < ess_threshold), do_resample, lambda a: a,
                (x, log_w),
            )
            x_new = step_fn(skey, x_r, t, params)
            ll = loglik_fn(x_new, y, t, params)
            log_w_new = log_w_r + ll
            log_norm_prev = jax.scipy.special.logsumexp(log_w_r)
            log_norm_new = jax.scipy.special.logsumexp(log_w_new)
            incr = log_norm_new - log_norm_prev

            x = jnp.where(active, x_new, x)
            log_w = jnp.where(active, log_w_new, log_w)
            log_ml = log_ml + jnp.where(active, incr, 0.0)
            return (x, log_w, log_ml, key), None

        (x, log_w, log_ml, _), _ = jax.lax.scan(
            step, (x0, log_w0, jnp.zeros((), jnp.float32), key),
            (jnp.arange(t_total), ys),
        )
        return log_ml, x, log_w

    return run


def smc2(init_fn, step_fn, loglik_fn, prior_sample_fn, log_prior_fn, ys,
         n_theta, n_x, key, ess_threshold=0.5, rejuvenation_moves=2,
         pf_ess_threshold=0.5):
    """Run batch SMC^2 over observations ``ys``.

    Model interface as in :func:`exmc_tpu.particle.particle_filter`,
    plus ``prior_sample_fn(key, n) -> (n, d)`` theta draws and
    ``log_prior_fn(theta) -> scalar``.

    Returns dict with ``thetas (n_theta, d)``, ``log_weights (n_theta,)``
    (final importance weights: posterior expectations are
    softmax-weighted averages), ``log_evidence`` (log p̂(y_{1:T})),
    ``ess_history (T,)``, ``rejuvenations`` (count).
    """
    t_total = ys.shape[0]
    masked_pf = _make_masked_pf(init_fn, step_fn, loglik_fn, ys, n_x,
                                pf_ess_threshold)

    key, kp = jax.random.split(key)
    thetas0 = jnp.asarray(prior_sample_fn(kp, n_theta), jnp.float32)
    d = thetas0.shape[1]

    key, ki = jax.random.split(key)
    init_keys = jax.random.split(ki, n_theta)
    xs0 = jax.vmap(lambda k, th: init_fn(k, n_x, th))(init_keys, thetas0)
    log_ws0 = jnp.zeros((n_theta, n_x), jnp.float32)
    log_mls0 = jnp.zeros((n_theta,), jnp.float32)
    log_W0 = jnp.zeros((n_theta,), jnp.float32)

    def advance_one(key, theta, x, log_w, y, t):
        """One bootstrap-PF step for one theta-particle."""
        key, rkey, skey = jax.random.split(key, 3)
        w = jax.nn.softmax(log_w)
        ess = 1.0 / jnp.sum(w * w) / n_x

        def do_resample(args):
            x, log_w = args
            idx = systematic_resample(rkey, log_w)
            return jnp.take(x, idx, axis=0), jnp.zeros_like(log_w)

        x, log_w = jax.lax.cond(ess < pf_ess_threshold, do_resample,
                                lambda a: a, (x, log_w))
        x = step_fn(skey, x, t, theta)
        ll = loglik_fn(x, y, t, theta)
        log_w_new = log_w + ll
        incr = (jax.scipy.special.logsumexp(log_w_new)
                - jax.scipy.special.logsumexp(log_w))
        return x, log_w_new, incr

    def rejuvenate(state, t, key):
        thetas, xs, log_ws, log_mls, log_W = state
        key, kr = jax.random.split(key)
        idx = systematic_resample(kr, log_W)
        thetas = jnp.take(thetas, idx, axis=0)
        xs = jnp.take(xs, idx, axis=0)
        log_ws = jnp.take(log_ws, idx, axis=0)
        log_mls = jnp.take(log_mls, idx, axis=0)

        # random-walk proposal scaled to the resampled cloud
        mean = thetas.mean(axis=0)
        centered = thetas - mean
        cov = centered.T @ centered / n_theta + 1e-6 * jnp.eye(d)
        chol = jnp.linalg.cholesky(cov)
        scale = 2.38 / jnp.sqrt(jnp.asarray(float(d)))

        lp_cur = jax.vmap(log_prior_fn)(thetas)
        for _ in range(rejuvenation_moves):
            key, kz, kpf, ku = jax.random.split(key, 4)
            z = jax.random.normal(kz, (n_theta, d))
            props = thetas + scale * z @ chol.T
            lp_prop = jax.vmap(log_prior_fn)(props)
            pf_keys = jax.random.split(kpf, n_theta)
            ml_prop, x_prop, lw_prop = jax.vmap(
                lambda k, th: masked_pf(k, th, t + 1)
            )(pf_keys, props)
            log_alpha = (lp_prop + ml_prop) - (lp_cur + log_mls)
            log_u = jnp.log(
                jax.random.uniform(ku, (n_theta,), jnp.float32, 1e-20, 1.0)
            )
            accept = (log_u < log_alpha) & jnp.isfinite(lp_prop)
            acc_col = accept[:, None]
            thetas = jnp.where(acc_col, props, thetas)
            log_mls = jnp.where(accept, ml_prop, log_mls)
            lp_cur = jnp.where(accept, lp_prop, lp_cur)
            xs = jnp.where(accept[:, None, None] if xs.ndim == 3
                           else acc_col, x_prop, xs)
            log_ws = jnp.where(acc_col, lw_prop, log_ws)
        return (thetas, xs, log_ws, log_mls, jnp.zeros_like(log_W)), key

    def outer_step(carry, inp):
        thetas, xs, log_ws, log_mls, log_W, log_Z, n_rej, key = carry
        t, y = inp
        key, ka = jax.random.split(key)
        akeys = jax.random.split(ka, n_theta)
        xs, log_ws, incr = jax.vmap(
            lambda k, th, x, lw: advance_one(k, th, x, lw, y, t)
        )(akeys, thetas, xs, log_ws)
        log_mls = log_mls + incr
        # evidence increment: log sum(W_j * exp(incr_j)) over theta cloud
        log_Z = log_Z + (
            jax.scipy.special.logsumexp(log_W + incr)
            - jax.scipy.special.logsumexp(log_W)
        )
        log_W = log_W + incr
        w = jax.nn.softmax(log_W)
        ess = 1.0 / jnp.sum(w * w) / n_theta

        def do_rej(args):
            state, key = args
            new_state, key = rejuvenate(state, t, key)
            return new_state, key

        (thetas, xs, log_ws, log_mls, log_W), key = jax.lax.cond(
            ess < ess_threshold, do_rej, lambda a: a,
            ((thetas, xs, log_ws, log_mls, log_W), key),
        )
        n_rej = n_rej + (ess < ess_threshold).astype(jnp.int32)
        return (thetas, xs, log_ws, log_mls, log_W, log_Z, n_rej, key), ess

    carry0 = (thetas0, xs0, log_ws0, log_mls0, log_W0,
              jnp.zeros((), jnp.float32), jnp.zeros((), jnp.int32), key)
    (thetas, xs, log_ws, log_mls, log_W, log_Z, n_rej, key), ess_hist = (
        jax.lax.scan(outer_step, carry0, (jnp.arange(t_total), ys))
    )
    return {
        "thetas": thetas,
        "log_weights": log_W,
        "log_evidence": log_Z,
        "ess_history": ess_hist,
        "rejuvenations": n_rej,
        "theta_log_marginals": log_mls,
    }

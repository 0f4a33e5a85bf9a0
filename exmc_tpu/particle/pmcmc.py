"""Particle marginal Metropolis-Hastings (reference smc_ex PMCMC, D73).

Random-walk MH on the parameter vector where the intractable likelihood
is replaced by the particle filter's UNBIASED estimate (Andrieu,
Doucet & Holenstein 2010: the resulting chain targets the exact
posterior despite the noisy likelihood).

TPU-native: the whole chain is one ``lax.scan``; each iteration runs a
full T-step particle filter; multiple chains vmap."""

import jax
import jax.numpy as jnp


def pmcmc(log_marginal_fn, log_prior_fn, theta0, num_samples, key,
          step_scale=0.2, num_chains=1):
    """Run PMMH.

    log_marginal_fn(key, theta) -> log p̂(y|theta) (from
    particle.filter.make_log_marginal_fn); log_prior_fn(theta) -> scalar;
    theta0: (d,) init. Returns (thetas (chains, num_samples, d),
    accept_rate (chains,)).
    """
    theta0 = jnp.asarray(theta0, jnp.float32)
    d = theta0.shape[0]
    scale = jnp.broadcast_to(jnp.asarray(step_scale, jnp.float32), (d,))

    def one_chain(key):
        key, k0 = jax.random.split(key)
        ll0 = log_marginal_fn(k0, theta0) + log_prior_fn(theta0)

        def step(carry, _):
            theta, ll, key, acc = carry
            key, kp, kf, ku = jax.random.split(key, 4)
            prop = theta + scale * jax.random.normal(kp, (d,))
            lp_prior = log_prior_fn(prop)

            # skip the (expensive) filter when the prior already rejects
            def eval_ll(_):
                return log_marginal_fn(kf, prop) + lp_prior

            ll_prop = jax.lax.cond(
                jnp.isfinite(lp_prior), eval_ll, lambda _: -jnp.inf, None
            )
            log_u = jnp.log(jax.random.uniform(ku, (), jnp.float32, 1e-20, 1.0))
            accept = log_u < (ll_prop - ll)
            theta = jnp.where(accept, prop, theta)
            ll = jnp.where(accept, ll_prop, ll)
            return (theta, ll, key, acc + accept), theta

        (theta, ll, key, acc), thetas = jax.lax.scan(
            step, (theta0, ll0, key, jnp.zeros((), jnp.float32)), None,
            length=num_samples,
        )
        return thetas, acc / num_samples

    keys = jax.random.split(key, num_chains)
    thetas, acc = jax.vmap(one_chain)(keys)
    return thetas, acc

"""ADVI: mean-field normal variational inference in unconstrained space
(Kucukelbir et al. 2017), on the same compiled log-density as NUTS.

Parity with reference advi.ex: reparameterized 1-sample MC gradient
(grad_mu = dlogp/dz, grad_log_sigma = dlogp/dz * sigma * eps + 1,
advi.ex:117-156), closed-form entropy, plain SGD with lr=0.01 (no Adam,
advi.ex docstring), ELBO-window convergence test (advi.ex:77-84), draws
transformed to a constrained trace (advi.ex:175-186).

TPU-native: the whole optimization is one ``lax.while_loop`` inside jit
(per-window convergence checked on device), and the posterior draws are
constrained by a vmapped transform.
"""

import numpy as np
import jax
import jax.numpy as jnp

from exmc_tpu.compiler import CompiledModel, compile_logp, constrain_flat
from exmc_tpu.config import default_dtype


def advi_fit(ir, *, num_steps=5000, lr=0.01, seed=0, num_draws=1000,
             window=100, tol=1e-3, data=None, ncp=True):
    """Fit mean-field ADVI. Returns dict with ``mu``, ``sigma``
    (unconstrained-space variational params), ``draws`` (constrained
    trace, (1, num_draws, ...) arrays), ``elbo_history``, ``converged_at``.
    """
    model = ir if isinstance(ir, CompiledModel) else compile_logp(ir, ncp=ncp)
    dtype = default_dtype()
    d = model.size
    if data is None:
        data = model.data
    vag = model.value_and_grad

    key = jax.random.PRNGKey(seed)

    def step(carry, eps_noise):
        mu, log_sigma = carry
        sigma = jnp.exp(log_sigma)
        z = mu + sigma * eps_noise
        logp, grad = vag(z, data)
        # reparameterized gradients (advi.ex:117-156); +1 is the entropy grad
        grad_mu = grad
        grad_ls = grad * sigma * eps_noise + 1.0
        # global-norm clip + non-finite-step rejection: the reference's
        # plain SGD (no Adam, advi.ex) explodes on steep likelihoods
        # (e.g. the Weibull reliability model) in f32 without these
        gnorm = jnp.sqrt(jnp.sum(grad_mu**2) + jnp.sum(grad_ls**2))
        scale = jnp.minimum(1.0, 10.0 / jnp.maximum(gnorm, 1e-12))
        mu_new = mu + lr * scale * grad_mu
        ls_new = log_sigma + lr * scale * grad_ls
        ok = jnp.isfinite(logp) & jnp.all(jnp.isfinite(mu_new)) & jnp.all(
            jnp.isfinite(ls_new)
        )
        mu = jnp.where(ok, mu_new, mu)
        log_sigma = jnp.where(ok, ls_new, log_sigma)
        elbo = jnp.where(ok, logp + jnp.sum(log_sigma), -jnp.inf)
        return (mu, log_sigma), elbo

    @jax.jit
    def run(key):
        noise = jax.random.normal(key, (num_steps, d), dtype)
        init = (jnp.zeros((d,), dtype), jnp.full((d,), -1.0, dtype))
        (mu, log_sigma), elbos = jax.lax.scan(step, init, noise)
        return mu, log_sigma, elbos

    key, fit_key, draw_key = jax.random.split(key, 3)
    mu, log_sigma, elbos = run(fit_key)
    elbos = np.asarray(elbos)

    # ELBO-window convergence diagnostic (advi.ex:77-84), post-hoc
    converged_at = None
    if num_steps >= 2 * window:
        w = elbos[: (num_steps // window) * window].reshape(-1, window).mean(axis=1)
        rel = np.abs(np.diff(w)) / (np.abs(w[:-1]) + 1e-10)
        hits = np.nonzero(rel < tol)[0]
        if hits.size:
            converged_at = int((hits[0] + 1) * window)

    sigma = jnp.exp(log_sigma)

    @jax.jit
    def draw(key):
        z = mu + sigma * jax.random.normal(key, (num_draws, d), dtype)
        trace = jax.vmap(lambda f: constrain_flat(model.ir, model.pm, f, data))(z)
        return z, trace

    z, trace = draw(draw_key)
    trace = {k: np.asarray(v)[None] for k, v in trace.items()}  # (1, draws, ...)

    return {
        "mu": np.asarray(mu),
        "sigma": np.asarray(sigma),
        "draws": trace,
        "draws_unconstrained": np.asarray(z)[None],
        "elbo_history": elbos,
        "converged_at": converged_at,
    }

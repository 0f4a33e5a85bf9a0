"""ADVI: mean-field normal variational inference in unconstrained space
(Kucukelbir et al. 2017), on the same compiled log-density as NUTS.

Parity with reference advi.ex: reparameterized 1-sample MC gradient
(grad_mu = dlogp/dz, grad_log_sigma = dlogp/dz * sigma * eps + 1,
advi.ex:117-156), closed-form entropy, plain SGD with lr=0.01 (no Adam,
advi.ex docstring; ``optimizer="adam"`` adds an optax path beyond the
reference), ELBO-window convergence test that STOPS the fit when the
window-mean ELBO stabilizes (advi.ex:77-84), draws transformed to a
constrained trace (advi.ex:175-186).

TPU-native: the whole optimization is one bounded ``lax.while_loop``
over window-sized ``lax.scan`` segments inside jit — the per-window
convergence check runs on device, so an early-converging fit pays only
the windows it used (the reference loops on the host and stops the same
way; here stopping early skips device work without leaving the program).
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from exmc_tpu.compiler import CompiledModel, compile_logp, constrain_flat
from exmc_tpu.config import default_dtype


def advi_fit(ir, *, num_steps=5000, lr=0.01, seed=0, num_draws=1000,
             window=100, tol=1e-3, data=None, ncp=True, early_stop=True,
             optimizer="sgd", psir=False):
    """Fit mean-field ADVI. Returns dict with ``mu``, ``sigma``
    (unconstrained-space variational params), ``draws`` (constrained
    trace, (1, num_draws, ...) arrays), ``elbo_history``, ``converged_at``.

    ``early_stop=True`` (default) terminates the optimization on device
    once consecutive window-mean ELBOs agree to relative ``tol``
    (reference advi.ex:77-84); steps never run are NaN in
    ``elbo_history``. ``optimizer`` is ``"sgd"`` (reference parity:
    plain SGD with global-norm clip) or ``"adam"`` (optax Adam with the
    same clip).
    """
    model = ir if isinstance(ir, CompiledModel) else compile_logp(ir, ncp=ncp)
    dtype = default_dtype()
    d = model.size
    if data is None:
        data = model.data
    vag = model.value_and_grad

    if optimizer == "adam":
        opt = optax.chain(optax.clip_by_global_norm(10.0), optax.adam(lr))
    elif optimizer == "sgd":
        opt = optax.chain(optax.clip_by_global_norm(10.0), optax.sgd(lr))
    else:
        raise ValueError(f"optimizer must be 'sgd' or 'adam', got {optimizer!r}")

    n_windows = max(1, -(-num_steps // window))  # ceil; pad to full windows

    def step(carry, _):
        mu, log_sigma, opt_state, key = carry
        key, knoise = jax.random.split(key)
        eps_noise = jax.random.normal(knoise, (d,), dtype)
        sigma = jnp.exp(log_sigma)
        z = mu + sigma * eps_noise
        logp, grad = vag(z, data)
        # reparameterized ASCENT gradients (advi.ex:117-156); +1 is the
        # entropy grad. optax minimizes, so negate.
        grad_mu = grad
        grad_ls = grad * sigma * eps_noise + 1.0
        updates, opt_state_new = opt.update(
            (-grad_mu, -grad_ls), opt_state, (mu, log_sigma)
        )
        mu_new = mu + updates[0]
        ls_new = log_sigma + updates[1]
        # non-finite-step rejection: steep likelihoods (e.g. the Weibull
        # reliability model) explode in f32 without this
        ok = jnp.isfinite(logp) & jnp.all(jnp.isfinite(mu_new)) & jnp.all(
            jnp.isfinite(ls_new)
        )
        mu = jnp.where(ok, mu_new, mu)
        log_sigma = jnp.where(ok, ls_new, log_sigma)
        opt_state = jax.tree_util.tree_map(
            lambda new, old: jnp.where(ok, new, old), opt_state_new, opt_state
        )
        elbo = jnp.where(ok, logp + jnp.sum(log_sigma), -jnp.inf)
        return (mu, log_sigma, opt_state, key), elbo

    @jax.jit
    def run(key):
        mu0 = jnp.zeros((d,), dtype)
        ls0 = jnp.full((d,), -1.0, dtype)
        opt_state0 = opt.init((mu0, ls0))
        buf0 = jnp.full((n_windows, window), jnp.nan, dtype)

        def body(carry):
            inner, w, prev_mean, conv_w, buf = carry
            inner, elbos = jax.lax.scan(step, inner, None, length=window)
            m = jnp.mean(elbos)
            rel = jnp.abs(m - prev_mean) / (jnp.abs(prev_mean) + 1e-10)
            hit = (w >= 1) & (rel < tol)
            conv_w = jnp.where((conv_w < 0) & hit, w + 1, conv_w)
            buf = jax.lax.dynamic_update_slice(buf, elbos[None, :], (w, 0))
            return inner, w + 1, m, conv_w, buf

        def cond(carry):
            _, w, _, conv_w, _ = carry
            keep = w < n_windows
            if early_stop:
                keep = keep & (conv_w < 0)
            return keep

        inner0 = (mu0, ls0, opt_state0, key)
        inner, w, _, conv_w, buf = jax.lax.while_loop(
            cond, body, (inner0, jnp.int32(0), jnp.array(jnp.inf, dtype),
                         jnp.int32(-1), buf0)
        )
        mu, log_sigma, _, _ = inner
        return mu, log_sigma, buf, conv_w, w

    key = jax.random.PRNGKey(seed)
    key, fit_key, draw_key = jax.random.split(key, 3)
    mu, log_sigma, buf, conv_w, windows_run = run(fit_key)
    elbos = np.asarray(buf).reshape(-1)[:num_steps]
    conv_w = int(conv_w)
    converged_at = conv_w * window if conv_w > 0 else None

    sigma = jnp.exp(log_sigma)

    @jax.jit
    def draw(key):
        z = mu + sigma * jax.random.normal(key, (num_draws, d), dtype)
        trace = jax.vmap(lambda f: constrain_flat(model.ir, model.pm, f, data))(z)
        return z, trace

    z, trace = draw(draw_key)
    trace = {k: np.asarray(v)[None] for k, v in trace.items()}  # (1, draws, ...)

    result = {
        "mu": np.asarray(mu),
        "sigma": np.asarray(sigma),
        "draws": trace,
        "draws_unconstrained": np.asarray(z)[None],
        "elbo_history": elbos,
        "converged_at": converged_at,
        "steps_run": int(windows_run) * window,
    }
    if psir:
        # PSIR (exmc_tpu/psir.py): resample the mean-field draws toward
        # the exact posterior; result["psir"]["pareto_k"] answers
        # "did the VI work?" (Yao et al. 2018)
        from exmc_tpu.psir import apply_psir_to_fit, diag_normal_logq

        logq = np.asarray(diag_normal_logq(z, mu, sigma))
        result = apply_psir_to_fit(result, model, logq,
                                   seed=seed + 101, data=data)
    return result

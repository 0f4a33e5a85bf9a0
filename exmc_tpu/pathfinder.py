"""Pathfinder variational inference (Zhang et al. 2022, as realized by
the reference pathfinder.ex — the crude diag-normal variant, NOT the
paper's full low-rank covariance).

Parity with reference pathfinder.ex: L-BFGS path via two-loop recursion
(pathfinder.ex:119-154) with fixed step alpha=0.01 and history 6, a
diagonal-normal fit at each path point with sigma = 1/sqrt(|grad|+1e-6)
(pathfinder.ex:156-171), ELBO estimated by MC at each point, max-ELBO
point selected, draws taken from its diag-normal (pathfinder.ex:30-58).

TPU-native: the L-BFGS path is a ``lax.scan`` (history buffers are
fixed-size arrays), per-point ELBOs evaluate as one vmapped batch.
"""

import numpy as np
import jax
import jax.numpy as jnp

from exmc_tpu.compiler import CompiledModel, compile_logp, constrain_flat
from exmc_tpu.config import default_dtype

HISTORY = 6
ALPHA = 0.01


def _two_loop(grad, s_hist, y_hist, rho_hist, valid):
    """L-BFGS two-loop recursion over fixed-size history buffers."""
    q = grad
    alphas = jnp.zeros((HISTORY,), grad.dtype)
    for i in range(HISTORY - 1, -1, -1):
        a = rho_hist[i] * jnp.dot(s_hist[i], q)
        a = jnp.where(valid[i], a, 0.0)
        q = q - a * y_hist[i]
        alphas = alphas.at[i].set(a)
    # initial scaling gamma = s.y / y.y of most recent pair
    sy = jnp.dot(s_hist[-1], y_hist[-1])
    yy = jnp.dot(y_hist[-1], y_hist[-1])
    gamma = jnp.where(valid[-1] & (yy > 0), sy / jnp.maximum(yy, 1e-12), 1.0)
    r = gamma * q
    for i in range(HISTORY):
        b = rho_hist[i] * jnp.dot(y_hist[i], r)
        b = jnp.where(valid[i], b, 0.0)
        r = r + s_hist[i] * (alphas[i] - b)
    return r


def pathfinder_fit(ir, *, num_iters=100, num_draws=1000, num_elbo_draws=20,
                   seed=0, data=None, ncp=True, method="diag", psir=False):
    """Run Pathfinder; returns {draws (constrained trace), mu, sigma,
    elbo_path, best_iter}.

    method="diag" mirrors the reference's crude per-coordinate fit
    (pathfinder.ex:156-171). method="lowrank" uses the paper's
    low-rank-plus-diagonal inverse-Hessian covariance built from the
    L-BFGS curvature pairs (Zhang et al. 2022; see
    exmc_tpu.pathfinder_lowrank) — exact log-density, exact sampling;
    its returned "sigma" is the MARGINAL posterior sd vector
    sqrt(diag(Sigma)) (correlations live in the draws).

    ``psir=True`` completes the paper's algorithm: Pareto-smoothed
    importance resampling of the Gaussian draws toward the exact
    posterior (Zhang et al. 2022 §2.3; exmc_tpu/psir.py), with the
    k-hat reliability diagnostic in ``result["psir"]``."""
    if method == "lowrank":
        return _pathfinder_lowrank(
            ir, num_iters=num_iters, num_draws=num_draws,
            num_elbo_draws=num_elbo_draws, seed=seed, data=data, ncp=ncp,
            psir=psir,
        )
    if method != "diag":
        raise ValueError(f"unknown pathfinder method {method!r} "
                         "(expected 'diag' or 'lowrank')")
    model = ir if isinstance(ir, CompiledModel) else compile_logp(ir, ncp=ncp)
    dtype = default_dtype()
    d = model.size
    if data is None:
        data = model.data
    vag = model.value_and_grad

    key = jax.random.PRNGKey(seed)
    key, init_key, elbo_key, draw_key = jax.random.split(key, 4)

    # jitted programs cached per (model, data, sizes): pathfinder_init
    # calls this num_paths times varying only the SEED (a traced key
    # argument), and a fresh @jax.jit closure per call would recompile
    # the identical XLA program each time
    # the active precision mode is part of the key: toggling EXMC_TPU_X64
    # between calls must not replay a program jitted under the old dtype
    # (advisor r2). NOTE: ``data`` is keyed by identity — mutating a data
    # array in place between calls returns stale results (the jitted
    # closure baked the old values in); pass a fresh array instead.
    cache_key = (id(model), None if data is None else id(data),
                 num_iters, num_elbo_draws, num_draws, str(dtype))
    cached = _FIT_CACHE.get(cache_key)
    if cached is not None:
        run_c, draw_c = cached
        mu, sigma, elbos, best = run_c(init_key, elbo_key)
        z, trace = draw_c(draw_key, mu, sigma)
        # the SAME psir-aware tail as the fresh path (review fix: the
        # cache-hit early return used to skip PSIR silently)
        return _finish_diag_result(mu, sigma, elbos, best, z, trace,
                                   model, data, psir, seed)

    @jax.jit
    def run(init_key, elbo_key):
        x0 = jax.random.uniform(init_key, (d,), dtype, minval=-2.0, maxval=2.0)
        logp0, grad0 = vag(x0, data)

        def step(carry, _):
            x, logp, grad, s_h, y_h, rho_h, valid = carry
            # ascent direction on logp (minimize -logp)
            direction = _two_loop(-grad, s_h, y_h, rho_h, valid)
            x_new = x - ALPHA * direction
            logp_new, grad_new = vag(x_new, data)
            ok = jnp.isfinite(logp_new) & jnp.all(jnp.isfinite(grad_new))
            x_new = jnp.where(ok, x_new, x)
            logp_new = jnp.where(ok, logp_new, logp)
            grad_new = jnp.where(ok, grad_new, grad)
            s = x_new - x
            y = -(grad_new - grad)  # gradient of -logp
            sy = jnp.dot(s, y)
            pair_ok = ok & (sy > 1e-12)
            s_h = jnp.where(pair_ok, jnp.roll(s_h, -1, axis=0).at[-1].set(s), s_h)
            y_h = jnp.where(pair_ok, jnp.roll(y_h, -1, axis=0).at[-1].set(y), y_h)
            rho_h = jnp.where(
                pair_ok,
                jnp.roll(rho_h, -1).at[-1].set(1.0 / jnp.maximum(sy, 1e-12)),
                rho_h,
            )
            valid = jnp.where(pair_ok, jnp.roll(valid, -1).at[-1].set(True), valid)
            carry = (x_new, logp_new, grad_new, s_h, y_h, rho_h, valid)
            # diag-normal fit at this point (pathfinder.ex:156-171)
            sigma = 1.0 / jnp.sqrt(jnp.abs(grad_new) + 1e-6)
            return carry, (x_new, sigma)

        init = (
            x0, logp0, grad0,
            jnp.zeros((HISTORY, d), dtype),
            jnp.zeros((HISTORY, d), dtype),
            jnp.zeros((HISTORY,), dtype),
            jnp.zeros((HISTORY,), bool),
        )
        _, (path_mu, path_sigma) = jax.lax.scan(step, init, None, length=num_iters)

        # MC-ELBO at each path point (vmapped over points and draws)
        eps = jax.random.normal(elbo_key, (num_iters, num_elbo_draws, d), dtype)

        def point_elbo(mu, sigma, eps_i):
            z = mu + sigma * eps_i  # (K, d)
            lps = jax.vmap(lambda zz: vag(zz, data)[0])(z)
            entropy = jnp.sum(jnp.log(sigma))
            lps = jnp.where(jnp.isfinite(lps), lps, -1e30)
            return jnp.mean(lps) + entropy

        elbos = jax.vmap(point_elbo)(path_mu, path_sigma, eps)
        best = jnp.argmax(elbos)
        return path_mu[best], path_sigma[best], elbos, best

    @jax.jit
    def draw(key, mu, sigma):
        z = mu + sigma * jax.random.normal(key, (num_draws, d), dtype)
        return z, jax.vmap(lambda f: constrain_flat(model.ir, model.pm, f, data))(z)

    _FIT_CACHE[cache_key] = (run, draw)
    while len(_FIT_CACHE) > 8:
        _FIT_CACHE.pop(next(iter(_FIT_CACHE)))
    mu, sigma, elbos, best = run(init_key, elbo_key)
    z, trace = draw(draw_key, mu, sigma)
    return _finish_diag_result(mu, sigma, elbos, best, z, trace,
                               model, data, psir, seed)


# cached closures keep their model alive, so id()-keyed entries cannot
# alias a collected object; bounded at 8 entries
_FIT_CACHE = {}


def _finish_diag_result(mu, sigma, elbos, best, z, trace, model, data,
                        psir, seed):
    """Pack the diag-fit result and (optionally) PSIR-resample it —
    the one tail shared by the fresh and _FIT_CACHE-hit paths."""
    result = _pack_diag_result(mu, sigma, elbos, best, z, trace)
    if psir:
        from exmc_tpu.psir import apply_psir_to_fit, diag_normal_logq

        logq = np.asarray(diag_normal_logq(z, mu, sigma))
        result = apply_psir_to_fit(result, model, logq,
                                   seed=seed + 101, data=data)
    return result


def _pack_diag_result(mu, sigma, elbos, best, z, trace):
    return {
        "mu": np.asarray(mu),
        "sigma": np.asarray(sigma),
        "elbo_path": np.asarray(elbos),
        "best_iter": int(best),
        "draws": {k: np.asarray(v)[None] for k, v in trace.items()},
        "draws_unconstrained": np.asarray(z)[None],
    }


def pathfinder_init(ir, num_chains, *, seed=0, data=None, ncp=True,
                    num_paths=8, num_iters=150):
    """Multi-path Pathfinder MCMC initialization (the paper's stated
    purpose, Zhang et al. 2022 §1): run ``num_paths`` independent
    L-BFGS paths from random starts, keep the path with the best
    MC-ELBO, and return ``(num_chains, d)`` unconstrained draws from its
    fit as per-chain NUTS inits.

    This is the mode-finding defence against multimodal posteriors at
    weak identification (the long-T SV "all-observations-are-outliers"
    trap mode, TODO r2 #2): a random init can land in a spurious basin
    NUTS never leaves, but the ELBO race across paths reliably selects
    the dominant mode. Exposed as ``sample(..., init="pathfinder")``.
    """
    model = ir if isinstance(ir, CompiledModel) else compile_logp(ir, ncp=ncp)
    best = None
    for p in range(num_paths):
        r = pathfinder_fit(
            model, num_iters=num_iters, num_draws=num_chains,
            num_elbo_draws=20, seed=seed + 1_000_003 * p, data=data,
        )
        e = float(np.max(r["elbo_path"]))
        if best is None or e > best[0]:
            best = (e, r)
    return best[1]["draws_unconstrained"][0][:num_chains]


def _pathfinder_lowrank(ir, *, num_iters, num_draws, num_elbo_draws, seed,
                        data, ncp, psir=False):
    from exmc_tpu.pathfinder_lowrank import lowrank_factors, sample_and_logq

    model = ir if isinstance(ir, CompiledModel) else compile_logp(ir, ncp=ncp)
    dtype = default_dtype()
    d = model.size
    if data is None:
        data = model.data
    vag = model.value_and_grad

    key = jax.random.PRNGKey(seed)
    key, init_key, elbo_key, draw_key = jax.random.split(key, 4)

    @jax.jit
    def run(init_key, elbo_key):
        x0 = jax.random.uniform(init_key, (d,), dtype, minval=-2.0, maxval=2.0)
        logp0, grad0 = vag(x0, data)

        def step(carry, _):
            x, logp, grad, s_h, y_h, rho_h, valid, gamma = carry
            direction = _two_loop(-grad, s_h, y_h, rho_h, valid)
            # damped-Newton step: the two-loop direction is already
            # Hessian-scaled, so 0.5 converges in tens of iterations
            # (the diag path keeps the reference's fixed 0.01,
            # pathfinder.ex)
            x_new = x - 0.5 * direction
            logp_new, grad_new = vag(x_new, data)
            ok = jnp.isfinite(logp_new) & jnp.all(jnp.isfinite(grad_new))
            x_new = jnp.where(ok, x_new, x)
            logp_new = jnp.where(ok, logp_new, logp)
            grad_new = jnp.where(ok, grad_new, grad)
            s = x_new - x
            y = -(grad_new - grad)
            sy = jnp.dot(s, y)
            pair_ok = ok & (sy > 1e-12)
            s_h = jnp.where(pair_ok, jnp.roll(s_h, -1, axis=0).at[-1].set(s), s_h)
            y_h = jnp.where(pair_ok, jnp.roll(y_h, -1, axis=0).at[-1].set(y), y_h)
            rho_h = jnp.where(
                pair_ok,
                jnp.roll(rho_h, -1).at[-1].set(1.0 / jnp.maximum(sy, 1e-12)),
                rho_h,
            )
            valid = jnp.where(pair_ok, jnp.roll(valid, -1).at[-1].set(True), valid)
            gamma = jnp.where(
                pair_ok, sy / jnp.maximum(jnp.dot(y, y), 1e-12), gamma
            )
            carry = (x_new, logp_new, grad_new, s_h, y_h, rho_h, valid, gamma)
            return carry, (x_new, s_h, y_h, valid, gamma)

        init = (
            x0, logp0, grad0,
            jnp.zeros((HISTORY, d), dtype),
            jnp.zeros((HISTORY, d), dtype),
            jnp.zeros((HISTORY,), dtype),
            jnp.zeros((HISTORY,), bool),
            jnp.ones((), dtype),
        )
        _, (path_mu, path_s, path_y, path_valid, path_gamma) = jax.lax.scan(
            step, init, None, length=num_iters
        )

        elbo_keys = jax.random.split(elbo_key, num_iters)

        def point_elbo(mu, s_h, y_h, valid, gamma, k):
            alpha = jnp.full((d,), jnp.maximum(gamma, 1e-8), dtype)
            q, lch, logdet = lowrank_factors(alpha, s_h, y_h, valid)
            z, logq = sample_and_logq(k, mu, alpha, q, lch, logdet,
                                      num_elbo_draws)
            lps = jax.vmap(lambda zz: vag(zz, data)[0])(z)
            lps = jnp.where(jnp.isfinite(lps), lps, -1e30)
            return jnp.mean(lps - logq)

        elbos = jax.vmap(point_elbo)(
            path_mu, path_s, path_y, path_valid, path_gamma, elbo_keys
        )
        elbos = jnp.where(jnp.isfinite(elbos), elbos, -jnp.inf)
        best = jnp.argmax(elbos)
        return (path_mu[best], path_s[best], path_y[best], path_valid[best],
                path_gamma[best], elbos, best)

    mu, s_h, y_h, valid, gamma, elbos, best = run(init_key, elbo_key)

    @jax.jit
    def draw(key):
        alpha = jnp.full((d,), jnp.maximum(gamma, 1e-8), dtype)
        q, lch, logdet = lowrank_factors(alpha, s_h, y_h, valid)
        z, logq = sample_and_logq(key, mu, alpha, q, lch, logdet, num_draws)
        trace = jax.vmap(lambda f: constrain_flat(model.ir, model.pm, f, data))(z)
        return z, logq, trace

    z, logq_draws, trace = draw(draw_key)

    # marginal sds: diag(Sigma) = alpha * (1 + rowsum(Q * (Q @ (LL^T - I))))
    alpha_f = jnp.full((d,), jnp.maximum(gamma, 1e-8), dtype)
    q_f, lch_f, _ = __import__(
        "exmc_tpu.pathfinder_lowrank", fromlist=["lowrank_factors"]
    ).lowrank_factors(alpha_f, s_h, y_h, valid)
    kdim = lch_f.shape[0]
    mmat = q_f @ (lch_f @ lch_f.T - jnp.eye(kdim, dtype=dtype))
    marg_var = alpha_f * (1.0 + jnp.sum(q_f * mmat, axis=1))
    result = {
        "mu": np.asarray(mu),
        "sigma": np.sqrt(np.maximum(np.asarray(marg_var), 1e-12)),
        "elbo_path": np.asarray(elbos),
        "best_iter": int(best),
        "draws": {k: np.asarray(v)[None] for k, v in trace.items()},
        "draws_unconstrained": np.asarray(z)[None],
        "method": "lowrank",
    }
    if psir:
        from exmc_tpu.psir import apply_psir_to_fit

        # the correlated q's exact log-density came with the draws —
        # the marginal-sd "sigma" must NOT be used as a diag q here
        result = apply_psir_to_fit(result, model, np.asarray(logq_draws),
                                   seed=seed + 101, data=data)
    return result

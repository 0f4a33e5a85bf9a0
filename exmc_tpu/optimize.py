"""MAP estimation and Laplace approximation on the compiled log-density.

The reference has no optimizer entry point; Stan's ``optimize`` method
and PyMC's ``find_MAP`` are the surfaces users migrating from those
stacks expect, so this build provides them on top of the same
``CompiledModel`` the samplers use:

- ``fit_map``: maximize the joint log-density with optax L-BFGS inside
  one ``lax.while_loop`` (the whole optimization is a single XLA
  program — no per-iteration host round trips). ``jacobian=False``
  reproduces Stan's default penalized-MLE objective (constrained-space
  density, no change-of-variables terms); ``jacobian=True`` (default)
  optimizes the same unconstrained-space density the samplers target.
- ``laplace``: Gaussian approximation at the (jacobian=True) mode:
  draws from N(z_map, (-H)^-1) pushed through the constraint
  transforms, returned in the standard (1, draws, *shape) trace layout
  so diagnostics/predictive/model-comparison consume it unchanged.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from exmc_tpu import transforms as tf
from exmc_tpu.compiler import CompiledModel, compile_logp, constrain_flat
from exmc_tpu.config import default_dtype


def _as_model(ir_or_model, ncp):
    if isinstance(ir_or_model, CompiledModel):
        return ir_or_model
    return compile_logp(ir_or_model, ncp=ncp)


def _jacobian_correction(pm):
    """flat -> total log|det J| of all constraint transforms (the terms
    the compiler adds for free RVs; subtracting them recovers Stan's
    jacobian=false optimization objective)."""

    def total(flat):
        zmap = pm.unpack(flat)
        out = jnp.zeros((), flat.dtype)
        for e in pm.entries:
            t = tf.get(e.transform)
            out = out + jnp.sum(t.log_abs_det_jacobian(zmap[e.id]))
        return out

    return total


def fit_map(ir_or_model, *, init=None, seed=0, max_iters=1000, tol=1e-5,
            jacobian=True, ncp=False, data=None):
    """Maximum a posteriori point (Stan `optimize`, PyMC `find_MAP`).

    ``ncp=False`` by default: MAP is parameterization-dependent, and
    the mode users mean is the one of the model as written (automatic
    NCP would relocate it through the reparameterization Jacobian).

    Returns ``(point, info)``: ``point`` maps each free RV to its
    constrained MAP value; ``info`` has logp / converged / iters /
    grad_norm (all Python scalars).
    """
    model = _as_model(ir_or_model, ncp)
    dtype = default_dtype()
    d = model.size
    if data is None:
        data = model.data

    objective = model.logp
    if not jacobian:
        corr = _jacobian_correction(model.pm)

        def objective(flat, data=None, _lp=model.logp, _c=corr):
            return _lp(flat, data) - _c(flat)

    def loss(z):
        return -objective(z, data)

    if init is not None:
        z0 = jnp.asarray(model.unconstrain(init), dtype)
    elif seed is None:
        z0 = jnp.zeros((d,), dtype)
    else:
        z0 = 0.1 * jax.random.normal(jax.random.PRNGKey(seed), (d,), dtype)

    if d == 0:  # fully observed model: nothing to optimize
        return {}, {"logp": float(objective(z0, data)), "converged": True,
                    "iters": 0, "grad_norm": 0.0}

    opt = optax.lbfgs()
    vag = optax.value_and_grad_from_state(loss)

    def cond(carry):
        _, _, g, it = carry
        return (jnp.linalg.norm(g) > tol) & (it < max_iters)

    def body(carry):
        z, state, _, it = carry
        value, grad = vag(z, state=state)
        updates, state = opt.update(
            grad, state, z, value=value, grad=grad, value_fn=loss)
        z = optax.apply_updates(z, updates)
        # the zoom linesearch already evaluated grad at the accepted
        # point and stored it — read it instead of a redundant
        # jax.grad call (one full gradient per iteration saved)
        g_new = optax.tree_utils.tree_get(state, "grad")
        return z, state, g_new, it + 1

    @jax.jit
    def run(z0):
        state = opt.init(z0)
        g0 = jax.grad(loss)(z0)
        z, _, g, it = jax.lax.while_loop(cond, body, (z0, state, g0, 0))
        return z, g, it

    z, g, iters = run(z0)
    gnorm = float(jnp.linalg.norm(g))
    point = {k: np.asarray(v)
             for k, v in constrain_flat(model.ir, model.pm, z, data).items()}
    return point, {
        "logp": float(objective(z, data)),
        "converged": bool(gnorm <= tol) and np.isfinite(gnorm),
        "iters": int(iters),
        "grad_norm": gnorm,
        "z_map": np.asarray(z),
    }


def laplace(ir_or_model, *, draws=1000, seed=0, init=None, max_iters=1000,
            ncp=False, data=None, jitter=1e-8, psir=False):
    """Laplace (quadratic) approximation: N(z_map, (-H)^-1) in the
    unconstrained space, pushed through the constraint transforms.

    Returns ``(trace, info)`` with trace arrays shaped
    (1, draws, *event) — drop-in for diagnostics/predictive/LOO.
    ``info`` adds the MAP report plus the covariance factor.

    ``psir=True`` runs Pareto-smoothed importance resampling on the
    Gaussian draws (exmc_tpu/psir.py): the returned trace is resampled
    toward the exact posterior and ``info["psir"]`` carries the k-hat
    reliability diagnostic (k > 0.7 = the quadratic approximation is
    too far off for IS to repair). The Gaussian log-q comes free: the
    draw residuals ARE the standard-normal eps.
    """
    model = _as_model(ir_or_model, ncp)
    if data is None:
        data = model.data
    point, info = fit_map(model, init=init, seed=seed, max_iters=max_iters,
                          jacobian=True, data=data)
    z_map = jnp.asarray(info["z_map"])
    d = model.size
    if d == 0:
        return {}, info

    H = jax.hessian(lambda z: model.logp(z, data))(z_map)
    prec = -(H + H.T) / 2.0
    # escalate jitter until Cholesky succeeds (mirrors gp.py's ladder)
    eye = jnp.eye(d, dtype=prec.dtype)
    chol, used = None, None
    for j in (jitter, 1e-6, 1e-4, 1e-2):
        c = jnp.linalg.cholesky(prec + j * eye)
        if bool(jnp.all(jnp.isfinite(c))):
            chol, used = c, j
            break
    if chol is None:
        raise ValueError(
            "Hessian at the mode is not negative definite (model may be "
            "improper or the optimizer did not converge; "
            f"grad_norm={info['grad_norm']:.3g})")

    # z ~ N(z_map, prec^-1): solve L^T x = eps
    eps = jax.random.normal(
        jax.random.PRNGKey(1 if seed is None else seed + 1),
        (draws, d), z_map.dtype)
    zs = z_map + jax.scipy.linalg.solve_triangular(chol.T, eps.T, lower=False).T

    info = dict(info, hessian_jitter=used,
                cov_logdet=float(-2.0 * jnp.sum(jnp.log(jnp.diag(chol)))))
    if psir:
        from exmc_tpu.psir import psir as _psir

        # q = N(z_map, prec^-1): logq(z) = 0.5 logdet(prec)
        #   - d/2 log 2pi - 0.5 |L^T (z - z_map)|^2, and L^T(z - z_map)
        #   is exactly the eps each draw was built from
        logq = (jnp.sum(jnp.log(jnp.diag(chol)))
                - 0.5 * d * jnp.log(2.0 * jnp.pi)
                - 0.5 * jnp.sum(eps * eps, axis=-1))
        trace, psir_info = _psir(model, zs, np.asarray(logq),
                                 seed=seed if seed is not None else 0,
                                 data=data)
        info["psir"] = psir_info
        return trace, info
    con = jax.vmap(lambda z: constrain_flat(model.ir, model.pm, z, data))
    named = con(zs)
    trace = {k: np.asarray(v)[None, ...] for k, v in named.items()}
    return trace, info

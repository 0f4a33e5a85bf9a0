"""MEADS-style generalized HMC: tuning-free, maximally lockstep.

After Hoffman & Sountsov, "Tuning-Free Generalized Hamiltonian Monte
Carlo" (AISTATS 2022): an ensemble of chains is split into K folds and
every iteration each fold's tuning (preconditioner, step size,
damping) is computed from the CURRENT state of the complementary fold.
No reference counterpart (the reference is NUTS-only,
nuts/sampler.ex); like ChEES (D-T29) this exists because it is
TPU-shaped — here maximally so: ONE gradient per chain per iteration,
no trajectory loop at all, every chain in perfect lockstep, and the
cross-fold statistics are batched matmuls (MXU work, not control
flow).

Correctness is BY CONSTRUCTION, not by trusting tuning heuristics:

* the transition is exact generalized HMC (Horowitz 1991): partial
  refresh of a STANDARDIZED persistent momentum u ~ N(0, I)
  (u <- a*u + sqrt(1-a^2) xi leaves N(0, I) invariant), one
  preconditioned leapfrog step, MH accept on the joint
  -logp(q) + ||u||^2/2, momentum FLIP on rejection (required for
  reversibility of the persistent-momentum chain);
* keeping u standardized makes the preconditioner sigma a parameter of
  the DYNAMICS, not of the momentum distribution — so sigma may change
  every iteration without invalidating the carried momentum;
* folds update SEQUENTIALLY within an iteration (fold k tuned by the
  current state of fold k-1): each stage is a Metropolis-within-Gibbs
  block whose tuning is measurable wrt the OTHER blocks, so each stage
  leaves pi^C invariant and the composition is exactly invariant.
  (A fully simultaneous update, where fold k's tuning reads fold k-1's
  pre-move state while fold k-1 itself moves, does NOT factor in the
  invariance integral — the sequential form dodges that entirely at
  the cost of K small batched stages per iteration instead of one
  big one.)

The per-fold tuning heuristics follow the paper's recipe in spirit
(exact constants may differ — the paper is not bundled; SBC and the
gold battery are the calibration evidence, tests/test_meads.py):

* sigma_d  = cross-chain std of x_d in the complementary fold;
* eps      = 0.5 / sqrt(lam_g), lam_g = largest-eigenvalue estimate of
  the covariance of PRECONDITIONED gradients via the Gram-trace ratio
  trace(S^2)/trace(S) (= sum_mn G_mn^2 / (M * sum_m G_mm) with
  G = Z Z^T) — a lower bound on lambda_max that is tight when the
  spectrum is peaked, computable as one (M, d) x (d, M) matmul;
  jittered per iteration by the shared Halton sequence;
* damping gamma = 1 / sqrt(lam_x) on preconditioned positions (the
  longest autocorrelation timescale), a = exp(-gamma * eps).

Unlike NUTS/ChEES there is no warmup/adaptation split: the kernel is
homogeneous in time (continuously self-tuning, never frozen), so
``num_warmup`` here is just discarded burn-in.

Initialization matters for the SELF-TUNING TRANSIENT (never for
correctness): measured on CPU, Stan-style overdispersed inits on a
concentrated posterior make the cross-chain sigma overestimate the
scale by orders of magnitude, eps collapses (~1e-4) and the ensemble
crawls; a tight cluster in a WIDE posterior explodes eps the other way
(100% divergence, frozen by momentum flips). Default
``init="pathfinder"`` sidesteps both by starting the ensemble from a
Pathfinder fit (posterior-shaped spread -> the eigenvalue estimates
start in their happy regime), falling back to overdispersed draws if
the fit fails.
"""

import warnings

import numpy as np
import jax
import jax.numpy as jnp

from exmc_tpu.compiler import CompiledModel, compile_logp
from exmc_tpu.config import default_dtype
from exmc_tpu.engines_common import KernelCache, postprocess_ensemble

_EPS_FLOOR = 1e-8


def _gram_lambda_max(z):
    """trace(S^2)/trace(S) for S = (1/M) Z Z^T-style covariance of the
    (M, d) centered rows z — the peaked-spectrum largest-eigenvalue
    estimate, via the M x M Gram matrix (one matmul).

    Rows are pre-scaled by their max magnitude before the Gram product
    (lam(z) = s^2 lam(z/s)): unscaled, entries ~3e9 keep tr(G) finite
    in f32 but overflow sum(G*G) to inf, driving lam -> inf/NaN and
    eps -> 0/NaN — a silent permanent ensemble freeze (review finding,
    round 4). Scaled, every intermediate is O(M d) and the residual
    non-finite guard is belt-and-braces."""
    s = jnp.max(jnp.abs(z))
    s = jnp.where(jnp.isfinite(s) & (s > 0), s, 1.0)
    zs = z / s
    g = zs @ zs.T  # (M, M)
    tr_s = jnp.trace(g)
    tr_s2 = jnp.sum(g * g)
    lam = tr_s2 / jnp.maximum(tr_s, _EPS_FLOOR) * (s * s)
    return jnp.where(jnp.isfinite(lam), lam, 1.0 / _EPS_FLOOR)


def _fold_tuning(q, grad, dtype):
    """Per-fold (sigma, eps, damping) from a fold's (M, d) state.

    The step-size eigenvalue uses the UNCENTERED second moment of
    preconditioned gradients: at stationarity the mean gradient is ~0
    so it equals the covariance (the Fisher-like curvature the 0.5/
    sqrt(lambda) rule wants), while OFF-equilibrium the mean-force term
    dominates and automatically shrinks eps. The centered variant
    deadlocks: a tight chain cluster has near-identical gradients, the
    centered covariance underestimates curvature by orders of
    magnitude, eps explodes (measured 100-370 on a 2-d posterior),
    every proposal diverges and the frozen cluster never updates its
    own statistics. Uncentered, the same state gives a finite mean
    force -> sane eps -> the cluster expands and self-tunes
    (tests/test_meads.py pins both regimes)."""
    m = q.shape[0]
    mean_q = jnp.mean(q, axis=0, keepdims=True)
    var_q = jnp.mean((q - mean_q) ** 2, axis=0)
    sigma = jnp.sqrt(var_q + 1e-12)

    zg = grad * sigma[None, :]
    zg = jnp.where(jnp.isfinite(zg), zg, 0.0)
    lam_g = _gram_lambda_max(zg) / m
    eps = 0.5 / jnp.sqrt(jnp.maximum(lam_g, _EPS_FLOOR))

    zx = (q - mean_q) / sigma[None, :]
    lam_x = _gram_lambda_max(zx) / m
    gamma = 1.0 / jnp.sqrt(jnp.maximum(lam_x, 1.0))  # lam_x >= ~1 by constr.
    return sigma.astype(dtype), eps.astype(dtype), gamma.astype(dtype)


def sample_meads(ir, *, num_chains=128, num_folds=4, num_warmup=500,
                 num_samples=1000, seed=0, init="pathfinder", data=None,
                 ncp=True, step_size_scale=1.0, max_step_size=None,
                 return_unconstrained=False):
    """MEADS-style GHMC over ``num_chains`` chains in ``num_folds``
    folds. Returns (trace, stats) like sample(); stats arrays are
    (chains, samples); ``step_size``/``damping`` are the (folds,)
    tuning at the last iteration (the kernel never freezes).

    ``init``: "pathfinder" (default — ensemble drawn from a Pathfinder
    fit; see the module docstring on why the self-tuning transient
    wants a posterior-shaped start), "random" (overdispersed per-chain
    draws, Stan-style), or a dict of named values (broadcast to all
    chains with small jitter).

    ``step_size_scale`` multiplies the automatic step size (the
    paper's 0.5 head-room factor is built in); ``max_step_size``
    optionally caps it (useful for very small ensembles where the
    eigenvalue estimates are noisy).
    """
    if num_chains % num_folds != 0:
        raise ValueError(
            f"num_chains={num_chains} not divisible by folds={num_folds}")
    if num_folds < 2:
        raise ValueError("MEADS needs >= 2 folds (tuning must come from "
                         "a complementary fold)")
    per_fold = num_chains // num_folds
    if per_fold < 2:
        raise ValueError("need >= 2 chains per fold for cross-chain "
                         "variance estimates")
    model = ir if isinstance(ir, CompiledModel) else compile_logp(ir, ncp=ncp)
    if data is None:
        data = model.data if isinstance(ir, CompiledModel) else ir.data
    d = model.size
    if d == 0:
        return {}, {"note": "model has no free parameters"}
    dtype = default_dtype()

    model, run = _cached_kernel(ir, model, ncp, num_chains, num_folds,
                                num_warmup, num_samples,
                                float(step_size_scale), max_step_size)

    base = jax.random.PRNGKey(seed)
    init_keys = jax.vmap(jax.random.fold_in, (None, 0))(
        jax.random.fold_in(base, 10_000_019), jnp.arange(num_chains))
    jit_key = jax.random.fold_in(base, 5)
    if isinstance(init, dict):
        flat0 = model.unconstrain(init).astype(dtype)
        q_inits = (flat0[None, :]
                   + 0.01 * jax.random.normal(jit_key, (num_chains, d),
                                              dtype))
    elif init == "pathfinder":
        q_inits = _pathfinder_ensemble(ir, model, data, ncp, num_chains,
                                       seed, dtype, jit_key)
    elif init == "random" or init is None:
        q_inits = None  # overdispersed per-chain draws inside the kernel
    else:
        raise ValueError(f"unknown init {init!r} "
                         "(dict | 'pathfinder' | 'random')")

    outs, tuning = run(q_inits, init_keys, data,
                       jax.random.fold_in(base, 77_377))

    return postprocess_ensemble(
        outs, model, data, num_chains, num_samples, return_unconstrained,
        extra_stats={"step_size": np.asarray(tuning["eps"]),
                     "damping": np.asarray(tuning["gamma"])})


def _pathfinder_ensemble(ir, model, data, ncp, num_chains, seed, dtype, key):
    """Ensemble init from a Pathfinder diag fit, in FLAT (unconstrained)
    space; returns None (-> overdispersed in-kernel draws) if the fit
    fails or is non-finite. Init choice never affects invariance — only
    the self-tuning transient (module docstring)."""
    from exmc_tpu.pathfinder import pathfinder_fit

    try:
        fit = pathfinder_fit(ir, num_iters=100, num_draws=2,
                             num_elbo_draws=10, seed=seed + 89,
                             data=data, ncp=ncp)
    except Exception as e:  # noqa: BLE001 — any fit failure downgrades init
        warnings.warn(
            f"MEADS init='pathfinder' fit failed ({type(e).__name__}: {e}); "
            "falling back to overdispersed inits — expect a slower "
            "self-tuning transient on concentrated posteriors",
            stacklevel=3)
        return None
    mu, sigma = np.asarray(fit["mu"]), np.asarray(fit["sigma"])
    if not (np.all(np.isfinite(mu)) and np.all(np.isfinite(sigma))
            and np.all(sigma > 0)):
        warnings.warn(
            "MEADS init='pathfinder' fit returned non-finite moments; "
            "falling back to overdispersed inits", stacklevel=3)
        return None
    # cap the spread at O(1) per unconstrained coordinate: the fitted
    # MODE is usually sound even when the diag fit's sigma blows up
    # (measured: an eight_schools fit put sigma=8.7 on log-tau, chains
    # initialized at tau ~ e^9 in a divergent plateau and froze there)
    sigma = np.minimum(sigma, 1.0)
    z = jax.random.normal(key, (num_chains, mu.shape[0]), dtype)
    return jnp.asarray(mu, dtype)[None, :] + jnp.asarray(sigma, dtype) * z


_KERNEL_CACHE = KernelCache()


def clear_kernel_cache():
    _KERNEL_CACHE.clear()


def _cached_kernel(ir, model, ncp, num_chains, num_folds, num_warmup,
                   num_samples, step_size_scale, max_step_size):
    key = (KernelCache.model_sig(ir, ncp), num_chains, num_folds,
           num_warmup, num_samples, step_size_scale, max_step_size)
    return _KERNEL_CACHE.get_or_build(
        key, model,
        lambda: _build_kernel(model, num_chains, num_folds, num_warmup,
                              num_samples, step_size_scale, max_step_size))


def _build_kernel(model, num_chains, num_folds, num_warmup, num_samples,
                  step_size_scale, max_step_size):
    """Traceable MEADS kernel: ``run(q_inits, init_keys, data, key) ->
    (outs, tuning)``; outs are post-burn-in, (num_samples, chains, ...).
    Same two-scan shape as the ChEES kernel (warmup scan emits no
    outputs), composable under vmap for sbc(engine="meads")."""
    from exmc_tpu.chees import _halton_base2

    d = model.size
    dtype = default_dtype()
    vag = model.value_and_grad
    per_fold = num_chains // num_folds
    total = num_warmup + num_samples
    halton = _halton_base2(total)
    # jitter in [0.5, 1): resonance-breaking without tiny steps
    jitter = 0.5 + 0.5 * halton

    xs_warm = {"u": jnp.asarray(jitter[:num_warmup], dtype),
               "i": jnp.arange(num_warmup)}
    xs_samp = {"u": jnp.asarray(jitter[num_warmup:], dtype),
               "i": jnp.arange(num_warmup, total)}

    def run(q_inits, init_keys, data, noise_key):
        from exmc_tpu.nuts.sampler import _find_valid_init

        def vag_fn(q):
            return vag(q, data)

        if q_inits is None:
            # overdispersed per-chain fallback (init="random", or the
            # pathfinder fit failed) — see the module docstring on the
            # self-tuning transient this can cost
            q0, logp0, grad0, keys = jax.vmap(
                lambda k: _find_valid_init(vag_fn, k, d, dtype))(init_keys)
        else:
            q0, logp0, grad0, keys = jax.vmap(
                lambda k, qi: _find_valid_init(vag_fn, k, d, dtype, qi)
            )(init_keys, q_inits)

        u0 = jax.random.normal(noise_key, (num_chains, d), dtype)

        carry = dict(q=q0, logp=logp0, grad=grad0, u=u0, keys=keys)

        def step(carry, x):
            keys = jax.vmap(
                lambda k: jax.random.fold_in(k, x["i"]))(carry["keys"])
            # raw PRNG keys may carry a trailing (2,) uint32 axis
            kf = keys.reshape((num_folds, per_fold) + keys.shape[1:])

            # (K, M, ...) fold views, updated SEQUENTIALLY: fold k's
            # tuning reads fold k-1's CURRENT state (fold 0 reads fold
            # K-1's pre-iteration state) — Metropolis-within-Gibbs
            # stages, unrolled (num_folds is small and static)
            q = carry["q"].reshape(num_folds, per_fold, d)
            logp = carry["logp"].reshape(num_folds, per_fold)
            grad = carry["grad"].reshape(num_folds, per_fold, d)
            u = carry["u"].reshape(num_folds, per_fold, d)

            acc_f, div_f, en_f, eps_f, gam_f = [], [], [], [], []
            for k in range(num_folds):
                prev = (k - 1) % num_folds
                sigma, eps, gamma = _fold_tuning(q[prev], grad[prev], dtype)
                eps = eps * (step_size_scale * x["u"])
                if max_step_size is not None:
                    eps = jnp.minimum(eps, max_step_size)
                alpha = jnp.exp(-gamma * eps)

                ref_keys = jax.vmap(
                    lambda kk: jax.random.fold_in(kk, 1))(kf[k])
                acc_keys = jax.vmap(
                    lambda kk: jax.random.fold_in(kk, 2))(kf[k])

                # partial refresh of standardized momentum
                # (N(0,I)-invariant for any alpha)
                xi = jax.vmap(
                    lambda kk: jax.random.normal(kk, (d,), dtype))(ref_keys)
                uk = alpha * u[k] + jnp.sqrt(1.0 - alpha ** 2) * xi

                # one preconditioned leapfrog step, standardized
                # momentum: u_half = u + (eps/2) sigma*grad;
                #           q' = q + eps sigma*u_half
                joint0 = logp[k] - 0.5 * jnp.sum(uk * uk, axis=-1)
                u_half = uk + 0.5 * eps * sigma[None, :] * grad[k]
                q1 = q[k] + eps * sigma[None, :] * u_half
                logp1, grad1 = jax.vmap(vag_fn)(q1)
                u1 = u_half + 0.5 * eps * sigma[None, :] * grad1

                joint1 = logp1 - 0.5 * jnp.sum(u1 * u1, axis=-1)
                delta = joint1 - joint0
                # a finite-logp endpoint with a non-finite gradient must
                # be REJECTED, not just survive the energy check: the
                # accepted grad is carried into every later leapfrog and
                # a NaN there freezes the chain permanently (grad is only
                # refreshed on accept — review finding, round 4)
                grad_ok = jnp.all(jnp.isfinite(grad1), axis=-1)
                delta = jnp.where(jnp.isfinite(delta) & grad_ok,
                                  delta, -jnp.inf)
                accept_prob = jnp.exp(jnp.minimum(delta, 0.0))
                diverging = delta < -1000.0

                un = jax.vmap(lambda kk: jax.random.uniform(kk))(acc_keys)
                take = un < accept_prob
                q = q.at[k].set(jnp.where(take[:, None], q1, q[k]))
                logp = logp.at[k].set(jnp.where(take, logp1, logp[k]))
                grad = grad.at[k].set(
                    jnp.where(take[:, None], grad1, grad[k]))
                # momentum flip on rejection: the Horowitz
                # reversibility fix for persistent momentum
                u = u.at[k].set(jnp.where(take[:, None], u1, -uk))
                acc_f.append(accept_prob)
                div_f.append(diverging)
                en_f.append(-jnp.where(take, joint1, joint0))
                eps_f.append(eps)
                gam_f.append(gamma)

            new_carry = dict(
                q=q.reshape(num_chains, d),
                logp=logp.reshape(num_chains),
                grad=grad.reshape(num_chains, d),
                u=u.reshape(num_chains, d),
                keys=carry["keys"])
            out = dict(q=new_carry["q"], logp=new_carry["logp"],
                       accept_prob=jnp.concatenate(acc_f),
                       diverging=jnp.concatenate(div_f),
                       energy=jnp.concatenate(en_f))
            return new_carry, out, jnp.stack(eps_f), jnp.stack(gam_f)

        def warm_step(carry, x):
            new_carry, _, _, _ = step(carry, x)
            return new_carry, None

        def samp_step(carry, x):
            new_carry, out, eps, gamma = step(carry, x)
            return new_carry, (out, eps, gamma)

        carry, _ = jax.lax.scan(warm_step, carry, xs_warm)
        carry, (outs, eps_hist, gamma_hist) = jax.lax.scan(
            samp_step, carry, xs_samp)
        tuning = dict(eps=eps_hist[-1], gamma=gamma_hist[-1])
        return outs, tuning

    return run

"""Sequential Monte Carlo with likelihood tempering, on the compiled
log-density (reference smc.ex).

Parity notes:
* the beta ladder is found by bisection targeting ESS = threshold * N
  (smc.ex:147-178);
* systematic resampling (smc.ex:180-195);
* MH mutation with per-dimension proposal scale 2.38/sqrt(d) * std
  (smc.ex:197-247);
* QUIRK mirrored deliberately: tempering applies delta_beta to the FULL
  log-density (prior included), not just the likelihood
  (smc.ex:107-110) — behavior parity, not the docstring.

TPU-native: particles are a (N, d) array; weighting/resampling/mutation
are jitted vmapped kernels. The (data-dependent, ~tens of stages) beta
ladder runs as a host loop around them — the Python-loop analogue of
the reference's recursive do_smc.
"""

import numpy as np
import jax
import jax.numpy as jnp

from exmc_tpu.compiler import CompiledModel, compile_logp, constrain_flat
from exmc_tpu.config import default_dtype


def _systematic_resample(key, log_w, n):
    """Systematic resampling (smc.ex:180-195): one uniform, n strata."""
    w = jnp.exp(log_w - jax.scipy.special.logsumexp(log_w))
    cum = jnp.cumsum(w)
    u0 = jax.random.uniform(key)
    pts = (u0 + jnp.arange(n)) / n
    return jnp.searchsorted(cum, pts)


def smc_sample(ir, *, num_particles=1000, ess_threshold=0.5, num_mh_steps=5,
               seed=0, data=None, ncp=True, max_stages=200,
               tempering="full"):
    """Run tempering SMC (reference SMC.sample, smc.ex:19).

    Returns (trace, info): trace is a constrained named trace with shape
    (1, num_particles, ...); info holds the beta ladder, ESS history and
    acceptance rates.

    ``tempering``:
      * ``"full"`` (default, reference parity incl. its quirk): the
        path is pi_beta ~ exp(beta * logp) from an N(0, I) start. The
        beta=0 base is improper, so no evidence estimate exists.
      * ``"likelihood"``: the proper-Bayes path
        pi_beta ~ prior(x) * lik(x)^beta, initialized from PRIOR draws
        (forward-sampled, then unconstrained), tempering only the
        observation terms (compiler.partial_logp split). This yields
        the standard SMC marginal-likelihood estimator
        log Z = sum_stages [logsumexp(delta * loglik) - log N],
        returned as ``info["log_evidence"]`` — validated against a
        closed-form conjugate evidence and the flow ELBO bound
        (tests/test_smc.py). Beyond the reference (smc.ex has no
        evidence path).
    """
    model = ir if isinstance(ir, CompiledModel) else compile_logp(ir, ncp=ncp)
    dtype = default_dtype()
    d = model.size
    if data is None:
        data = model.data
    if tempering not in ("full", "likelihood"):
        raise ValueError(
            f"tempering must be 'full' or 'likelihood', got {tempering!r}")

    key = jax.random.PRNGKey(seed)
    key, init_key = jax.random.split(key)

    if tempering == "likelihood":
        from exmc_tpu.compiler import partial_logp
        from exmc_tpu.predictive import prior_samples

        prior_fn = partial_logp(model, "prior")
        lik_fn = partial_logp(model, "likelihood")
        batch_lp0 = jax.jit(jax.vmap(lambda z: prior_fn(z, data)))
        batch_lt = jax.jit(jax.vmap(lambda z: lik_fn(z, data)))
        names = [e.id for e in model.pm.entries]
        if isinstance(ir, CompiledModel):
            # only the REWRITTEN IR exists: forward-sample it as-is
            # (NCP'd nodes emit their z values directly) and invert
            # only the per-entry transforms — model.unconstrain would
            # wrongly re-invert NCP on values that are already z
            # (review finding, round 4)
            draws = prior_samples(model.ir, num_draws=num_particles,
                                  seed=seed + 7919, data=data,
                                  rewritten=True)
            sub = {k: jnp.asarray(draws[k], dtype) for k in names}
            particles = jax.jit(
                jax.vmap(model.pm.to_unconstrained))(sub).astype(dtype)
        else:
            draws = prior_samples(ir, num_draws=num_particles,
                                  seed=seed + 7919, data=data)
            sub = {k: jnp.asarray(draws[k], dtype) for k in names}
            particles = jax.jit(
                jax.vmap(model.unconstrain))(sub).astype(dtype)
    else:
        logp_flat = model.logp
        batch_lt = jax.jit(jax.vmap(lambda z: logp_flat(z, data)))
        batch_lp0 = None  # beta=0 base is flat (the reference's quirk)
        particles = jax.random.normal(init_key, (num_particles, d), dtype)

    # lt = the TEMPERED term (full logp, or loglik only);
    # lp0 = the untempered base (0, or the prior)
    lts = batch_lt(particles)
    lp0s = batch_lp0(particles) if batch_lp0 is not None else jnp.zeros_like(lts)

    def ess_at(delta_beta, lts):
        log_w = delta_beta * lts  # full-logp tempering (smc.ex:107-110)
        log_w = log_w - jnp.max(log_w)
        w = jnp.exp(log_w)
        return jnp.sum(w) ** 2 / jnp.sum(w * w)

    target_ess = ess_threshold * num_particles

    @jax.jit
    def find_delta(lts, beta):
        """Bisect delta_beta so ESS ~= target (smc.ex:147-178)."""
        def body(_, carry):
            lo, hi = carry
            mid = 0.5 * (lo + hi)
            e = ess_at(mid, lts)
            lo = jnp.where(e >= target_ess, mid, lo)
            hi = jnp.where(e >= target_ess, hi, mid)
            return lo, hi

        lo, hi = jax.lax.fori_loop(
            0, 50, body, (jnp.zeros((), dtype), 1.0 - beta)
        )
        return jnp.maximum(lo, 1e-6)

    @jax.jit
    def mutate(key, particles, lp0s, lts, beta):
        """num_mh_steps of random-walk MH targeting lp0 + beta * lt
        (smc.ex:197-247; lp0 = 0 reproduces the reference's full-logp
        target exactly)."""
        scale = 2.38 / np.sqrt(d) * jnp.std(particles, axis=0)

        def mh_step(carry, key):
            particles, lp0s, lts, n_acc = carry
            pk, ak = jax.random.split(key)
            prop = particles + scale * jax.random.normal(pk, particles.shape, dtype)
            lts_prop = batch_lt(prop)
            lp0s_prop = (batch_lp0(prop) if batch_lp0 is not None
                         else jnp.zeros_like(lts_prop))
            log_alpha = (lp0s_prop + beta * lts_prop) - (lp0s + beta * lts)
            accept = jnp.log(jax.random.uniform(ak, (num_particles,))) < log_alpha
            particles = jnp.where(accept[:, None], prop, particles)
            lts = jnp.where(accept, lts_prop, lts)
            lp0s = jnp.where(accept, lp0s_prop, lp0s)
            return (particles, lp0s, lts, n_acc + jnp.mean(accept)), None

        keys = jax.random.split(key, num_mh_steps)
        (particles, lp0s, lts, n_acc), _ = jax.lax.scan(
            mh_step, (particles, lp0s, lts, jnp.zeros((), dtype)), keys
        )
        return particles, lp0s, lts, n_acc / num_mh_steps

    beta = 0.0
    betas, ess_hist, acc_hist = [0.0], [], []
    log_evidence = 0.0
    stage = 0
    while beta < 1.0 and stage < max_stages:
        delta = float(find_delta(lts, beta))
        delta = min(delta, 1.0 - beta)
        log_w = delta * np.asarray(lts, np.float64)
        ess_hist.append(float(ess_at(delta, lts)))
        # standard SMC evidence increment: log mean incremental weight
        # over the CURRENT (equally-weighted) particle set
        finite_w = log_w[np.isfinite(log_w)]
        if finite_w.size:
            mx = finite_w.max()
            log_evidence += mx + np.log(
                np.exp(finite_w - mx).sum() / num_particles)
        else:
            log_evidence = -np.inf

        key, rkey, mkey = jax.random.split(key, 3)
        idx = _systematic_resample(rkey, jnp.asarray(log_w), num_particles)
        particles = particles[idx]
        lts = lts[idx]
        lp0s = lp0s[idx]

        beta = beta + delta
        particles, lp0s, lts, acc = mutate(
            mkey, particles, lp0s, lts, jnp.asarray(beta, dtype))
        betas.append(float(beta))
        acc_hist.append(float(acc))
        stage += 1

    converged = beta >= 1.0
    if not converged:
        import warnings

        warnings.warn(
            f"SMC beta ladder stopped at beta={beta:.4f} after max_stages="
            f"{max_stages}; the returned particles target the TEMPERED "
            "density, not the posterior", stacklevel=2,
        )
    trace = jax.jit(jax.vmap(lambda f: constrain_flat(model.ir, model.pm, f, data)))(particles)
    trace = {k: np.asarray(v)[None] for k, v in trace.items()}
    info = {
        "betas": np.asarray(betas),
        "ess": np.asarray(ess_hist),
        "accept_rates": np.asarray(acc_hist),
        "num_stages": stage,
        "converged": converged,
        "particles_unconstrained": np.asarray(particles)[None],
    }
    if tempering == "likelihood":
        # only the proper-prior path telescopes to the marginal
        # likelihood (the full-logp path starts from an improper base)
        info["log_evidence"] = float(log_evidence) if converged else None
    return trace, info

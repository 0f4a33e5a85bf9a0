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
               seed=0, data=None, ncp=True, max_stages=200):
    """Run likelihood-tempering SMC (reference SMC.sample, smc.ex:19).

    Returns (trace, info): trace is a constrained named trace with shape
    (1, num_particles, ...); info holds the beta ladder, ESS history and
    acceptance rates."""
    model = ir if isinstance(ir, CompiledModel) else compile_logp(ir, ncp=ncp)
    dtype = default_dtype()
    d = model.size
    if data is None:
        data = model.data

    logp_flat = model.logp
    batch_logp = jax.jit(jax.vmap(lambda z: logp_flat(z, data)))

    key = jax.random.PRNGKey(seed)
    key, init_key = jax.random.split(key)
    particles = jax.random.normal(init_key, (num_particles, d), dtype)
    lps = batch_logp(particles)

    def ess_at(delta_beta, lps):
        log_w = delta_beta * lps  # full-logp tempering (smc.ex:107-110)
        log_w = log_w - jnp.max(log_w)
        w = jnp.exp(log_w)
        return jnp.sum(w) ** 2 / jnp.sum(w * w)

    target_ess = ess_threshold * num_particles

    @jax.jit
    def find_delta(lps, beta):
        """Bisect delta_beta so ESS ~= target (smc.ex:147-178)."""
        def body(_, carry):
            lo, hi = carry
            mid = 0.5 * (lo + hi)
            e = ess_at(mid, lps)
            lo = jnp.where(e >= target_ess, mid, lo)
            hi = jnp.where(e >= target_ess, hi, mid)
            return lo, hi

        lo, hi = jax.lax.fori_loop(
            0, 50, body, (jnp.zeros((), dtype), 1.0 - beta)
        )
        return jnp.maximum(lo, 1e-6)

    @jax.jit
    def mutate(key, particles, lps, beta):
        """num_mh_steps of random-walk MH targeting beta * logp
        (smc.ex:197-247)."""
        scale = 2.38 / np.sqrt(d) * jnp.std(particles, axis=0)

        def mh_step(carry, key):
            particles, lps, n_acc = carry
            pk, ak = jax.random.split(key)
            prop = particles + scale * jax.random.normal(pk, particles.shape, dtype)
            lps_prop = batch_logp(prop)
            log_alpha = beta * (lps_prop - lps)
            accept = jnp.log(jax.random.uniform(ak, (num_particles,))) < log_alpha
            particles = jnp.where(accept[:, None], prop, particles)
            lps = jnp.where(accept, lps_prop, lps)
            return (particles, lps, n_acc + jnp.mean(accept)), None

        keys = jax.random.split(key, num_mh_steps)
        (particles, lps, n_acc), _ = jax.lax.scan(
            mh_step, (particles, lps, jnp.zeros((), dtype)), keys
        )
        return particles, lps, n_acc / num_mh_steps

    beta = 0.0
    betas, ess_hist, acc_hist = [0.0], [], []
    stage = 0
    while beta < 1.0 and stage < max_stages:
        delta = float(find_delta(lps, beta))
        delta = min(delta, 1.0 - beta)
        log_w = delta * np.asarray(lps)
        ess_hist.append(float(ess_at(delta, lps)))

        key, rkey, mkey = jax.random.split(key, 3)
        idx = _systematic_resample(rkey, jnp.asarray(log_w), num_particles)
        particles = particles[idx]
        lps = lps[idx]

        beta = beta + delta
        particles, lps, acc = mutate(mkey, particles, lps, jnp.asarray(beta, dtype))
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
    return trace, info

"""Pareto-smoothed importance resampling (PSIR) — exactness repair for
the approximate engines (beyond the reference; Yao et al. 2018 "Yes,
but did it work?", Zhang et al. 2022 Pathfinder §2.3).

Laplace, ADVI, and Pathfinder all return draws from a Gaussian (or
diag-Gaussian) q that only approximates the posterior. Because every
one of them works in the SAME unconstrained space as the compiled
log-density, the importance ratio log w = logp(z) − logq(z) is exact
and free — one batched logp evaluation. PSIR:

1. computes log w for each approximate draw,
2. Pareto-smooths the tail (the same Zhang-Stephens GPD fit PSIS-LOO
   uses, ``model_comparison._psis_smooth``), which both stabilizes the
   resampling and yields the k-hat diagnostic — the "did it work?"
   answer (k < 0.5 good, 0.5–0.7 usable, > 0.7 the approximation is
   too far from the posterior for IS to fix),
3. resamples draws with probability ∝ smoothed w (with replacement —
   Yao 2018's PSIR), pushing the approximation toward the exact
   posterior wherever the tail is light enough.

Surfaces: ``psir()`` on raw (draws, logq) pairs, and ``psir=True``
kwargs on :func:`exmc_tpu.optimize.laplace`,
:func:`exmc_tpu.advi.advi_fit`, and
:func:`exmc_tpu.pathfinder.pathfinder_fit`.
"""

import warnings

import numpy as np
import jax
import jax.numpy as jnp

from exmc_tpu.compiler import CompiledModel, compile_logp, constrain_flat
from exmc_tpu.model_comparison import _psis_smooth

__all__ = ["psir", "diag_normal_logq", "apply_psir_to_fit"]


def diag_normal_logq(z, mu, sigma):
    """log N(z | mu, diag(sigma^2)) per row of z: (S, d) -> (S,)."""
    z = jnp.asarray(z)
    mu = jnp.asarray(mu)
    sigma = jnp.asarray(sigma)
    resid = (z - mu) / sigma
    return (
        -0.5 * jnp.sum(resid * resid, axis=-1)
        - jnp.sum(jnp.log(sigma))
        - 0.5 * z.shape[-1] * jnp.log(2.0 * jnp.pi)
    )


def psir(ir_or_model, draws_unconstrained, logq, *, num_resample=None,
         seed=0, data=None, ncp=True):
    """Resample approximate draws toward the exact posterior.

    ``draws_unconstrained``: (S, d) proposal draws in the compiled
    model's unconstrained space. ``logq``: (S,) proposal log-density at
    each draw (same space). Returns ``(trace, info)``: ``trace`` maps
    each free RV to (1, num_resample, *shape) constrained arrays (the
    standard layout diagnostics/LOO/predictive consume), ``info`` has

    - ``pareto_k``: the GPD tail shape of the importance ratios,
    - ``ess_is``: the importance-sampling effective sample size
      (1/sum w̄²) of the SMOOTHED weights,
    - ``log_weights``: smoothed (S,) log importance ratios,
    - ``indices``: the resampled row indices into the input draws.
    """
    model = (ir_or_model if isinstance(ir_or_model, CompiledModel)
             else compile_logp(ir_or_model, ncp=ncp))
    if data is None:
        data = model.data
    z = jnp.asarray(draws_unconstrained)
    if z.ndim != 2:
        raise ValueError(f"draws must be (S, d), got {z.shape}")
    s = z.shape[0]
    logq = np.asarray(logq, np.float64).reshape(-1)
    if logq.shape[0] != s:
        raise ValueError(f"logq has {logq.shape[0]} rows, draws {s}")
    if num_resample is None:
        num_resample = s

    logp = np.asarray(
        jax.jit(jax.vmap(lambda q: model.logp(q, data)))(z), np.float64)
    log_w = logp - logq
    finite = np.isfinite(log_w)
    log_w = np.where(finite, log_w, -np.inf)
    if not finite.any():
        raise ValueError("all importance ratios are non-finite (the "
                         "proposal misses the posterior's support)")
    smoothed, k_hat, fitted = _psis_smooth(
        np.where(finite, log_w, log_w[finite].min()))
    if not fitted:
        # the tail fit could not run (degenerate proposal / tiny S):
        # report UNKNOWN, not 0.0 = excellent — k-hat is the 'did it
        # work?' answer and must not claim success it cannot assess
        k_hat = float("nan")
        warnings.warn(
            "psir: the Pareto tail fit could not run (too few positive "
            "tail exceedances) — pareto_k is NaN; treat the resampled "
            "draws with suspicion", stacklevel=2)
    smoothed = np.where(finite, smoothed, -np.inf)
    w = np.exp(smoothed - smoothed.max())
    w = w / w.sum()
    ess_is = float(1.0 / np.sum(w * w))

    rng = np.random.default_rng(seed)
    idx = rng.choice(s, size=num_resample, replace=True, p=w)
    kept = z[jnp.asarray(idx)]
    named = jax.jit(jax.vmap(
        lambda f: constrain_flat(model.ir, model.pm, f, data)))(kept)
    trace = {k: np.asarray(v)[None] for k, v in named.items()}
    return trace, {
        "pareto_k": float(k_hat),
        "ess_is": ess_is,
        "log_weights": smoothed,
        "indices": idx,
    }


def apply_psir_to_fit(result, model, logq, *, seed=0, data=None):
    """Post-process an ADVI/Pathfinder-style fit dict (with ``draws``
    and ``draws_unconstrained`` (1, S, d)) through PSIR. Returns a new
    dict whose draws are resampled and which carries the diagnostics
    under ``"psir"``."""
    z0 = np.asarray(result["draws_unconstrained"][0])
    trace, info = psir(model, z0, logq, seed=seed, data=data)
    out = dict(result)
    out["draws"] = trace
    out["draws_unconstrained"] = z0[info["indices"]][None]
    out["psir"] = info
    return out

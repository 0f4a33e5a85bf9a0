"""Hidden Markov models by exact marginalization (beyond the reference
— no discrete-latent machinery exists in borodark/exmc; this is the
Stan-manual approach, natively TPU-shaped: the forward recursion is one
``lax.scan`` whose body is a batched logsumexp-matmul, so NUTS samples
only the continuous parameters and the K discrete states never appear
in the chain).

Pieces:

* :func:`forward_logp` — log p(y_1:T) by the forward algorithm
  (validated against brute-force path enumeration, tests/test_hmm.py);
* :func:`hmm_dist` — wraps an emission log-density into a ``Custom``
  distribution over the WHOLE observed sequence, so a model says
  ``m.rv("y", hmm_dist(emission, K), {"trans": ..., "init": ...,
  <emission params>}); m.obs("y_obs", "y", y)`` and every engine
  (NUTS, ChEES, SMC, ADVI, flows) works unchanged;
* :func:`posterior_state_probs` — forward-backward smoothing
  gamma_t(k) = p(s_t = k | y, theta), vmapped over posterior draws;
* :func:`viterbi` — MAP state path per posterior draw.

Label switching: give state-indexed location parameters an ``ordered``
transform (the same fix as mixture models; the example does this).
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.scipy.special import logsumexp

from exmc_tpu.dists.composite import Custom

__all__ = ["forward_logp", "hmm_dist", "posterior_state_probs", "viterbi"]


def forward_logp(log_obs, log_trans, log_init):
    """log p(y_1:T | theta): ``log_obs`` (T, K) per-state emission
    log-densities, ``log_trans`` (K, K) rows = from-state, ``log_init``
    (K,). One scan of length T-1; each step is a (K, K) logsumexp
    contraction."""
    alpha0 = log_init + log_obs[0]

    def step(alpha, lo):
        alpha = lo + logsumexp(alpha[:, None] + log_trans, axis=0)
        return alpha, None

    alpha, _ = jax.lax.scan(step, alpha0, log_obs[1:])
    return logsumexp(alpha)


def _log_obs_matrix(emission_logpdf, y, params, K):
    """(T, K) emission log-densities: broadcast y against the K states.
    ``emission_logpdf(y_col, k, params)`` returns (T,) for state k —
    vmapped over states (states are a static small axis)."""
    cols = [emission_logpdf(y, k, params) for k in range(K)]
    return jnp.stack(cols, axis=-1)


def hmm_dist(emission_logpdf, K, *, stationary_init=False):
    """A ``Custom`` distribution whose value is the WHOLE observed
    sequence. ``params`` must carry ``trans`` (K, K row-stochastic;
    rows may be sampled simplexes) and, unless ``stationary_init``,
    ``init`` (K, simplex). Remaining params go to the emission.

    ``emission_logpdf(y, k, params) -> (T,)``: the state-k emission
    log-density of each observation (k is a static Python int, so
    per-state parameters index as ``params["mu"][k]``).

    ``stationary_init=True`` uses the transition matrix's stationary
    distribution (power iteration, 32 steps — differentiable) instead
    of a sampled ``init``."""

    def logpdf(x, params):
        trans = jnp.asarray(params["trans"])
        log_trans = jnp.log(jnp.clip(trans, 1e-30, 1.0))
        if stationary_init:
            init = _stationary(trans, K)
        else:
            init = jnp.asarray(params["init"])
        log_init = jnp.log(jnp.clip(init, 1e-30, 1.0))
        log_obs = _log_obs_matrix(emission_logpdf, x, params, K)
        return forward_logp(log_obs, log_trans, log_init)

    return Custom(logpdf)


def _stationary(trans, K):
    pi = jnp.full((K,), 1.0 / K, jnp.asarray(trans).dtype)
    for _ in range(32):
        pi = pi @ trans
    return pi / jnp.sum(pi)


def _prep(emission_logpdf, y, params, K, stationary_init):
    trans = jnp.asarray(params["trans"])
    log_trans = jnp.log(jnp.clip(trans, 1e-30, 1.0))
    if stationary_init:
        init = _stationary(trans, K)
    else:
        init = jnp.asarray(params.get("init", jnp.full((K,), 1.0 / K)))
    log_init = jnp.log(jnp.clip(init, 1e-30, 1.0))
    log_obs = _log_obs_matrix(emission_logpdf, jnp.asarray(y), params, K)
    return log_obs, log_trans, log_init


def posterior_state_probs(emission_logpdf, y, params, K,
                          stationary_init=False):
    """Forward-backward smoothing gamma (T, K): p(s_t = k | y, theta)
    for ONE parameter draw; vmap over a stacked-draws params pytree for
    the full posterior (example 42 does). Pass the SAME
    ``stationary_init`` the model's hmm_dist used — decoding under a
    different initial distribution than the fit skews gamma near t=0
    (review finding, round 4)."""
    log_obs, log_trans, log_init = _prep(emission_logpdf, y, params, K,
                                         stationary_init)

    def fwd(alpha, lo):
        alpha = lo + logsumexp(alpha[:, None] + log_trans, axis=0)
        return alpha, alpha

    alpha0 = log_init + log_obs[0]
    _, alphas = jax.lax.scan(fwd, alpha0, log_obs[1:])
    alphas = jnp.concatenate([alpha0[None], alphas], axis=0)  # (T, K)

    def bwd(beta, lo):
        beta = logsumexp(log_trans + (lo + beta)[None, :], axis=1)
        return beta, beta

    betaT = jnp.zeros((K,), log_obs.dtype)
    _, betas_rev = jax.lax.scan(bwd, betaT, log_obs[1:][::-1])
    betas = jnp.concatenate([betas_rev[::-1], betaT[None]], axis=0)

    lg = alphas + betas
    return jnp.exp(lg - logsumexp(lg, axis=1, keepdims=True))


def viterbi(emission_logpdf, y, params, K, stationary_init=False):
    """MAP state path (T,) int32 for ONE parameter draw. Match
    ``stationary_init`` to the model's hmm_dist (see
    posterior_state_probs)."""
    log_obs, log_trans, log_init = _prep(emission_logpdf, y, params, K,
                                         stationary_init)

    def fwd(delta, lo):
        scores = delta[:, None] + log_trans  # (from, to)
        back = jnp.argmax(scores, axis=0)
        delta = lo + jnp.max(scores, axis=0)
        return delta, back

    delta0 = log_init + log_obs[0]
    deltaT, backs = jax.lax.scan(fwd, delta0, log_obs[1:])
    last = jnp.argmax(deltaT)

    def trace_back(state, back):
        prev = back[state]
        return prev, prev

    _, path_rev = jax.lax.scan(trace_back, last, backs[::-1])
    return jnp.concatenate([path_rev[::-1], last[None]]).astype(jnp.int32)

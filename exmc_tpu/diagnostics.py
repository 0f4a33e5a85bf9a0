"""MCMC diagnostics as on-device reductions.

Estimator parity with the reference (diagnostics.ex) — NOT arviz
defaults (SURVEY.md §7 hard-part (f)):

* ess           — Geyer initial-positive-sequence on the ACF
                  (diagnostics.ex:42-52,147-167)
* ess_bulk      — rank-normalize (Blom) + probit, then split-chain ESS
                  (diagnostics.ex:60-72,184-236)
* rhat          — split-chain R-hat (Vehtari et al. 2021)
                  (diagnostics.ex:80-115)
* summary       — mean/std/quantiles via sorted interpolation
                  (diagnostics.ex:14-34,170-180)

The reference computes ACF by direct summation in Erlang floats
(diagnostics.ex:123-143, D23, O(n*lag)); here autocovariance uses an FFT
(O(n log n)) and everything jits/vmaps over parameters and chains.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.scipy import special as jsp


def autocovariance(x):
    """Per-chain autocovariance via FFT. x: (..., n) -> (..., n).

    f64 input on a non-CPU backend is downcast to f32 around the FFT:
    TPU has no complex128 ("Element type C128 is not supported on
    TPU", measured on the x64 sv_marginal run 2026-08-20), and the
    autocorrelation estimator is statistical — its own MC error dwarfs
    the mantissa difference. The centering above stays in the input
    dtype, so the downcast sees mean-zero O(sd) values, not raw
    positions."""
    n = x.shape[-1]
    x = x - jnp.mean(x, axis=-1, keepdims=True)
    m = int(2 ** np.ceil(np.log2(2 * n)))
    out_dtype = x.dtype
    if x.dtype == jnp.float64 and jax.default_backend() != "cpu":
        x = x.astype(jnp.float32)
    f = jnp.fft.rfft(x, n=m, axis=-1)
    acov = jnp.fft.irfft(f * jnp.conj(f), n=m, axis=-1)[..., :n]
    return (jnp.real(acov) / n).astype(out_dtype)


def _split_chains(x):
    """(chains, draws) -> (2*chains, draws//2) split-chain view."""
    c, n = x.shape
    half = n // 2
    return x[:, : 2 * half].reshape(c * 2, half)


def _geyer_tau(pair, n):
    """Integrated autocorrelation time from Geyer pair sums: initial
    positive sequence + initial monotone (non-increasing) correction
    (Geyer 1992; Vehtari et al. 2021)."""
    keep = jnp.cumprod((pair > 0.0).astype(pair.dtype))
    # monotone: running min over the retained (positive) prefix
    mono = jax.lax.cummin(jnp.where(keep > 0, pair, jnp.inf))
    tau = -1.0 + 2.0 * jnp.sum(jnp.where(keep > 0, mono, 0.0))
    return jnp.maximum(tau, 1.0 / jnp.log10(jnp.asarray(float(n))))


def ess(x):
    """Effective sample size, Geyer initial positive/monotone sequence.

    Single chain matches the reference estimator (diagnostics.ex:42-52);
    multi-chain pooling follows Vehtari et al. 2021 (Stan/arviz): the
    chain-averaged ACF is normalized by ``var_plus = W*(n-1)/n + B/n``
    (within PLUS between-chain variance), so unmixed chains stuck at
    different values are correctly penalized rather than looking
    uncorrelated (ADVICE r1). x: (chains, draws) or (draws,)."""
    x = jnp.atleast_2d(jnp.asarray(x))
    c, n = x.shape
    acov = autocovariance(x)  # (c, n), biased /n divisor
    mean_acov = jnp.mean(acov, axis=0)
    w_biased = jnp.mean(acov[:, 0])  # = W * (n-1)/n
    mean_var = w_biased * n / (n - 1.0)  # W with ddof=1
    var_plus = w_biased
    if c > 1:
        var_plus = var_plus + jnp.var(jnp.mean(x, axis=1), ddof=1)  # + B/n
    rho = 1.0 - (mean_var - mean_acov) / jnp.maximum(var_plus, 1e-30)
    rho = rho.at[0].set(1.0)
    # Geyer: sum consecutive pairs rho[2t]+rho[2t+1] while positive
    n_pairs = n // 2
    pair = rho[0 : 2 * n_pairs : 2] + rho[1 : 2 * n_pairs : 2]
    tau = _geyer_tau(pair, n)
    return c * n / tau


def _rank_normalize(x):
    """Blom rank-normalization + probit (diagnostics.ex:184-236).

    Ties receive AVERAGE ranks (scipy rankdata semantics) — positional
    tie-breaking turns a mostly-tied tail indicator into a
    position-trending sequence and collapses tail-ESS estimates."""
    shape = x.shape
    flat = x.reshape(-1)
    n = flat.shape[0]
    sorted_x = jnp.sort(flat)
    left = jnp.searchsorted(sorted_x, flat, side="left")
    right = jnp.searchsorted(sorted_x, flat, side="right")
    ranks = 0.5 * (left + right + 1.0)
    u = (ranks - 0.375) / (n + 0.25)  # Blom offsets
    z = jnp.sqrt(2.0) * jsp.erfinv(2.0 * u - 1.0)
    return z.reshape(shape)


def ess_bulk(x):
    """Bulk ESS: rank-normalized split-chain ESS (diagnostics.ex:60-72)."""
    x = jnp.atleast_2d(jnp.asarray(x))
    z = _rank_normalize(x)
    return ess(_split_chains(z))


def ess_tail(x, prob=0.05):
    """Tail ESS: min ESS of the prob/1-prob quantile indicators."""
    x = jnp.atleast_2d(jnp.asarray(x))
    lo = jnp.quantile(x, prob)
    hi = jnp.quantile(x, 1.0 - prob)
    e_lo = ess(_split_chains(_rank_normalize((x <= lo).astype(x.dtype))))
    e_hi = ess(_split_chains(_rank_normalize((x <= hi).astype(x.dtype))))
    return jnp.minimum(e_lo, e_hi)


def rhat(x):
    """Split-chain R-hat (Vehtari 2021; diagnostics.ex:80-115).
    x: (chains, draws)."""
    x = jnp.atleast_2d(jnp.asarray(x))
    s = _split_chains(x)
    m, n = s.shape
    chain_means = jnp.mean(s, axis=1)
    chain_vars = jnp.var(s, axis=1, ddof=1)
    w = jnp.mean(chain_vars)
    b = n * jnp.var(chain_means, ddof=1)
    var_plus = (n - 1) / n * w + b / n
    return jnp.sqrt(var_plus / jnp.maximum(w, 1e-30))


def rhat_bulk(x):
    """Rank-normalized split R-hat."""
    x = jnp.atleast_2d(jnp.asarray(x))
    return rhat(_rank_normalize(x))


def nested_rhat(x, num_superchains):
    """Nested R-hat (Margossian et al. 2022, arXiv:2110.13017) — the
    convergence diagnostic for the MANY-SHORT-CHAINS regime this
    framework runs in (1024 vmapped chains x few hundred draws), where
    classic split R-hat needs more draws per chain than the run has.
    Beyond the reference (single-digit chain counts never needed it).

    ``x``: (chains, draws); chains are grouped CONSECUTIVELY into
    ``num_superchains`` superchains of M = chains/num_superchains
    members. For the diagnostic to detect non-stationarity, chains
    within a superchain should share an initialization (or an init
    distribution narrower than the target); with exmc_tpu's stride-7919
    fold_in seeding, pass inits accordingly or treat the grouping as a
    between-group mixing check.

        nRhat = sqrt(1 + B/W)
        B = var_{k}(superchain means)            (ddof=1)
        W = mean_k [ var_{m in k}(chain means)   (ddof=1)
                     + mean_{m in k}(within-chain var) ]

    Works down to draws=1 per chain (the within-chain term drops out).
    Threshold: the paper recommends ~1.01 on nRhat just like R-hat."""
    x = jnp.atleast_2d(jnp.asarray(x))
    c, n = x.shape
    k = int(num_superchains)
    if k < 2:
        raise ValueError("need >= 2 superchains (B is a between-superchain "
                         "variance; k=1 would return nan)")
    if c % k != 0:
        raise ValueError(f"chains ({c}) not divisible by num_superchains ({k})")
    m = c // k
    if m < 2:
        raise ValueError("need >= 2 chains per superchain")
    g = x.reshape(k, m, n)
    chain_means = jnp.mean(g, axis=2)                      # (k, m)
    within_chain = (
        jnp.var(g, axis=2, ddof=1).mean(axis=1) if n > 1
        else jnp.zeros((k,), x.dtype)
    )                                                      # (k,)
    super_means = jnp.mean(chain_means, axis=1)            # (k,)
    b = jnp.var(super_means, ddof=1)
    w = jnp.mean(jnp.var(chain_means, axis=1, ddof=1) + within_chain)
    return jnp.sqrt(1.0 + b / jnp.maximum(w, 1e-30))


def ebfmi(energy):
    """Energy-Bayesian-fraction-of-missing-information per chain
    (Betancourt 2016, eq. 23; the e-bfmi of Stan's workflow — beyond
    the reference, which returns energy in stats but no E-BFMI
    estimator).

    ``energy``: (chains, draws) array of per-draw Hamiltonian energies
    (``stats["energy"]``). Returns a (chains,) array; values below ~0.3
    flag marginal-energy transitions too narrow to explore the energy
    distribution (heavy tails / mis-specified metric). Under
    ``interweave=True`` the recorded energy is POST-interweave (its
    potential term is shifted by the interweave's logp delta, see
    sample() docs), so E-BFMI reads the states the chain actually
    continues from."""
    e = jnp.asarray(energy)
    if e.ndim == 1:
        e = e[None, :]
    de = jnp.diff(e, axis=1)
    num = jnp.mean(de * de, axis=1)
    den = jnp.var(e, axis=1, ddof=1)
    return num / den


def autocorrelation(x, max_lag=None):
    """Normalized ACF (diagnostics.ex:123-143) — FFT-based (the reference
    notes switching to FFT beyond 10k draws, D23; we always do)."""
    x = jnp.asarray(x)
    acov = autocovariance(x)
    acf = acov / jnp.maximum(acov[..., :1], 1e-30)
    if max_lag is not None:
        acf = acf[..., : max_lag + 1]
    return acf


def quantile(x, qs):
    """Quantiles via sorted linear interpolation (diagnostics.ex:170-180)."""
    return jnp.quantile(jnp.asarray(x).reshape(-1), jnp.asarray(qs))


def summary(trace, var_names=None):
    """Per-parameter summary table (diagnostics.ex:14-34): mean, std,
    q5/q25/q50/q75/q95, ess, ess_bulk, rhat.

    ``trace``: dict name -> (chains, draws, *event) constrained samples.
    Vector parameters are summarized per flattened component ``name[i]``."""
    out = {}
    names = var_names if var_names is not None else sorted(trace)
    for name in names:
        arr = np.asarray(trace[name])
        c, n = arr.shape[0], arr.shape[1]
        flat_ev = arr.reshape(c, n, -1)
        for i in range(flat_ev.shape[-1]):
            x = flat_ev[:, :, i]
            key = name if flat_ev.shape[-1] == 1 else f"{name}[{i}]"
            qs = np.asarray(quantile(x, jnp.asarray([0.05, 0.25, 0.5, 0.75, 0.95])))
            out[key] = {
                "mean": float(np.mean(x)),
                "std": float(np.std(x, ddof=1)),
                "q5": float(qs[0]),
                "q25": float(qs[1]),
                "q50": float(qs[2]),
                "q75": float(qs[3]),
                "q95": float(qs[4]),
                "ess": float(ess(x)),
                "ess_bulk": float(ess_bulk(x)),
                "ess_tail": float(ess_tail(x)),
                "rhat": float(rhat(x)),
            }
            # Monte Carlo standard error of the mean from the
            # autocorrelation-aware ESS (sd/sqrt(ess)) — the workflow
            # number that says how many digits of `mean` to trust
            out[key]["mcse_mean"] = out[key]["std"] / max(
                out[key]["ess"], 1.0) ** 0.5
    return out

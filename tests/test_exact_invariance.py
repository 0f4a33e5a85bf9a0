"""Exact-stationarity battery for the NUTS transition kernel.

If the kernel leaves the target invariant, starting N chains at EXACT
target samples and applying K transitions yields states that are still
exactly target-distributed. SBC at finite rank resolution can miss
small merge/U-turn bias (round-4 VERDICT item 3); this is the sharper
test — the one-kernel analogue of the reference's statham property
tests (reference test/nuts/statham_tree_test.exs:1-14, which caught
its 2-3x ESS merge bugs).

Battery per target (final states across chains are i.i.d. exact-null
samples, so classical tests apply):
  * per-dimension KS against the exact marginal CDF,
  * squared-Mahalanobis-radius KS against chi2(d) (joint, radial —
    sensitive to mode-biased selection, the capped-weight bug class),
  * a fixed linear functional's KS against its exact normal law.

Each statistic is computed on R independent replicates (disjoint seeds)
and combined with Stouffer's method: a REAL kernel bias reproduces in
every replicate and the combined z grows as sqrt(R); an isolated
sampling fluke is diluted by 1/sqrt(R). (Measured while building this
test: 1 of 16 replicate seeds produced a 3.2-sigma slow-direction
excursion with per-dim KS p = 4e-5 — and 15 clean seeds pooled to
z = 1.7, i.e. no bias. A single-replicate battery at tight alpha is a
seed lottery; the replicate-combined battery is not.) Holm multiplicity
control over statistics at family alpha = 0.005.

Sensitivity: the negative controls below verify that a CONSISTENT 10%
radial shrink (capped-weight bug class) or 15% marginal sd inflation
rejects decisively at the same settings.

Measured p-values (8-device CPU mesh, f32, fixed seeds) are recorded
in VALIDATION.md §"Exact kernel invariance".
"""

import numpy as np
import pytest
import scipy.stats as st
import jax
import jax.numpy as jnp

from exmc_tpu.nuts.leapfrog import make_metric
from exmc_tpu.nuts.tree import nuts_transition

ALPHA = 0.005   # family-wise, Holm-controlled
N_CHAINS = 8192
R_REPL = 4
K_STEPS = 8


def _holm_reject(pvals, alpha=ALPHA):
    """Holm step-down: True if ANY hypothesis is rejected."""
    p = np.sort(np.asarray(pvals))
    m = len(p)
    for i, pi in enumerate(p):
        if pi < alpha / (m - i):
            return True
    return False


def _stouffer(pmat):
    """Combine an (R, n_stats) p-value matrix across replicates:
    z_j = sum_r Phi^-1(1 - p_rj) / sqrt(R), returned as upper-tail
    p-values (one per statistic)."""
    pmat = np.clip(np.asarray(pmat), 1e-300, 1.0)
    z = st.norm.isf(pmat)            # large when p small
    zc = z.sum(axis=0) / np.sqrt(pmat.shape[0])
    return st.norm.sf(zc)


def _run_kernel(vag, d, n_chains, n_steps, eps, seed, max_depth=6,
                chol=None):
    """N exact-init chains x K transitions; returns final states (N, d).

    ``chol``: target covariance Cholesky factor (exact init via
    L @ z, z ~ N(0, I)); identity when None.
    """
    init_key, run_key = jax.random.split(jax.random.PRNGKey(seed))
    z = jax.random.normal(init_key, (n_chains, d), jnp.float32)
    q0 = z if chol is None else z @ jnp.asarray(chol, jnp.float32).T
    metric = make_metric(jnp.ones((d,), jnp.float32))
    keys = jax.random.split(run_key, n_chains)

    def chain(q, key):
        logp, grad = vag(q)

        def step(carry, k):
            q, logp, grad = carry
            q1, logp1, grad1, stats = nuts_transition(
                vag, metric, eps, q, logp, grad, k, max_depth
            )
            return (q1, logp1, grad1), stats["accept_prob"]

        (qK, _, _), acc = jax.lax.scan(
            step, (q, logp, grad), jax.random.split(key, n_steps)
        )
        return qK, jnp.mean(acc)

    qs, acc = jax.jit(jax.vmap(chain))(q0, keys)
    return np.asarray(qs), float(np.mean(acc))


def _battery_pvalues(x, cov=None):
    """KS p-values: per-dim marginal, whitened radius^2 vs chi2(d),
    and a fixed linear functional."""
    n, d = x.shape
    cov = np.eye(d) if cov is None else np.asarray(cov)
    sds = np.sqrt(np.diag(cov))
    pvals = [
        st.kstest(x[:, i] / sds[i], "norm").pvalue for i in range(d)
    ]
    white = x @ np.linalg.inv(np.linalg.cholesky(cov)).T
    r2 = np.sum(white**2, axis=1)
    pvals.append(st.kstest(r2, "chi2", args=(d,)).pvalue)
    u = np.arange(1, d + 1, dtype=np.float64)
    u /= np.linalg.norm(u)
    s_u = float(np.sqrt(u @ cov @ u))
    pvals.append(st.kstest(x @ u / s_u, "norm").pvalue)
    return pvals


def _replicated_battery(vag, d, eps, base_seed, chol=None, cov=None):
    pmat, accs = [], []
    for r in range(R_REPL):
        x, acc = _run_kernel(vag, d, N_CHAINS, K_STEPS, eps,
                             seed=base_seed + 1000 * r, chol=chol)
        assert 0.5 < acc < 1.0  # sane step size, trees actually move
        pmat.append(_battery_pvalues(x, cov))
        accs.append(acc)
    return _stouffer(pmat), np.asarray(pmat), float(np.mean(accs))


def test_invariance_iso_gaussian():
    d = 4

    def vag(q):
        return -0.5 * jnp.sum(q * q), -q

    pcomb, pmat, acc = _replicated_battery(vag, d, eps=0.7, base_seed=0)
    print(f"\niso-gaussian Stouffer-combined p-values "
          f"(R={R_REPL} x N={N_CHAINS}): "
          f"{[round(p, 4) for p in pcomb]} (accept={acc:.3f})")
    assert not _holm_reject(pcomb), (
        f"NUTS kernel failed exact stationarity: combined {pcomb}, "
        f"per-replicate\n{pmat}")


def test_invariance_correlated_gaussian():
    d = 3
    rho = 0.8
    cov = np.full((d, d), rho) + (1 - rho) * np.eye(d)
    prec = np.linalg.inv(cov)
    chol = np.linalg.cholesky(cov)
    prec_j = jnp.asarray(prec, jnp.float32)

    def vag(q):
        pq = q @ prec_j
        return -0.5 * jnp.sum(q * pq), -pq

    pcomb, pmat, acc = _replicated_battery(
        vag, d, eps=0.35, base_seed=2, chol=chol, cov=cov)
    print(f"\ncorrelated-gaussian Stouffer-combined p-values "
          f"(R={R_REPL} x N={N_CHAINS}): "
          f"{[round(p, 4) for p in pcomb]} (accept={acc:.3f})")
    assert not _holm_reject(pcomb), (
        f"NUTS kernel failed exact stationarity: combined {pcomb}, "
        f"per-replicate\n{pmat}")


def test_battery_detects_inflated_sd():
    """Negative control: a consistent 15% marginal sd inflation must
    REJECT through the same replicate-combined machinery — documents
    the battery's sensitivity floor."""
    rng = np.random.default_rng(2)
    pmat = [
        _battery_pvalues(rng.normal(scale=1.15, size=(N_CHAINS, 4)))
        for _ in range(R_REPL)
    ]
    assert _holm_reject(_stouffer(pmat))


def test_battery_detects_mode_bias():
    """Negative control for the capped-weight bug class (reference D49):
    selection biased toward the mode = radially shrunk draws. A 10%
    radial shrink must reject via the chi2 radius test."""
    rng = np.random.default_rng(3)
    pmat = [
        _battery_pvalues(rng.normal(size=(N_CHAINS, 4)) * 0.9)
        for _ in range(R_REPL)
    ]
    assert _holm_reject(_stouffer(pmat))


def test_stouffer_dilutes_single_fluke():
    """The combination must NOT reject on one extreme replicate among
    otherwise-null ones (the measured seed-lottery case: one p=4e-5
    replicate, three clean)."""
    pmat = np.array([
        [4e-5, 0.5, 0.5, 0.5, 0.5, 0.5],
        [0.4, 0.6, 0.3, 0.7, 0.5, 0.5],
        [0.5, 0.5, 0.6, 0.4, 0.5, 0.5],
        [0.6, 0.4, 0.5, 0.5, 0.5, 0.5],
    ])
    assert not _holm_reject(_stouffer(pmat))

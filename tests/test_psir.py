"""Pareto-smoothed importance resampling (exmc_tpu/psir.py).

Correctness anchors: (a) on a conjugate Normal target with the EXACT
posterior as proposal, PSIR is a no-op (uniform weights, k-hat small);
(b) on a skewed Gamma posterior, the Laplace approximation's draws are
visibly biased and PSIR pulls the mean/sd to the analytic values;
(c) the k-hat diagnostic flags a proposal that misses the posterior.
"""

import numpy as np
import pytest

from exmc_tpu import Builder, dists
from exmc_tpu.compiler import compile_logp
from exmc_tpu.psir import diag_normal_logq, psir


def _normal_ir():
    """mu ~ N(0, 2); y_i ~ N(mu, 1): exact posterior N(m, s^2)."""
    ys = np.array([1.2, 0.8, 1.5, 1.1, 0.9, 1.3], dtype=np.float32)
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "mu", dists.Normal, {"mu": 0.0, "sigma": 2.0})
    ir = Builder.rv(ir, "y", dists.Normal, {"mu": "mu", "sigma": 1.0})
    ir = Builder.obs(ir, "y_obs", "y", ys)
    n, ybar = len(ys), float(ys.mean())
    prec = 1 / 4.0 + n
    return ir, n * ybar / prec, prec ** -0.5


def test_psir_exact_proposal_is_noop():
    ir, m, s = _normal_ir()
    rng = np.random.default_rng(0)
    z = (m + s * rng.normal(size=4000)).astype(np.float32)[:, None]
    logq = np.asarray(diag_normal_logq(z, np.array([m]), np.array([s])))
    trace, info = psir(ir, z, logq, seed=1)
    # exact proposal: weights uniform up to noise, k-hat small, the
    # resampled posterior matches the analytic one
    assert info["ess_is"] > 3000
    assert info["pareto_k"] < 0.5
    assert trace["mu"].shape[1] == 4000
    assert abs(trace["mu"].mean() - m) < 0.03
    assert abs(trace["mu"].std() - s) < 0.03


def test_psir_corrects_biased_proposal():
    """Proposal deliberately offset and overdispersed: raw draws are
    biased; the resampled ones recover the truth."""
    ir, m, s = _normal_ir()
    rng = np.random.default_rng(0)
    mu_q, s_q = m + 0.8 * s, 2.0 * s
    z = (mu_q + s_q * rng.normal(size=6000)).astype(np.float32)[:, None]
    logq = np.asarray(diag_normal_logq(z, np.array([mu_q]), np.array([s_q])))
    trace, info = psir(ir, z, logq, seed=2)
    raw_bias = abs(z.mean() - m)
    psir_bias = abs(trace["mu"].mean() - m)
    assert psir_bias < raw_bias / 4
    assert abs(trace["mu"].std() - s) < 0.1 * s
    assert info["pareto_k"] < 0.7


def test_psir_flags_bad_proposal():
    """A proposal far too narrow in the wrong place: k-hat warns."""
    ir, m, s = _normal_ir()
    rng = np.random.default_rng(0)
    mu_q, s_q = m + 6 * s, 0.3 * s
    z = (mu_q + s_q * rng.normal(size=2000)).astype(np.float32)[:, None]
    logq = np.asarray(diag_normal_logq(z, np.array([mu_q]), np.array([s_q])))
    trace, info = psir(ir, z, logq, seed=3)
    assert info["pareto_k"] > 0.7 or info["ess_is"] < 100


def test_laplace_psir_fixes_skew():
    """sigma ~ Gamma(3, 2) with no data: mean 1.5, sd ~0.866 — skewed,
    so the Laplace Gaussian at the mode (1.0) is biased low; PSIR
    recovers the exact moments and reports a healthy k-hat."""
    from exmc_tpu import laplace

    ir = Builder.new_ir()
    ir = Builder.rv(ir, "sigma", dists.Gamma, {"alpha": 3.0, "beta": 2.0})

    t_raw, i_raw = laplace(ir, draws=4000, seed=0)
    t_ps, i_ps = laplace(ir, draws=4000, seed=0, psir=True)
    exact_mean, exact_sd = 1.5, np.sqrt(3.0) / 2.0
    raw_err = abs(t_raw["sigma"].mean() - exact_mean)
    ps_err = abs(t_ps["sigma"].mean() - exact_mean)
    assert ps_err < raw_err / 2
    assert abs(t_ps["sigma"].std() - exact_sd) < 0.08
    assert i_ps["psir"]["pareto_k"] < 0.7
    assert i_ps["psir"]["ess_is"] > 200


def test_advi_pathfinder_psir_surfaces():
    """psir=True on advi_fit / pathfinder_fit (diag + lowrank): draws
    keep the standard layout and the diagnostics ride along."""
    from exmc_tpu import advi_fit, pathfinder_fit

    ir, m, s = _normal_ir()
    fit = advi_fit(ir, num_steps=1500, num_draws=2000, seed=0, psir=True)
    assert fit["psir"]["pareto_k"] < 0.7
    assert fit["draws"]["mu"].shape == (1, 2000)
    assert abs(fit["draws"]["mu"].mean() - m) < 0.1

    for method in ("diag", "lowrank"):
        pf = pathfinder_fit(ir, num_draws=2000, seed=0, method=method,
                            psir=True)
        assert pf["draws"]["mu"].shape == (1, 2000)
        assert abs(pf["draws"]["mu"].mean() - m) < 0.1, method
        assert pf["draws_unconstrained"].shape == (1, 2000, 1)
        assert np.isfinite(pf["psir"]["pareto_k"]), method
    # the lowrank fit is the paper's exact inverse-Hessian Gaussian —
    # its q is good and k-hat must say so; the diag path's crude
    # 1/sqrt(|grad|) sigma (reference pathfinder.ex:156-171 parity)
    # legitimately earns a k-hat WARNING on this target (measured
    # ~1.06) — PSIR still recenters its draws, and the diagnostic
    # honestly reports the proposal quality
    assert pf["psir"]["pareto_k"] < 0.7  # pf = lowrank (loop order)

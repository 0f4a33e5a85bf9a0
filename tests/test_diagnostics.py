"""Diagnostics estimator tests (reference diagnostics.ex semantics)."""

import numpy as np
import pytest

from exmc_tpu import diagnostics as diag


def ar1(rng, n, rho, chains=4):
    x = np.zeros((chains, n))
    eps = rng.normal(size=(chains, n))
    for t in range(1, n):
        x[:, t] = rho * x[:, t - 1] + np.sqrt(1 - rho**2) * eps[:, t]
    return x


def test_ess_iid_close_to_n():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 1000))
    e = float(diag.ess(x))
    assert 2500 < e < 5500  # ~4000 with estimator noise


def test_ess_ar1_reduced():
    rng = np.random.default_rng(1)
    x = ar1(rng, 2000, 0.9)
    e = float(diag.ess(x))
    # theoretical ESS factor (1-rho)/(1+rho) ~ 0.0526 -> ~421 of 8000
    assert 150 < e < 900


def test_ess_penalizes_unmixed_chains():
    """Regression (ADVICE r1, medium): chains stuck at different values
    must yield SMALL pooled ESS (between-chain variance term), not look
    iid-uncorrelated."""
    rng = np.random.default_rng(3)
    # 4 chains, each tightly wandering around a very different mean
    offsets = np.array([0.0, 10.0, 20.0, 30.0])[:, None]
    x = offsets + rng.normal(scale=0.1, size=(4, 1000))
    e = float(diag.ess(x))
    assert e < 50, f"unmixed chains should have tiny ESS, got {e}"
    # sanity: same draws centered (mixed) give large ESS
    e_mixed = float(diag.ess(x - offsets))
    assert e_mixed > 2000


def test_ess_bulk_rank_normalized():
    rng = np.random.default_rng(2)
    # heavy-tailed draws: bulk-ESS should still behave (rank normalization)
    x = rng.standard_cauchy(size=(4, 1000))
    e = float(diag.ess_bulk(x))
    assert 1000 < e < 6000


def test_rhat_converged():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(4, 1000))
    assert abs(float(diag.rhat(x)) - 1.0) < 0.02


def test_rhat_detects_nonconvergence():
    rng = np.random.default_rng(4)
    x = rng.normal(size=(4, 500))
    x[0] += 5.0  # one chain far away
    assert float(diag.rhat(x)) > 1.5


def test_autocorrelation():
    rng = np.random.default_rng(5)
    x = ar1(rng, 4000, 0.8, chains=1)[0]
    acf = np.asarray(diag.autocorrelation(x, max_lag=5))
    assert abs(acf[0] - 1.0) < 1e-5
    assert abs(acf[1] - 0.8) < 0.05
    assert abs(acf[2] - 0.64) < 0.07


def test_summary_table():
    rng = np.random.default_rng(6)
    trace = {
        "mu": rng.normal(2.0, 0.5, size=(4, 500)),
        "w": rng.dirichlet([1, 1, 1], size=(4, 500)),
    }
    s = diag.summary(trace)
    assert abs(s["mu"]["mean"] - 2.0) < 0.05
    assert abs(s["mu"]["std"] - 0.5) < 0.05
    assert s["mu"]["q5"] < s["mu"]["q50"] < s["mu"]["q95"]
    assert s["mu"]["rhat"] < 1.05
    assert "w[0]" in s and "w[2]" in s


def test_quantile_interpolation():
    x = np.arange(101, dtype=float)
    qs = np.asarray(diag.quantile(x, [0.05, 0.5, 0.95]))
    np.testing.assert_allclose(qs, [5.0, 50.0, 95.0], atol=0.01)


def test_ebfmi_iid_energy_near_two():
    # iid normal energies: E[(dE)^2] = 2 Var(E) -> E-BFMI ~ 2
    rng = np.random.default_rng(7)
    e = rng.normal(10.0, 3.0, size=(4, 4000))
    v = np.asarray(diag.ebfmi(e))
    assert v.shape == (4,)
    assert np.all(np.abs(v - 2.0) < 0.2), v


def test_ebfmi_sticky_energy_low():
    # strongly autocorrelated (sticky) energy chain -> small E-BFMI
    rng = np.random.default_rng(8)
    e = np.empty((1, 4000))
    e[0, 0] = 0.0
    for i in range(1, 4000):
        e[0, i] = 0.995 * e[0, i - 1] + rng.normal(0, 0.1)
    v = float(diag.ebfmi(e)[0])
    assert v < 0.3, v


def test_summary_mcse_and_tail():
    rng = np.random.default_rng(9)
    trace = {"mu": rng.normal(2.0, 0.5, size=(4, 500))}
    s = diag.summary(trace)["mu"]
    # iid draws: mcse ~ sd/sqrt(n_total)
    assert abs(s["mcse_mean"] - 0.5 / np.sqrt(2000)) < 0.01
    assert s["ess_tail"] > 500


def test_nested_rhat_stationary_near_one():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(32, 20))  # 32 chains, 20 draws, all stationary
    r = float(diag.nested_rhat(x, num_superchains=8))
    assert abs(r - 1.0) < 0.02


def test_nested_rhat_detects_superchain_separation():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(32, 20))
    offsets = np.repeat([0.0, 5.0, -5.0, 10.0], 8)  # 4 stuck regions
    x = x + offsets[:, None]
    r = float(diag.nested_rhat(x, num_superchains=4))
    assert r > 1.5


def test_nested_rhat_single_draw_regime():
    """The paper's selling point: valid with draws=1 per chain."""
    rng = np.random.default_rng(2)
    x = rng.normal(size=(64, 1))
    r = float(diag.nested_rhat(x, num_superchains=8))
    assert abs(r - 1.0) < 0.15
    x_bad = x + np.repeat(np.linspace(0, 6, 8), 8)[:, None]
    assert float(diag.nested_rhat(x_bad, num_superchains=8)) > 1.3


def test_nested_rhat_validates_grouping():
    x = np.zeros((10, 5))
    with pytest.raises(ValueError, match="divisible"):
        diag.nested_rhat(x, num_superchains=3)
    with pytest.raises(ValueError, match=">= 2 chains"):
        diag.nested_rhat(x, num_superchains=10)


def test_superchain_init_wiring():
    """init=("superchain", K): K random inits, each repeated M times
    consecutively — the grouping nested_rhat expects (VERDICT r3 #10)."""
    import jax

    from exmc_tpu import Builder, dists, sample
    from exmc_tpu.nuts.sampler import _make_sampler

    ir = Builder.new_ir()
    ir = Builder.rv(ir, "mu", dists.Normal, {"mu": 0.0, "sigma": 1.0})
    ir = Builder.rv(ir, "x", dists.Normal, {"mu": "mu", "sigma": 0.5})
    ir = Builder.obs(ir, "x_obs", "x", np.array([0.4, 0.6, 0.5]))

    s = _make_sampler(ir, num_warmup=50, num_samples=40)
    q = s._resolve_inits(("superchain", 4), 16, jax.random.PRNGKey(0),
                         s.model.size, np.float32, None)
    q = np.asarray(q)
    assert q.shape == (16, s.model.size)
    for k in range(4):
        grp = q[4 * k:4 * (k + 1)]
        assert (grp == grp[0]).all()          # shared within superchain
    assert not (q[0] == q[4]).all()           # distinct across superchains

    with pytest.raises(ValueError, match="divisible"):
        s._resolve_inits(("superchain", 5), 16, jax.random.PRNGKey(0),
                         s.model.size, np.float32, None)

    trace, _ = sample(ir, num_chains=16, seed=0, init=("superchain", 4),
                      num_warmup=50, num_samples=40)
    nr = float(diag.nested_rhat(trace["mu"], 4))
    assert np.isfinite(nr) and nr < 1.2

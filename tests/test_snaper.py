"""SNAPER-HMC tests (exmc_tpu/chees.py criterion='snaper', D-T31).

No reference counterpart (the reference is NUTS-only). Bars: exact
moments on a strongly correlated Gaussian — the regime the
principal-component criterion exists for (a diag metric cannot whiten
correlation, so ChEES's isotropic criterion under-lengthens) — plus
recovery of the true principal direction and Talts rank calibration
via sbc(engine="snaper").
"""

import numpy as np
import pytest

from exmc_tpu import Builder, Model, dists, sample_snaper
from exmc_tpu.diagnostics import ess, rhat


def _corr_gauss_ir(rho=0.95, d=2):
    cov = np.full((d, d), rho) + (1.0 - rho) * np.eye(d)
    ir = Builder.rv(Builder.new_ir(), "x", dists.MvNormal,
                    {"mu": np.zeros(d), "cov": cov})
    return ir, cov


def test_snaper_correlated_gaussian_moments():
    ir, cov = _corr_gauss_ir(rho=0.95, d=4)
    trace, stats = sample_snaper(ir, num_chains=16, num_warmup=600,
                                 num_samples=800, seed=3)
    x = trace["x"]  # (chains, samples, 4)
    assert stats["divergences"].sum() == 0
    assert np.abs(x.mean(axis=(0, 1))).max() < 0.15
    emp_cov = np.cov(x.reshape(-1, 4).T)
    assert np.abs(emp_cov - cov).max() < 0.2
    flat = x.reshape(x.shape[0], x.shape[1], -1)
    for j in range(flat.shape[-1]):
        assert rhat(flat[:, :, j]) < 1.05
        assert ess(flat[:, :, j]) > 200


def test_snaper_learns_principal_component():
    # equal marginal scales + strong correlation: after diag
    # preconditioning the top eigenvector is exactly 1/sqrt(d) * ones
    d = 4
    ir, _ = _corr_gauss_ir(rho=0.9, d=d)
    _, stats = sample_snaper(ir, num_chains=16, num_warmup=600,
                             num_samples=200, seed=0)
    pc = stats["principal_component"]
    assert pc.shape == (d,)
    truth = np.ones(d) / np.sqrt(d)
    assert abs(float(np.dot(pc, truth))) > 0.9
    # ... and the adapted trajectory is longer than one step of the
    # fast direction (the whole point of projecting onto the slow one)
    assert float(stats["trajectory_length"]) > float(stats["step_size"])


def test_snaper_conjugate_accuracy():
    rng = np.random.default_rng(7)
    y = rng.normal(2.0, 1.0, 50)
    with Model() as m:
        m.rv("mu", dists.Normal, {"mu": 0.0, "sigma": 3.0})
        m.rv("y", dists.Normal, {"mu": "mu", "sigma": 1.0})
        m.obs("y_obs", "y", y)
    prec = 1.0 / 3.0**2 + len(y) / 1.0
    post_mu, post_sd = (y.sum() / 1.0) / prec, prec**-0.5
    trace, stats = sample_snaper(m.ir, num_chains=8, num_warmup=500,
                                 num_samples=1000, seed=1)
    mu = trace["mu"]
    assert stats["divergences"].sum() == 0
    assert mu.mean() == pytest.approx(post_mu, abs=3 * post_sd / 10)
    assert mu.std() == pytest.approx(post_sd, rel=0.15)


def test_snaper_validation_and_wrapper():
    ir, _ = _corr_gauss_ir()
    with pytest.raises(ValueError, match="criterion"):
        from exmc_tpu.chees import sample_chees
        sample_chees(ir, criterion="nope")
    with pytest.raises(ValueError, match="snaper"):
        sample_snaper(ir, criterion="chees")


def test_snaper_sbc_smoke():
    from exmc_tpu.sbc import sbc

    with Model() as m:
        m.rv("mu", dists.Normal, {"mu": 0.0, "sigma": 2.0})
        m.rv("y", dists.Normal, {"mu": "mu", "sigma": 1.0})
        m.obs("y_obs", "y", np.zeros(10))
    res = sbc(m.ir, num_replications=64, num_warmup=300, num_samples=200,
              thin=20, seed=0, engine="snaper", chees_chains=4)
    assert res["min_p"] > 0.005
    assert res["divergence_rate"] < 0.01
    with pytest.raises(ValueError, match="unknown engine"):
        sbc(m.ir, engine="rwmh")

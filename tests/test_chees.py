"""ChEES-HMC tests (exmc_tpu/chees.py, DESIGN D-T29).

No reference counterpart — the reference ships NUTS only
(reference lib/exmc/nuts/sampler.ex); ChEES exists because the
fixed-steps-per-iteration transition is the TPU-native shape for
many-chain sampling (all vmapped chains run the same leapfrog count,
no deepest-tree straggler). Correctness bars mirror the NUTS tests:
posterior moments vs analytic targets, R-hat/ESS, and adaptation
sanity.
"""

import numpy as np
import pytest

from exmc_tpu import Model, dists
from exmc_tpu.chees import sample_chees, _halton_base2
from exmc_tpu.diagnostics import ess, rhat


def _conjugate_model(rng):
    y = rng.normal(2.0, 1.0, 50)
    with Model() as m:
        m.rv("mu", dists.Normal, {"mu": 0.0, "sigma": 3.0})
        m.rv("y", dists.Normal, {"mu": "mu", "sigma": 1.0})
        m.obs("y_obs", "y", y)
    # exact posterior: sigma known, normal prior
    prec = 1.0 / 3.0**2 + len(y) / 1.0
    post_mu = (y.sum() / 1.0) / prec
    post_sd = prec**-0.5
    return m.ir, post_mu, post_sd


def test_halton_base2_is_van_der_corput():
    u = _halton_base2(8)
    np.testing.assert_allclose(
        u, [0.5, 0.25, 0.75, 0.125, 0.625, 0.375, 0.875, 0.0625]
    )
    assert (u > 0).all() and (u < 1).all()


def test_chees_conjugate_normal_accuracy(rng):
    ir, post_mu, post_sd = _conjugate_model(rng)
    trace, stats = sample_chees(
        ir, num_chains=32, num_warmup=300, num_samples=400, seed=0
    )
    mu = trace["mu"]
    assert mu.shape == (32, 400)
    assert abs(mu.mean() - post_mu) < 0.05
    assert abs(mu.std() - post_sd) / post_sd < 0.15
    assert stats["divergences"].sum() == 0
    assert rhat(mu) < 1.01


def test_chees_adapts_trajectory_on_wide_scales(rng):
    # sds spanning 1..8: post-metric the target is ~isotropic, but the
    # initial T (8 steps of reasonable-eps) must move; check T adapted
    # away from init, mixing is strong, and all chains are in lockstep.
    sds = np.linspace(1.0, 8.0, 16)
    with Model() as m:
        m.rv("x", dists.Normal, {"mu": np.zeros(16), "sigma": sds}, shape=(16,))
    trace, stats = sample_chees(
        m.ir, num_chains=48, num_warmup=400, num_samples=400, seed=1
    )
    x = trace["x"]
    assert x.shape == (48, 400, 16)
    r = max(rhat(x[:, :, i]) for i in range(16))
    e = min(ess(x[:, :, i]) for i in range(16))
    assert r < 1.01
    assert e > 2000  # many-chain regime: ESS should dwarf 4-chain NUTS
    assert stats["divergences"].sum() == 0
    # marginal sds recovered
    np.testing.assert_allclose(
        x.reshape(-1, 16).std(axis=0), sds, rtol=0.15
    )
    # the metric absorbed the scales
    np.testing.assert_allclose(
        np.sqrt(stats["inv_mass"]), sds, rtol=0.25
    )


def test_chees_sharded_over_dp_mesh():
    # chain batch sharded over the 8-device virtual mesh: GSPMD turns
    # the cross-chain reductions (ChEES grad, harmonic accept, pooled
    # Welford) into collectives. Tuning is not bit-identical to the
    # unsharded run (f32 reduction order feeds back through Adam), but
    # posterior correctness must hold.
    from exmc_tpu.parallel import make_mesh

    sds = np.linspace(1.0, 8.0, 8)
    with Model() as m:
        m.rv("x", dists.Normal, {"mu": np.zeros(8), "sigma": sds}, shape=(8,))
    mesh = make_mesh(8)
    trace, stats = sample_chees(
        m.ir, num_chains=32, num_warmup=300, num_samples=300, seed=2,
        mesh=mesh,
    )
    x = trace["x"]
    assert max(rhat(x[:, :, i]) for i in range(8)) < 1.01
    assert stats["divergences"].sum() == 0
    np.testing.assert_allclose(x.reshape(-1, 8).std(axis=0), sds, rtol=0.2)
    with pytest.raises(ValueError, match="divisible"):
        sample_chees(m.ir, num_chains=12, mesh=mesh)


def test_chees_sbc_calibrated(rng):
    # Talts rank-uniformity on the ChEES kernel at smoke scale (the
    # full R=256 evidence lives in SBC_r04.json via sbc_evidence.py):
    # a biased trajectory-length/step-size/metric scheme shifts ranks.
    from exmc_tpu.sbc import sbc as run_sbc

    with Model() as m:
        m.rv("mu", dists.Normal, {"mu": 0.0, "sigma": 2.0})
        m.rv("sigma", dists.HalfNormal, {"sigma": 1.5})
        m.rv("y", dists.Normal, {"mu": "mu", "sigma": "sigma"})
        m.obs("y_obs", "y", np.zeros(20))
    res = run_sbc(m.ir, num_replications=64, num_warmup=200,
                  num_samples=200, thin=10, seed=0, engine="chees",
                  chees_chains=4)
    assert res["L"] == 80  # 4 chains x 20 thinned draws
    assert res["min_ecdf_p"] > 0.01
    assert res["divergence_rate"] < 0.001
    with pytest.raises(TypeError, match="no sampler options"):
        run_sbc(m.ir, engine="chees", target_accept=0.9)
    with pytest.raises(ValueError, match="unknown engine"):
        run_sbc(m.ir, engine="hmc")


def test_chees_needs_two_chains():
    with Model() as m:
        m.rv("x", dists.Normal, {"mu": 0.0, "sigma": 1.0})
    with pytest.raises(ValueError, match="2 chains"):
        sample_chees(m.ir, num_chains=1)


def test_chees_empty_model():
    with Model() as m:
        pass
    trace, stats = sample_chees(m.ir, num_chains=4)
    assert trace == {}
    assert "note" in stats


def test_chees_init_and_unconstrained(rng):
    ir, post_mu, _ = _conjugate_model(rng)
    draws, stats = sample_chees(
        ir,
        num_chains=8,
        num_warmup=150,
        num_samples=150,
        seed=3,
        init={"mu": np.asarray(post_mu)},
        return_unconstrained=True,
    )
    assert draws.shape == (8, 150, 1)
    assert np.isfinite(draws).all()
    assert stats["accept_prob"].shape == (8, 150)
    assert stats["trajectory_length"] > 0
    assert stats["num_steps_mean"] >= 1.0

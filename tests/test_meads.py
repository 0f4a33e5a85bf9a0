"""MEADS-style GHMC tests (exmc_tpu/meads.py, DESIGN D-T30).

No reference counterpart (the reference is NUTS-only). Correctness
bars: posterior moments vs analytic targets, R-hat/ESS, the two
self-tuning transient regimes that deadlocked during development
(module docstring), and Talts rank calibration via sbc(engine="meads").
"""

import numpy as np
import pytest

from exmc_tpu import Model, dists
from exmc_tpu.diagnostics import ess, rhat
from exmc_tpu.meads import sample_meads


def _conjugate_model(rng):
    y = rng.normal(2.0, 1.0, 50)
    with Model() as m:
        m.rv("mu", dists.Normal, {"mu": 0.0, "sigma": 3.0})
        m.rv("y", dists.Normal, {"mu": "mu", "sigma": 1.0})
        m.obs("y_obs", "y", y)
    prec = 1.0 / 3.0**2 + len(y) / 1.0
    return m.ir, (y.sum() / 1.0) / prec, prec**-0.5


def test_meads_conjugate_accuracy(rng):
    ir, post_mu, post_sd = _conjugate_model(rng)
    trace, stats = sample_meads(
        ir, num_chains=32, num_folds=4, num_warmup=400, num_samples=400,
        seed=0)
    mu = trace["mu"]
    assert mu.shape == (32, 400)
    assert abs(mu.mean() - post_mu) < 0.05
    assert abs(mu.std() - post_sd) / post_sd < 0.15
    assert stats["divergences"].sum() == 0
    assert rhat(mu) < 1.02
    # the kernel never freezes: tuning is reported per fold
    assert stats["step_size"].shape == (4,)
    assert stats["damping"].shape == (4,)


def test_meads_wide_scales(rng):
    sds = np.linspace(1.0, 8.0, 16)
    with Model() as m:
        m.rv("x", dists.Normal, {"mu": np.zeros(16), "sigma": sds},
             shape=(16,))
    trace, stats = sample_meads(
        m.ir, num_chains=64, num_warmup=500, num_samples=600, seed=1)
    x = trace["x"]
    assert max(rhat(x[:, :, i]) for i in range(16)) < 1.02
    assert min(ess(x[:, :, i]) for i in range(16)) > 1500
    assert stats["divergences"].sum() == 0
    np.testing.assert_allclose(x.reshape(-1, 16).std(axis=0), sds, rtol=0.15)


def test_meads_tight_init_does_not_deadlock(rng):
    # the epsilon-explosion regime: a tight cluster's centered gradient
    # covariance underestimates curvature by orders of magnitude; the
    # uncentered second moment keeps eps sane and the cluster expands
    # (meads.py _fold_tuning docstring — this froze at accept 0.0,
    # divergence rate 99.7% before the fix)
    y = rng.normal(0.8, 1.1, 20)
    with Model() as m:
        m.rv("mu", dists.Normal, {"mu": 0.0, "sigma": 2.0})
        m.rv("sigma", dists.HalfNormal, {"sigma": 1.5})
        m.rv("yy", dists.Normal, {"mu": "mu", "sigma": "sigma"})
        m.obs("y_obs", "yy", y)
    trace, stats = sample_meads(
        m.ir, num_chains=16, num_folds=4, num_warmup=300, num_samples=200,
        seed=0, init={"mu": np.asarray(0.8), "sigma": np.asarray(1.1)})
    assert stats["accept_prob"].mean() > 0.5
    assert stats["diverging"].mean() < 0.01
    assert rhat(trace["mu"]) < 1.1  # moving, not frozen


def test_meads_validation():
    with Model() as m:
        m.rv("x", dists.Normal, {"mu": 0.0, "sigma": 1.0})
    with pytest.raises(ValueError, match="divisible"):
        sample_meads(m.ir, num_chains=10, num_folds=4)
    with pytest.raises(ValueError, match="folds"):
        sample_meads(m.ir, num_chains=8, num_folds=1)
    with pytest.raises(ValueError, match="per fold"):
        sample_meads(m.ir, num_chains=4, num_folds=4)
    with pytest.raises(ValueError, match="unknown init"):
        sample_meads(m.ir, num_chains=8, init="laplace")


def test_meads_empty_model():
    with Model() as m:
        pass
    trace, stats = sample_meads(m.ir, num_chains=8)
    assert trace == {}
    assert "note" in stats


def test_meads_random_init_and_unconstrained(rng):
    ir, post_mu, _ = _conjugate_model(rng)
    draws, stats = sample_meads(
        ir, num_chains=16, num_warmup=600, num_samples=300, seed=3,
        init="random", return_unconstrained=True)
    assert draws.shape == (16, 300, 1)
    assert np.isfinite(draws).all()
    # overdispersed init still converges here (posterior sd ~0.14 and
    # the init radius ~2 are close enough that the transient resolves)
    assert abs(draws.mean() - post_mu) < 0.15


def test_meads_sbc_calibrated(rng):
    from exmc_tpu.sbc import sbc as run_sbc

    with Model() as m:
        m.rv("mu", dists.Normal, {"mu": 0.0, "sigma": 2.0})
        m.rv("sigma", dists.HalfNormal, {"sigma": 1.5})
        m.rv("y", dists.Normal, {"mu": "mu", "sigma": "sigma"})
        m.obs("y_obs", "y", np.zeros(20))
    res = run_sbc(m.ir, num_replications=64, num_warmup=300,
                  num_samples=200, thin=10, seed=0, engine="meads",
                  chees_chains=16)
    assert res["L"] == 320  # 16 chains x 20 thinned draws
    assert res["min_ecdf_p"] > 0.01
    assert res["divergence_rate"] < 0.001
    with pytest.raises(ValueError, match="folds"):
        run_sbc(m.ir, engine="meads", chees_chains=6)


def test_gram_lambda_max_f32_overflow_guard():
    # Rows with entries ~3e9 keep tr(G) finite in f32 but overflow
    # sum(G*G) without the pre-scaling: lam must stay finite and match
    # the scale-invariant identity lam(z) = s^2 lam(z/s).
    import jax.numpy as jnp

    from exmc_tpu.meads import _fold_tuning, _gram_lambda_max

    z_small = np.array([[1.0, 0.5], [-0.7, 1.2], [0.3, -0.9]], np.float32)
    s = np.float32(3e9)
    lam_small = float(_gram_lambda_max(jnp.asarray(z_small)))
    lam_big = float(_gram_lambda_max(jnp.asarray(z_small * s)))
    assert np.isfinite(lam_big)
    assert lam_big == pytest.approx(lam_small * float(s) ** 2, rel=1e-3)

    # downstream: the fold tuning must produce a finite, positive eps
    # even from a huge-gradient fold state (this froze silently with
    # eps=0 before the guard)
    q = np.array([[0.0, 0.0], [1.0, 1.0], [2.0, -1.0], [3.0, 0.5]],
                 np.float32)
    grad = (np.float32(3e9)
            * np.array([[1.0, -1.0], [0.9, -1.1], [1.1, -0.8],
                        [1.05, -0.95]], np.float32))
    sigma, eps, gamma = _fold_tuning(jnp.asarray(q), jnp.asarray(grad),
                                     np.float32)
    # the failure mode was eps == exactly 0 (sum(G*G) -> inf) or NaN
    # (tr -> inf too); a tiny-but-positive eps is the CORRECT response
    # to huge gradients
    assert np.all(np.isfinite(np.asarray(sigma)))
    assert np.isfinite(float(eps)) and float(eps) > 0.0
    assert np.isfinite(float(gamma))

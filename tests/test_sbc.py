"""Simulation-based calibration harness (exmc_tpu/sbc.py).

SBC validates the whole pipeline end-to-end: prior draw -> synthetic
data -> NUTS posterior -> rank of truth among thinned draws must be
uniform (Talts et al. 2018). Beyond the reference (its north star is
posteriordb recovery, not calibration)."""

import numpy as np
import pytest

from exmc_tpu import Builder, dists
from exmc_tpu.sbc import rank_uniformity, sbc


def _normal_model():
    ys = np.linspace(1.5, 2.6, 10)
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "mu", dists.Normal, {"mu": 0.0, "sigma": 2.0})
    ir = Builder.rv(ir, "sigma", dists.HalfNormal, {"sigma": 1.0})
    ir = Builder.rv(ir, "x", dists.Normal, {"mu": "mu", "sigma": "sigma"},
                    shape=(10,))
    return Builder.obs(ir, "x_obs", "x", ys)


def test_rank_uniformity_accepts_uniform():
    rng = np.random.default_rng(0)
    ranks = rng.integers(0, 51, size=400)
    stat, p = rank_uniformity(ranks, L=50)
    assert p > 0.01


def test_rank_uniformity_rejects_biased():
    # a sampler whose posterior is shifted yields pile-up at one end
    rng = np.random.default_rng(0)
    ranks = rng.integers(0, 16, size=400)  # never above 15 of 50
    stat, p = rank_uniformity(ranks, L=50)
    assert p < 1e-6


def test_sbc_normal_model_calibrated():
    out = sbc(_normal_model(), num_replications=60, num_warmup=300,
              num_samples=400, thin=8, seed=0)
    assert out["L"] == 50
    assert set(out["ranks"]) == {"mu", "sigma"}
    # healthy pipeline: no component fails uniformity hard
    assert out["min_p"] > 1e-3
    # ranks actually span the support (a frozen sampler would pile up)
    for r in out["ranks"].values():
        assert r.min() < 10 and r.max() > 40
    assert out["divergence_rate"] < 0.05


def test_sbc_detects_broken_jacobian():
    """A deliberately mis-specified pair — generator prior N(0, 6) vs
    fitted prior N(0, 0.5) with only two observations, so the fitted
    posterior over-shrinks toward 0 and the truth lands in the tails —
    must produce non-uniform (U-shaped) ranks. The calibration harness
    catches what posterior-recovery tolerances miss."""
    ys = np.array([1.5, 2.6])
    gen = Builder.new_ir()
    gen = Builder.rv(gen, "mu", dists.Normal, {"mu": 0.0, "sigma": 6.0})
    gen = Builder.rv(gen, "x", dists.Normal, {"mu": "mu", "sigma": 1.0},
                     shape=(2,))
    gen = Builder.obs(gen, "x_obs", "x", ys)

    fit = Builder.new_ir()
    fit = Builder.rv(fit, "mu", dists.Normal, {"mu": 0.0, "sigma": 0.5})
    fit = Builder.rv(fit, "x", dists.Normal, {"mu": "mu", "sigma": 1.0},
                     shape=(2,))
    fit = Builder.obs(fit, "x_obs", "x", ys)

    from exmc_tpu.predictive import posterior_predictive, prior_samples
    from exmc_tpu.sbc import _data_arg_ir, _obs_nodes

    R = 60
    prior = prior_samples(gen, num_draws=R, seed=0)
    y = posterior_predictive(
        gen, {"mu": prior["mu"][None]}, seed=1)["x_obs"][0]

    import jax
    import jax.numpy as jnp

    from exmc_tpu.compiler import constrain_flat
    from exmc_tpu.config import default_dtype
    from exmc_tpu.nuts.sampler import _init_position, _make_sampler

    obs = _obs_nodes(fit)
    ir2 = _data_arg_ir(fit, obs)
    sampler = _make_sampler(ir2, ncp=True, num_warmup=300, num_samples=400,
                            ensemble_rescue=False, pooled_adaptation=False)
    d = sampler.model.size
    dtype = default_dtype()
    keys = jax.random.split(jax.random.PRNGKey(2), R)
    q_inits = jax.vmap(lambda k: _init_position(k, d, dtype))(keys)

    def one(data_r, qi, key):
        draws, _, _ = sampler._one_chain(
            data_r, qi, key, False, jnp.ones((), dtype),
            jnp.ones((d,), dtype))
        sub = draws[7::8]
        return jax.vmap(
            lambda f: constrain_flat(sampler.model.ir, sampler.model.pm,
                                     f, data_r))(sub)

    named = jax.jit(jax.vmap(one))({"x_obs": jnp.asarray(y)}, q_inits, keys)
    draws_mu = np.asarray(named["mu"]).reshape(R, -1)
    ranks = (draws_mu < np.asarray(prior["mu"]).reshape(R, 1)).sum(axis=1)
    _, p = rank_uniformity(ranks, L=draws_mu.shape[1])
    assert p < 1e-4  # mis-calibration detected


def test_sbc_multi_obs_calibrated():
    """VERDICT r3 item 4a: SBC over a model with TWO obs nodes — the
    replication axis rides a dict-valued data channel, one keyed
    ``__obs_data`` entry per obs node."""
    ir = _normal_model()
    ir = Builder.rv(ir, "z", dists.Normal, {"mu": "mu", "sigma": 1.0},
                    shape=(5,))
    ir = Builder.obs(ir, "z_obs", "z", np.zeros(5, np.float32))
    out = sbc(ir, num_replications=60, num_warmup=200, num_samples=400,
              thin=10, seed=0)
    assert out["min_ecdf_p"] > 0.005, out["ecdf"]


def test_sbc_meas_obs_calibrated():
    """VERDICT r3 item 4c: a measurable-lifted affine observation —
    the generator applies y = a*x + b FORWARD (posterior_predictive),
    the compiler inverts it with the change-of-measure Jacobian; any
    mismatch shows up as rank non-uniformity."""
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "mu", dists.Normal, {"mu": 0.0, "sigma": 3.0})
    ir = Builder.rv(ir, "x", dists.Normal, {"mu": "mu", "sigma": 1.0},
                    shape=(10,))
    ir = Builder.det(ir, "yd", "affine", [2.5, -1.0, "x"])
    ir = Builder.obs(ir, "y_obs", "yd", np.zeros(10, np.float32))
    out = sbc(ir, num_replications=60, num_warmup=200, num_samples=400,
              thin=10, seed=0)
    assert out["min_ecdf_p"] > 0.005, out["ecdf"]


def test_sbc_matrix_valued_obs():
    """SBC supports matrix-valued observations: an (n, d) MvNormal
    dataset rides the data channel per replication."""
    rng = np.random.default_rng(1)
    n, d = 20, 2
    ys = rng.normal(size=(n, d))
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "mu", dists.Normal, {"mu": 0.0, "sigma": 1.5},
                    shape=(d,))
    ir = Builder.rv(ir, "y", dists.Normal, {"mu": "mu", "sigma": 1.0},
                    shape=(n, d))
    ir = Builder.obs(ir, "y_obs", "y", ys)
    out = sbc(ir, num_replications=40, num_warmup=200, num_samples=300,
              thin=6, seed=0)
    assert set(out["ranks"]) == {"mu[0]", "mu[1]"}
    assert out["min_p"] > 1e-3


def test_ecdf_ks_uniformity():
    from exmc_tpu.sbc import ecdf_ks

    rng = np.random.default_rng(0)
    _, p_good = ecdf_ks(rng.integers(0, 51, size=300), L=50, seed=1)
    assert p_good > 0.01
    # U-shaped ranks (tails only) — the shape chi2 binning can smear out
    u = np.concatenate([rng.integers(0, 6, 150), rng.integers(45, 51, 150)])
    _, p_bad = ecdf_ks(u, L=50, seed=1)
    assert p_bad < 1e-3


def test_rank_uniformity_nondivisible_support():
    """Regression (round-4 GP SBC exercise): with L+1 not divisible by
    the bin count, equal-width bins hold unequal numbers of integer
    ranks; the old uniform-expected chi2 spuriously rejected perfectly
    calibrated pipelines as R grew (ls/sn p -> 0 at R=256, L+1=31).
    Expected counts must follow the discrete support."""
    import numpy as np
    from exmc_tpu.sbc import rank_uniformity

    ps = []
    for seed in range(100):
        r = np.random.default_rng(seed).integers(0, 31, size=256)
        ps.append(rank_uniformity(r, 30)[1])
    ps = np.asarray(ps)
    # exact-uniform ranks: large p on average, few false positives
    assert np.median(ps) > 0.2
    assert (ps < 0.005).mean() <= 0.03
    # still detects a genuinely shifted pipeline
    bad = np.clip(np.random.default_rng(1).integers(0, 31, 256) + 6,
                  0, 30)
    assert rank_uniformity(bad, 30)[1] < 1e-6


@pytest.mark.slow
def test_sbc_gp_marginal_calibrated():
    """The GP-marginal pipeline (det-node kernel matrix + sampled
    hypers through MvNormal) is SBC-calibrated end to end — the run
    that exposed the rank_uniformity binning bug, kept as its guard."""
    import numpy as np
    from exmc_tpu import Model, dists
    from exmc_tpu.gp import gp_marginal

    rng = np.random.default_rng(0)
    X = np.sort(rng.uniform(-2, 2, 12))
    with Model() as m:
        m.rv("ls", dists.HalfNormal, {"sigma": 1.0})
        m.rv("amp", dists.HalfNormal, {"sigma": 1.0})
        m.rv("sn", dists.HalfNormal, {"sigma": 0.5})
        gp_marginal(m, "y", X, np.zeros(12), kernel="rbf",
                    lengthscale="ls", variance="amp", noise="sn")
    res = sbc(m.ir, num_replications=128, num_warmup=600,
                  num_samples=1500, thin=50, seed=11)
    assert res["min_p"] > 0.01
    assert res["divergence_rate"] < 0.01


def test_sbc_rep_batch_matches_unbatched():
    """rep_batch splits the replication axis into bounded device calls
    (axon watchdog defence); per-replication work is identical, so the
    ranks must match the single-call run bit-for-bit — including a
    final short batch (R=50, B=16)."""
    import numpy as np
    from exmc_tpu import Builder, dists
    from exmc_tpu.sbc import sbc

    ir = Builder.new_ir()
    ir = Builder.rv(ir, "mu", dists.Normal, {"mu": 0.0, "sigma": 1.0})
    ir = Builder.rv(ir, "y", dists.Normal, {"mu": "mu", "sigma": 1.0},
                    shape=(8,))
    ir = Builder.obs(ir, "y_obs", "y", np.zeros(8, np.float32))

    kw = dict(num_replications=50, num_warmup=200, num_samples=200,
              thin=10, seed=0)
    r_full = sbc(ir, **kw)
    r_batched = sbc(ir, rep_batch=16, **kw)
    np.testing.assert_array_equal(r_full["ranks"]["mu"],
                                  r_batched["ranks"]["mu"])
    assert r_full["divergence_rate"] == r_batched["divergence_rate"]

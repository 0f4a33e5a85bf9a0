"""End-to-end posterior recovery (reference integration_test.exs
coverage: conjugate recovery, multi-chain R-hat/ESS, constrained-support
recovery, hierarchical + NCP round trips — SURVEY.md §4; tolerances
deliberately generous, INTEGRATION_TESTING.md:72)."""

import math

import numpy as np
import pytest
import jax.numpy as jnp

from exmc_tpu import Builder, dists, sample, sample_chains
from exmc_tpu import diagnostics as diag


def quickstart_ir():
    """Reference README.md:63-85 hierarchical quickstart."""
    ys = np.array([2.1, 1.8, 2.5, 2.0, 1.9, 2.3, 2.2, 1.7, 2.4, 2.6])
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "mu", dists.Normal, {"mu": 0.0, "sigma": 5.0})
    ir = Builder.rv(ir, "sigma", dists.HalfNormal, {"sigma": 2.0})
    ir = Builder.rv(ir, "x", dists.Normal, {"mu": "mu", "sigma": "sigma"})
    ir = Builder.obs(ir, "x_obs", "x", ys)
    return ir, ys


def test_quickstart_posterior_mean():
    ir, ys = quickstart_ir()
    trace, stats = sample(ir, num_warmup=500, num_samples=1000, seed=0)
    mu = trace["mu"]
    assert mu.shape == (1, 1000)
    assert abs(float(np.mean(mu)) - 2.1) < 0.3  # README: ~2.1
    assert float(np.mean(trace["sigma"])) > 0.0
    assert stats["divergences"].sum() < 20


def test_conjugate_normal_posterior():
    """Known-sigma Normal: conjugate posterior mean/var recovered."""
    rng = np.random.default_rng(0)
    ys = rng.normal(1.5, 1.0, size=50)
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "mu", dists.Normal, {"mu": 0.0, "sigma": 10.0})
    ir = Builder.rv(ir, "y", dists.Normal, {"mu": "mu", "sigma": 1.0})
    ir = Builder.obs(ir, "y_obs", "y", ys)
    trace, _ = sample(ir, num_warmup=500, num_samples=1000, seed=1)
    # conjugate: post_var = 1/(1/100 + n), post_mean = post_var * sum(y)
    post_var = 1.0 / (1.0 / 100.0 + len(ys))
    post_mean = post_var * ys.sum()
    assert abs(float(np.mean(trace["mu"])) - post_mean) < 0.1
    assert abs(float(np.std(trace["mu"])) - math.sqrt(post_var)) < 0.05


def test_multichain_rhat_ess():
    ir, _ = quickstart_ir()
    trace, stats = sample_chains(ir, num_chains=4, num_warmup=400,
                                 num_samples=500, seed=2)
    mu = trace["mu"]
    assert mu.shape == (4, 500)
    assert float(diag.rhat(mu)) < 1.05
    assert float(diag.ess(mu)) > 100


def test_constrained_support_recovery():
    """HalfNormal-scale recovery stays positive (constrained support)."""
    rng = np.random.default_rng(3)
    ys = rng.normal(0.0, 2.5, size=100)
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "sigma", dists.HalfNormal, {"sigma": 5.0})
    ir = Builder.rv(ir, "y", dists.Normal, {"mu": 0.0, "sigma": "sigma"})
    ir = Builder.obs(ir, "y_obs", "y", ys)
    trace, _ = sample(ir, num_warmup=500, num_samples=500, seed=3)
    s = trace["sigma"]
    assert (s > 0).all()
    assert abs(float(np.mean(s)) - 2.5) < 0.4


def test_eight_schools_ncp():
    """Eight-schools with automatic NCP: few divergences, sane posterior
    (the reference's flagship hierarchical benchmark)."""
    y = np.array([28.0, 8.0, -3.0, 7.0, -1.0, 1.0, 18.0, 12.0])
    sigma = np.array([15.0, 10.0, 16.0, 11.0, 9.0, 11.0, 10.0, 18.0])
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "mu", dists.Normal, {"mu": 0.0, "sigma": 5.0})
    ir = Builder.rv(ir, "tau", dists.HalfCauchy, {"scale": 5.0})
    for i in range(8):
        ir = Builder.rv(ir, f"theta_{i}", dists.Normal, {"mu": "mu", "sigma": "tau"})
        ir = Builder.rv(ir, f"y_{i}", dists.Normal,
                        {"mu": f"theta_{i}", "sigma": float(sigma[i])})
        ir = Builder.obs(ir, f"y_{i}_obs", f"y_{i}", float(y[i]))
    trace, stats = sample(ir, num_warmup=500, num_samples=500, seed=4)
    assert all(f"theta_{i}" in trace for i in range(8))
    mu_mean = float(np.mean(trace["mu"]))
    tau_mean = float(np.mean(trace["tau"]))
    assert 0.0 < mu_mean < 10.0      # published posterior mu ~ 4.4
    assert 0.0 < tau_mean < 10.0     # published posterior tau ~ 3.6
    assert stats["divergences"].sum() < 25


def test_beta_bernoulli_recovery():
    rng = np.random.default_rng(5)
    ys = (rng.random(200) < 0.3).astype(np.float64)
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "p", dists.Beta, {"alpha": 1.0, "beta": 1.0})
    ir = Builder.rv(ir, "y", dists.Bernoulli, {"p": "p"})
    ir = Builder.obs(ir, "y_obs", "y", ys)
    trace, _ = sample(ir, num_warmup=400, num_samples=500, seed=5)
    p = trace["p"]
    post_mean = (1 + ys.sum()) / (2 + len(ys))
    assert abs(float(np.mean(p)) - post_mean) < 0.05
    assert (p > 0).all() and (p < 1).all()


def test_warm_start_reuses_tuning():
    """Warm-start path (D71): second run with previous tuning gives a
    valid posterior with only the 50-iter fine-tune warmup."""
    ir, _ = quickstart_ir()
    trace1, stats1 = sample(ir, num_warmup=400, num_samples=300, seed=6)
    ws = {"step_size": stats1["step_size"][0], "inv_mass": stats1["inv_mass"][0]}
    trace2, stats2 = sample(ir, num_warmup=400, num_samples=300, seed=7,
                            warm_start=ws)
    assert abs(float(np.mean(trace2["mu"])) - 2.1) < 0.35


def test_deterministic_seeding():
    ir, _ = quickstart_ir()
    t1, _ = sample(ir, num_warmup=200, num_samples=100, seed=42)
    t2, _ = sample(ir, num_warmup=200, num_samples=100, seed=42)
    np.testing.assert_array_equal(t1["mu"], t2["mu"])


def test_dense_mass():
    """Correlated Gaussian: dense mass adaptation samples it fine."""
    cov = np.array([[1.0, 0.9], [0.9, 1.0]])
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "x", dists.MvNormal,
                    {"mu": np.zeros(2), "cov": cov})
    trace, _ = sample(ir, num_warmup=500, num_samples=800, seed=8,
                      dense_mass=True)
    x = trace["x"]
    emp = np.cov(x.reshape(-1, 2).T)
    assert abs(emp[0, 1] - 0.9) < 0.2


def test_vector_rv_with_explicit_shape():
    ys = np.array([0.5, 0.8, 0.2])
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "mu", dists.Normal, {"mu": 0.0, "sigma": 1.0}, shape=(3,))
    ir = Builder.rv(ir, "y", dists.Normal, {"mu": "mu", "sigma": 0.5})
    ir = Builder.obs(ir, "y_obs", "y", ys)
    trace, _ = sample(ir, num_warmup=300, num_samples=300, seed=9)
    assert trace["mu"].shape == (1, 300, 3)


def test_pathfinder_init_mode():
    """init='pathfinder' (multi-path ELBO-raced inits) samples the same
    posterior as random inits."""
    import numpy as np

    from exmc_tpu import Builder, dists, sample

    ys = np.array([2.1, 1.8, 2.5, 2.0, 1.9, 2.3, 2.2, 1.7, 2.4, 2.6],
                  dtype=np.float32)
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "mu", dists.Normal, {"mu": 0.0, "sigma": 5.0})
    ir = Builder.rv(ir, "sigma", dists.HalfNormal, {"sigma": 2.0})
    ir = Builder.rv(ir, "x", dists.Normal, {"mu": "mu", "sigma": "sigma"})
    ir = Builder.obs(ir, "x_obs", "x", ys)
    trace, stats = sample(ir, num_chains=4, num_warmup=400, num_samples=400,
                          seed=0, init="pathfinder")
    assert abs(float(trace["mu"].mean()) - 2.1) < 0.3
    assert int(stats["divergences"].sum()) == 0

    import pytest

    with pytest.raises(ValueError, match="unknown init mode"):
        sample(ir, num_warmup=10, num_samples=10, init="magic")


def test_array_init_per_chain():
    """Per-chain unconstrained array inits: shape (num_chains, d) is
    used verbatim (overdispersed warm starts, e.g. drawn from an INLA
    grid — longt_bench.py's sv_marginal recipe); wrong shapes raise."""
    import pytest

    ys = np.array([2.1, 1.8, 2.5, 2.0, 1.9, 2.3], dtype=np.float32)
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "mu", dists.Normal, {"mu": 0.0, "sigma": 5.0})
    ir = Builder.rv(ir, "sigma", dists.HalfNormal, {"sigma": 2.0})
    ir = Builder.rv(ir, "x", dists.Normal, {"mu": "mu", "sigma": "sigma"})
    ir = Builder.obs(ir, "x_obs", "x", ys)
    inits = np.array([[2.0, -1.0], [2.2, -0.8], [1.9, -1.2], [2.1, -0.9]],
                     dtype=np.float32)
    trace, stats = sample(ir, num_chains=4, num_warmup=300, num_samples=300,
                          seed=0, init=inits)
    assert abs(float(trace["mu"].mean()) - 2.1) < 0.4
    with pytest.raises(ValueError, match=r"array init must have shape"):
        sample(ir, num_chains=4, num_warmup=10, num_samples=10,
               init=np.zeros((3, 2), dtype=np.float32))


def test_sample_engine_dispatch():
    """sample(engine=...) forwards to the ensemble engines with their
    own chain-count defaults; unknown engines and unsupported options
    get clear errors."""
    import numpy as np
    import pytest as _pytest
    from exmc_tpu import Builder, dists, sample

    ys = np.array([2.1, 1.8, 2.5, 2.0, 1.9, 2.3, 2.2, 1.7, 2.4, 2.6])
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "mu", dists.Normal, {"mu": 0.0, "sigma": 5.0})
    ir = Builder.rv(ir, "x", dists.Normal, {"mu": "mu", "sigma": 1.0})
    ir = Builder.obs(ir, "x_obs", "x", ys)

    for engine, chains in (("chees", 8), ("snaper", 8), ("meads", 16)):
        trace, stats = sample(ir, engine=engine, num_chains=chains,
                              num_warmup=300, num_samples=300, seed=0)
        assert trace["mu"].shape == (chains, 300)
        assert abs(trace["mu"].mean() - ys.mean()) < 0.3
        assert stats["divergences"].sum() < 20

    with _pytest.raises(ValueError, match="unknown engine"):
        sample(ir, engine="rwmh")
    with _pytest.raises(ValueError, match="warm_start"):
        sample(ir, engine="chees", warm_start={"step_size": 0.1})

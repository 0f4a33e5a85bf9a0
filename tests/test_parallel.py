"""Multi-chip sharding tests on the 8-virtual-device CPU mesh — the
analogue of the reference's distributed tests without a real cluster
(``nodes: [node()]`` trick, SURVEY.md §4)."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from exmc_tpu import Builder, dists
from exmc_tpu.compiler import compile_logp
from exmc_tpu.parallel import data_parallel_vag, make_mesh, sample_chains_sharded


def _simple_ir():
    ys = np.array([2.1, 1.8, 2.5, 2.0, 1.9, 2.3])
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "mu", dists.Normal, {"mu": 0.0, "sigma": 5.0})
    ir = Builder.rv(ir, "x", dists.Normal, {"mu": "mu", "sigma": 0.5})
    ir = Builder.obs(ir, "x_obs", "x", ys)
    return ir


def test_make_mesh():
    mesh = make_mesh(8, dp=4, sp=2)
    assert mesh.shape == {"dp": 4, "sp": 2}


def test_chain_sharding_posterior():
    mesh = make_mesh(8, dp=8, sp=1)
    trace, stats = sample_chains_sharded(
        _simple_ir(), 16, mesh, num_warmup=150, num_samples=100, seed=0
    )
    assert trace["mu"].shape == (16, 100)
    assert abs(float(trace["mu"].mean()) - 2.1) < 0.3


def test_chain_sharding_statistically_matches_unsharded():
    """Sharded and single-device runs agree statistically. (Bitwise
    equality does not hold: partitioned compilation changes f32 fusion
    order, and NUTS trajectories are chaotic — a 1-ulp logp difference
    eventually picks a different leaf. Posterior laws must agree.)"""
    from exmc_tpu.nuts.sampler import sample_chains

    ir = _simple_ir()
    mesh = make_mesh(8, dp=8, sp=1)
    t_sharded, _ = sample_chains_sharded(
        ir, 16, mesh, num_warmup=200, num_samples=200, seed=3
    )
    t_plain, _ = sample_chains(
        ir, num_chains=16, num_warmup=200, num_samples=200, seed=3
    )
    assert abs(t_sharded["mu"].mean() - t_plain["mu"].mean()) < 0.05
    assert abs(t_sharded["mu"].std() - t_plain["mu"].std()) < 0.05


def test_data_parallel_vag_matches():
    mesh = make_mesh(8, dp=2, sp=4)
    data = np.random.default_rng(0).normal(1.0, 1.0, size=(64,)).astype(np.float32)
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "mu", dists.Normal, {"mu": 0.0, "sigma": 10.0})
    ir = Builder.rv(ir, "y", dists.Normal, {"mu": "mu", "sigma": 1.0})
    ir = Builder.obs(ir, "y_obs", "y", "__obs_data")
    ir = Builder.data(ir, data)
    m = compile_logp(ir)
    vag_sp, _ = data_parallel_vag(m, mesh, jnp.asarray(data))
    v_sp, g_sp = vag_sp(jnp.asarray([0.5]))
    v_ref, g_ref = m.value_and_grad(jnp.asarray([0.5]), jnp.asarray(data))
    assert abs(float(v_sp) - float(v_ref)) < 1e-2
    np.testing.assert_allclose(np.asarray(g_sp), np.asarray(g_ref), atol=1e-3)


def test_uneven_chains_rejected():
    mesh = make_mesh(8, dp=8, sp=1)
    with pytest.raises(ValueError, match="not divisible"):
        sample_chains_sharded(_simple_ir(), 12, mesh, num_warmup=10,
                              num_samples=10)


def test_graft_entry_dryrun():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_sharded_pooled_adaptation():
    """Pooled Welford merge rides the cross-device psum under mesh
    sharding: every chain (on every device) gets the same mass matrix."""
    cov = np.diag([1.0, 9.0])
    ir = Builder.rv(Builder.new_ir(), "x", dists.MvNormal,
                    {"mu": np.zeros(2), "cov": cov})
    mesh = make_mesh(8, dp=8, sp=1)
    trace, stats = sample_chains_sharded(
        ir, 16, mesh, num_warmup=150, num_samples=150, seed=0,
        pooled_adaptation=True,
    )
    inv = stats["inv_mass"]
    np.testing.assert_allclose(inv[0], inv[15], rtol=1e-5)
    ratios = inv[0] / np.array([1.0, 9.0])
    assert (ratios > 0.4).all() and (ratios < 2.5).all()


def test_unknown_sampler_option_rejected():
    ir = _simple_ir()
    mesh = make_mesh(8, dp=8, sp=1)
    with pytest.raises(TypeError, match="unknown sampler options"):
        sample_chains_sharded(ir, 8, mesh, nmu_warmup=10)


def _logistic_ir(n_rows=64, d_feat=3, seed=0):
    """Logistic regression with data as a JIT argument (Builder.data):
    rows shard over "sp" in sp>1 runs."""
    rng = np.random.default_rng(seed)
    x_mat = rng.normal(size=(n_rows, d_feat)).astype(np.float32)
    beta_true = np.array([1.0, -0.5, 0.25], np.float32)
    p = 1.0 / (1.0 + np.exp(-(x_mat @ beta_true)))
    y = (rng.random(n_rows) < p).astype(np.float32)
    data = np.concatenate([x_mat, y[:, None]], axis=1)

    def loglik(beta, params, data=None):
        xm, yv = data[:, :-1], data[:, -1]
        logits = xm @ beta
        return jnp.sum(yv * logits - jnp.logaddexp(0.0, logits))

    custom = dists.Custom(logpdf_fn=loglik, support="real")
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "beta", custom, {}, shape=(3,))
    ir = Builder.data(ir, data)
    return ir


def test_sp_sharded_likelihood_end_to_end():
    """VERDICT r1 task 3: sp=4 NUTS through the PUBLIC API matches sp=1
    statistically on the same logistic posterior."""
    ir = _logistic_ir()
    mesh_sp = make_mesh(8, dp=2, sp=4)
    mesh_dp = make_mesh(8, dp=8, sp=1)
    t_sp, st_sp = sample_chains_sharded(
        ir, 8, mesh_sp, num_warmup=400, num_samples=400, seed=0
    )
    t_dp, st_dp = sample_chains_sharded(
        ir, 8, mesh_dp, num_warmup=400, num_samples=400, seed=0
    )
    assert t_sp["beta"].shape == (8, 400, 3)
    m_sp = t_sp["beta"].reshape(-1, 3).mean(axis=0)
    m_dp = t_dp["beta"].reshape(-1, 3).mean(axis=0)
    s_sp = t_sp["beta"].reshape(-1, 3).std(axis=0)
    s_dp = t_dp["beta"].reshape(-1, 3).std(axis=0)
    np.testing.assert_allclose(m_sp, m_dp, atol=0.15)
    np.testing.assert_allclose(s_sp, s_dp, rtol=0.3)
    assert st_sp["divergences"].sum() == 0


def test_sp_sharded_composes_with_pooled_adaptation():
    ir = _logistic_ir()
    mesh = make_mesh(8, dp=2, sp=4)
    trace, stats = sample_chains_sharded(
        ir, 8, mesh, num_warmup=200, num_samples=100, seed=1,
        pooled_adaptation=True,
    )
    inv = stats["inv_mass"]
    np.testing.assert_allclose(inv[0], inv[7], rtol=1e-5)
    assert np.isfinite(trace["beta"]).all()


def test_sp_requires_builder_data():
    mesh = make_mesh(8, dp=2, sp=4)
    with pytest.raises(ValueError, match="Builder.data"):
        sample_chains_sharded(_simple_ir(), 8, mesh, num_warmup=10,
                              num_samples=10)


def test_multihost_initialize_two_process_smoke(tmp_path):
    """VERDICT r2 #10: exercise initialize_distributed's REAL branch
    (jax.distributed.initialize) at least once before hardware arrives —
    two localhost processes form a cluster over the Gloo/DCN path and
    run one cross-process allgather (the reference's validate_nodes!
    analogue, distributed.ex:105-122)."""
    import subprocess
    import sys
    import textwrap

    worker = tmp_path / "worker.py"
    worker.write_text(textwrap.dedent("""
        import os, sys
        os.environ["TF_CPP_MIN_LOG_LEVEL"] = "3"
        import jax
        jax.config.update("jax_platforms", "cpu")
        sys.path.insert(0, %r)
        from exmc_tpu.parallel.distributed import initialize_distributed
        pid = int(sys.argv[1])
        ok = initialize_distributed("127.0.0.1:47671",
                                    num_processes=2, process_id=pid)
        assert ok
        assert jax.process_count() == 2
        import jax.numpy as jnp
        from jax.experimental import multihost_utils
        val = multihost_utils.process_allgather(jnp.asarray([float(pid)]))
        assert val.reshape(-1).tolist() == [0.0, 1.0], val
        print("MHOK", pid)
    """ % os.path.join(os.path.dirname(__file__), "..")))

    procs = [subprocess.Popen([sys.executable, str(worker), str(i)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for i in (0, 1)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=120)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multi-host smoke timed out: " + "\n".join(outs))
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"MHOK {i}" in out


def test_multihost_two_process_sampling_smoke(tmp_path):
    """VERDICT r3 item 6: a real multi-process SAMPLING run — two
    localhost processes (2 virtual CPU devices each) form a Gloo
    cluster, build a 4-device dp mesh spanning both, and run
    ``sample_chains_sharded`` end-to-end (chains split across
    processes, per-chain adaptation on-device, results gathered to
    every host via the replication collective in
    distributed._host_gather). The analogue of the reference's 2-node
    sample_chains (distributed.ex:56-101)."""
    import subprocess
    import sys
    import textwrap

    worker = tmp_path / "worker_sample.py"
    worker.write_text(textwrap.dedent("""
        import os, sys
        os.environ["TF_CPP_MIN_LOG_LEVEL"] = "3"
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=2").strip()
        import jax
        jax.config.update("jax_platforms", "cpu")
        sys.path.insert(0, %r)
        from exmc_tpu.parallel.distributed import initialize_distributed
        pid = int(sys.argv[1])
        ok = initialize_distributed("127.0.0.1:47673",
                                    num_processes=2, process_id=pid)
        assert ok and jax.process_count() == 2
        assert len(jax.devices()) == 4

        import numpy as np
        from exmc_tpu import Builder, dists
        from exmc_tpu.parallel import make_mesh, sample_chains_sharded

        ys = np.array([2.1, 1.8, 2.5, 2.0, 1.9, 2.3])
        ir = Builder.new_ir()
        ir = Builder.rv(ir, "mu", dists.Normal, {"mu": 0.0, "sigma": 5.0})
        ir = Builder.rv(ir, "x", dists.Normal, {"mu": "mu", "sigma": 0.5})
        ir = Builder.obs(ir, "x_obs", "x", ys)

        mesh = make_mesh(4, dp=4, sp=1)
        trace, stats = sample_chains_sharded(
            ir, 8, mesh, seed=0, num_warmup=100, num_samples=50,
            max_tree_depth=6)
        mu = trace["mu"]
        assert mu.shape == (8, 50), mu.shape
        assert np.isfinite(mu).all()
        assert stats["chain_ok"].all()
        # every host sees the SAME gathered result
        assert abs(float(mu.mean()) - 2.1) < 0.3, float(mu.mean())
        print("MHSAMPLE", pid, round(float(mu.mean()), 6))
    """ % os.path.join(os.path.dirname(__file__), "..")))

    procs = [subprocess.Popen([sys.executable, str(worker), str(i)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for i in (0, 1)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multi-host sampling smoke timed out: "
                    + "\n".join(outs))
    means = []
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        line = [ln for ln in out.splitlines() if ln.startswith("MHSAMPLE")]
        assert line, out[-2000:]
        means.append(line[0].split()[-1])
    assert means[0] == means[1]  # identical gathered posterior on both hosts


def test_sharded_gibbs_scales():
    """interweave/gibbs_scales options flow through the multi-chip API
    (and its failed-chain retry launch): centered eight_schools over
    the 8-device dp mesh, divergence-free, exact moments."""
    from exmc_tpu.benchmarks.suite import eight_schools_model

    mesh = make_mesh(8, dp=8, sp=1)
    trace, stats = sample_chains_sharded(
        eight_schools_model(), 16, mesh, seed=0, ncp=False,
        num_warmup=300, num_samples=300, interweave=True,
        gibbs_scales=True)
    assert int(stats["divergences"].sum()) == 0
    assert abs(float(trace["tau"].mean()) - 3.284) < 0.25

"""Round-2 compile-latency features: sampler/pipeline cache keyed by IR
structure (VERDICT r1 task 2) and exact mid-run checkpoint/resume in
run_chunked (VERDICT r1 task 8)."""

import numpy as np
import pytest

from exmc_tpu import Builder, dists
from exmc_tpu.nuts.sampler import (
    NUTSSampler,
    _make_sampler,
    clear_sampler_cache,
    ir_signature,
    sample,
)


def build_ir(ys, prior_sd=5.0):
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "mu", dists.Normal, {"mu": 0.0, "sigma": prior_sd})
    ir = Builder.rv(ir, "x", dists.Normal, {"mu": "mu", "sigma": 0.5})
    ir = Builder.obs(ir, "x_obs", "x", ys)
    return ir


def build_ir_data_arg(ys):
    """Same model but data registered as a JIT argument (D69)."""
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "mu", dists.Normal, {"mu": 0.0, "sigma": 5.0})
    ir = Builder.rv(ir, "x", dists.Normal, {"mu": "mu", "sigma": 0.5})
    ir = Builder.obs(ir, "x_obs", "x", "__obs_data")
    ir = Builder.data(ir, np.asarray(ys, np.float32))
    return ir


YS = np.array([2.1, 1.8, 2.5, 2.0, 1.9, 2.3])


def test_signature_stable_across_rebuilds():
    assert ir_signature(build_ir(YS)) == ir_signature(build_ir(YS))


def test_signature_distinguishes_constants():
    assert ir_signature(build_ir(YS)) != ir_signature(build_ir(YS, prior_sd=2.0))
    assert ir_signature(build_ir(YS)) != ir_signature(build_ir(YS + 1.0))


def test_signature_ignores_data_values_with_data_arg():
    # Builder.data tensors are JIT args: same shape/dtype -> same program
    a = ir_signature(build_ir_data_arg(YS))
    b = ir_signature(build_ir_data_arg(YS + 1.0))
    assert a == b
    c = ir_signature(build_ir_data_arg(np.concatenate([YS, YS])))
    assert a != c  # different shape -> different program


def test_sampler_cache_hit_reuses_compiled_pipeline():
    clear_sampler_cache()
    s1 = _make_sampler(build_ir(YS), num_warmup=200, num_samples=100)
    s2 = _make_sampler(build_ir(YS), num_warmup=200, num_samples=100)
    assert s1 is s2  # same object => same _run_jit cache, zero recompile
    s3 = _make_sampler(build_ir(YS), num_warmup=300, num_samples=100)
    assert s3 is not s1  # different static opts => different program


def test_cache_hit_uses_fresh_data_values():
    """A cache-hit sampler compiled from an earlier IR must still see the
    NEW ir's Builder.data values (they are JIT args)."""
    clear_sampler_cache()
    t1, _ = sample(build_ir_data_arg(YS), num_warmup=300, num_samples=300,
                   seed=0)
    shifted = YS + 3.0
    assert _make_sampler(build_ir_data_arg(YS)) is _make_sampler(
        build_ir_data_arg(shifted)
    )
    t2, _ = sample(build_ir_data_arg(shifted), num_warmup=300,
                   num_samples=300, seed=0)
    assert abs(float(t1["mu"].mean()) - 2.1) < 0.3
    assert abs(float(t2["mu"].mean()) - 5.1) < 0.3


def test_custom_dists_never_collide_in_cache():
    import jax.numpy as jnp

    def make(scale):
        d = dists.Custom(
            logpdf_fn=lambda x, params: -0.5 * (x / scale) ** 2,
            support="real",
        )
        ir = Builder.new_ir()
        ir = Builder.rv(ir, "z", d, {})
        return ir

    assert ir_signature(make(1.0)) != ir_signature(make(3.0))


def test_chunked_checkpoint_resume_bit_identical(tmp_path):
    """Kill-and-resume: a run checkpointed every chunk and resumed
    mid-way reproduces the uninterrupted run exactly (VERDICT r1 #8)."""
    ir = build_ir(YS)
    s = _make_sampler(ir, num_warmup=200, num_samples=200)
    ref_trace, ref_stats = s.run_chunked(num_chains=2, chunk_iters=100,
                                         seed=7)
    path = str(tmp_path / "midrun.npz")

    class Killed(Exception):
        pass

    calls = {"n": 0}
    orig = NUTSSampler._save_chunk_state

    def killer(p, carry, done, dp, sp):
        orig(p, carry, done, dp, sp)
        calls["n"] += 1
        if calls["n"] == 2:  # die after the 2nd of 4 chunks
            raise Killed

    NUTSSampler._save_chunk_state = staticmethod(killer)
    try:
        with pytest.raises(Killed):
            s.run_chunked(num_chains=2, chunk_iters=100, seed=7,
                          checkpoint_path=path)
    finally:
        NUTSSampler._save_chunk_state = staticmethod(orig)

    trace, stats = s.run_chunked(num_chains=2, chunk_iters=100, seed=7,
                                 resume_from=path)
    np.testing.assert_array_equal(trace["mu"], ref_trace["mu"])
    np.testing.assert_array_equal(stats["diverging"], ref_stats["diverging"])
    np.testing.assert_allclose(stats["step_size"], ref_stats["step_size"])


def test_chunked_resume_with_pooled_adaptation_and_array_init(tmp_path):
    """The longt_bench sv_marginal recipe in miniature: pooled
    cross-chain adaptation + per-chain unconstrained array inits +
    chunked checkpoint/resume must compose bit-identically (each
    feature is separately tested above/in test_pooled_adaptation; the
    T=5000 on-chip row runs all three at once)."""
    ir = build_ir(YS)
    s = _make_sampler(ir, num_warmup=200, num_samples=200,
                      pooled_adaptation=True)
    inits = np.array([[1.5], [2.5], [2.0], [1.0]], dtype=np.float32)
    ref_trace, ref_stats = s.run_chunked(num_chains=4, chunk_iters=100,
                                         seed=7, init=inits)
    path = str(tmp_path / "midrun_pooled.npz")

    class Killed(Exception):
        pass

    calls = {"n": 0}
    orig = NUTSSampler._save_chunk_state

    def killer(p, carry, done, dp, sp):
        orig(p, carry, done, dp, sp)
        calls["n"] += 1
        if calls["n"] == 2:
            raise Killed

    NUTSSampler._save_chunk_state = staticmethod(killer)
    try:
        with pytest.raises(Killed):
            s.run_chunked(num_chains=4, chunk_iters=100, seed=7,
                          init=inits, checkpoint_path=path)
    finally:
        NUTSSampler._save_chunk_state = staticmethod(orig)

    trace, stats = s.run_chunked(num_chains=4, chunk_iters=100, seed=7,
                                 init=inits, resume_from=path)
    np.testing.assert_array_equal(trace["mu"], ref_trace["mu"])
    np.testing.assert_allclose(stats["step_size"], ref_stats["step_size"])


def test_chunked_padding_single_compile_matches_unpadded():
    """chunk_iters that doesn't divide the total: padded final chunk must
    not change results."""
    ir = build_ir(YS)
    s = _make_sampler(ir, num_warmup=150, num_samples=130)
    t1, st1 = s.run_chunked(num_chains=2, chunk_iters=70, seed=3)  # 4 chunks
    t2, st2 = s.run_chunked(num_chains=2, chunk_iters=280, seed=3)  # 1 chunk
    assert t1["mu"].shape == (2, 130)
    np.testing.assert_allclose(t1["mu"], t2["mu"], rtol=1e-5)

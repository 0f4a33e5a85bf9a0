"""Streaming sampling (reference sample_stream, sampler.ex:1186-1276)."""

import numpy as np

from exmc_tpu import Builder, dists
from exmc_tpu.nuts.sampler import sample_stream


def test_sample_stream_chunks_and_totals():
    ys = np.array([2.1, 1.8, 2.5, 2.0, 1.9, 2.3])
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "mu", dists.Normal, {"mu": 0.0, "sigma": 5.0})
    ir = Builder.rv(ir, "x", dists.Normal, {"mu": "mu", "sigma": 0.5})
    ir = Builder.obs(ir, "x_obs", "x", ys)

    seen = []

    def cb(start, trace_chunk, stats_chunk):
        seen.append((start, trace_chunk["mu"].shape, stats_chunk["depth"].shape))

    trace, stats = sample_stream(
        ir, cb, num_samples=120, chunk_size=50, num_warmup=150, seed=0,
        num_chains=2,
    )
    assert [s[0] for s in seen] == [0, 50, 100]
    assert seen[0][1] == (2, 50)
    assert trace["mu"].shape == (2, 120)
    assert abs(float(trace["mu"].mean()) - 2.1) < 0.3
    assert stats["depth"].shape == (2, 120)


def test_trace_store_streaming(tmp_path):
    """Disk-backed streaming store: chunks land on disk as they arrive,
    reading is chunk-lazy, concatenation matches the in-memory trace
    (SURVEY 5.5 / round-1 TODO #9)."""
    from exmc_tpu.utils import TraceStore

    ys = np.array([2.1, 1.8, 2.5, 2.0, 1.9, 2.3])
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "mu", dists.Normal, {"mu": 0.0, "sigma": 5.0})
    ir = Builder.rv(ir, "x", dists.Normal, {"mu": "mu", "sigma": 0.5})
    ir = Builder.obs(ir, "x_obs", "x", ys)

    store = TraceStore(tmp_path / "run1")
    trace, stats = sample_stream(
        ir, store.as_callback(), num_samples=120, chunk_size=50,
        num_warmup=150, seed=0, num_chains=2,
    )
    reopened = TraceStore.open(tmp_path / "run1")
    assert reopened.num_samples == 120
    assert "mu" in reopened.variables()
    np.testing.assert_allclose(reopened.load("mu"), trace["mu"])
    np.testing.assert_allclose(
        reopened.load("diverging", kind="stat").shape, stats["diverging"].shape
    )
    # streaming mean without materializing
    assert abs(reopened.running_mean("mu") - trace["mu"].mean()) < 1e-6
    # chunk-lazy iteration covers all draws in order
    seen = 0
    for start, tr, st in reopened.iter_chunks():
        assert start == seen
        seen += tr["mu"].shape[1]
    assert seen == 120


def test_per_draw_streaming_every_1():
    """VERDICT r2 #5: reference sample_stream emits after EVERY draw
    (sampler.ex:1186-1276); every=1 must deliver each draw index once,
    in order, with the full chain batch, and the returned trace must
    match what was streamed."""
    ys = np.array([2.1, 1.8, 2.5, 2.0, 1.9, 2.3])
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "mu", dists.Normal, {"mu": 0.0, "sigma": 5.0})
    ir = Builder.rv(ir, "x", dists.Normal, {"mu": "mu", "sigma": 0.5})
    ir = Builder.obs(ir, "x_obs", "x", ys)

    got = []
    def cb(i, point, stats):
        got.append((i, point["mu"], float(stats["logp"].mean()),
                    stats["diverging"].shape))

    trace, stats = sample_stream(ir, cb, num_chains=4, every=1,
                                 num_warmup=150, num_samples=80, seed=0)
    assert [g[0] for g in got] == list(range(80))
    assert all(g[1].shape == (4,) for g in got)
    assert all(g[3] == (4,) for g in got)
    # the streamed points ARE the trace rows
    streamed = np.stack([g[1] for g in got], axis=1)  # (chains, draws)
    np.testing.assert_allclose(streamed, trace["mu"], rtol=1e-6)


def test_per_draw_streaming_every_k():
    ys = np.array([1.0, 1.2, 0.8])
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "mu", dists.Normal, {"mu": 0.0, "sigma": 5.0})
    ir = Builder.rv(ir, "x", dists.Normal, {"mu": "mu", "sigma": 0.5})
    ir = Builder.obs(ir, "x_obs", "x", ys)

    idxs = []
    # 95 draws with k=10 exercises the block padding path (245 % 10 != 0)
    trace, _ = sample_stream(ir, lambda i, p, s: idxs.append(i),
                             num_chains=2, every=10, num_warmup=150,
                             num_samples=95, seed=1)
    assert idxs == list(range(9, 95, 10))
    assert trace["mu"].shape == (2, 95)

    # io_callback mechanism: same emission schedule, one device call
    idxs_io = []
    trace_io, _ = sample_stream(ir, lambda i, p, s: idxs_io.append(i),
                                num_chains=2, every=10, num_warmup=150,
                                num_samples=95, seed=1,
                                mechanism="io_callback")
    assert idxs_io == idxs
    assert trace_io["mu"].shape == (2, 95)

    import pytest
    with pytest.raises(ValueError, match="every"):
        sample_stream(ir, lambda *a: None, every=0)
    # io_callback per-draw emission indexes draws within the per-chain
    # pipeline's scan; the shared-warmup pipeline has a different carry
    # layout and is rejected up front rather than silently falling back
    # (the chunked mechanism supports shared_warmup normally)
    with pytest.raises(ValueError, match="shared_warmup"):
        sample_stream(ir, lambda *a: None, every=1, num_chains=2,
                      mechanism="io_callback", shared_warmup=True)

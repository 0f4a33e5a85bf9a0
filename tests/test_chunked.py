"""Chunked pipeline execution: statistically identical to monolithic,
reproducible, identical tuning."""

import numpy as np

from exmc_tpu.benchmarks.suite import build_model
from exmc_tpu.nuts.sampler import _make_sampler


def test_chunked_matches_monolithic():
    s = _make_sampler(build_model("simple"), num_warmup=200, num_samples=200)
    t1, st1 = s.run(num_chains=4, seed=3)
    t2, st2 = s.run_chunked(num_chains=4, chunk_iters=120, seed=3)
    # identical adaptation (tuning threads exactly through the carry)
    np.testing.assert_allclose(st1["step_size"], st2["step_size"], rtol=1e-6)
    np.testing.assert_allclose(st1["inv_mass"], st2["inv_mass"], rtol=1e-5)
    # statistically equivalent draws (bitwise equality can differ via
    # f32 fusion order between the two compiled programs)
    assert abs(t1["mu"].mean() - t2["mu"].mean()) < 0.05
    assert abs(t1["mu"].std() - t2["mu"].std()) < 0.05


def test_chunked_reproducible():
    s = _make_sampler(build_model("simple"), num_warmup=100, num_samples=100)
    t1, _ = s.run_chunked(num_chains=2, chunk_iters=64, seed=7)
    t2, _ = s.run_chunked(num_chains=2, chunk_iters=64, seed=7)
    np.testing.assert_array_equal(t1["mu"], t2["mu"])


def test_chunked_uneven_last_chunk():
    s = _make_sampler(build_model("simple"), num_warmup=110, num_samples=95)
    trace, stats = s.run_chunked(num_chains=2, chunk_iters=64, seed=1)
    assert trace["mu"].shape == (2, 95)
    assert np.isfinite(trace["mu"]).all()

"""The seven-model benchmark suite compiles and samples (smoke budgets;
the reference's smoke test protocol, STANDARD_BENCHMARKS.md §III)."""

import numpy as np
import pytest

from exmc_tpu.benchmarks.suite import MODELS, build_model
from exmc_tpu.compiler import compile_logp
from exmc_tpu.nuts.sampler import sample

EXPECTED_DIMS = {
    "simple": 2,
    "medium": 5,
    "stress": 8,
    "eight_schools": 10,
    "funnel": 10,
    "logistic": 21,
    "sv": 102,
}


@pytest.mark.parametrize("name", sorted(MODELS))
def test_model_dimension(name):
    m = compile_logp(build_model(name), ncp=False)
    assert m.size == EXPECTED_DIMS[name]


@pytest.mark.parametrize("name", ["simple", "medium", "funnel"])
def test_model_smoke_sample(name):
    trace, stats = sample(build_model(name), ncp=False, num_warmup=150,
                          num_samples=100, seed=42)
    for k, v in trace.items():
        assert np.isfinite(v).all(), f"{name}/{k} has non-finite draws"


@pytest.mark.slow
@pytest.mark.parametrize("name", ["stress", "eight_schools", "logistic", "sv"])
def test_model_smoke_sample_slow(name):
    trace, stats = sample(build_model(name), ncp=False, num_warmup=150,
                          num_samples=100, seed=42)
    for k, v in trace.items():
        assert np.isfinite(v).all(), f"{name}/{k} has non-finite draws"


def test_logistic_posterior_centers_on_truth():
    """alpha true value 0.5 (STANDARD_BENCHMARKS.md smoke: mean ~0.354
    at 200+200)."""
    trace, _ = sample(build_model("logistic"), ncp=False, num_warmup=300,
                      num_samples=200, seed=42)
    assert abs(float(np.mean(trace["alpha"])) - 0.5) < 0.5

"""Weibull reliability model: NUTS + ADVI + SMC on the same compiled
log-density (BASELINE.json config 5)."""

import numpy as np
import pytest

from exmc_tpu import advi_fit, sample, smc_sample
from exmc_tpu.benchmarks import reliability


@pytest.fixture(scope="module")
def reliability_setup():
    data, truth = reliability.simulate_data(n_types=8, n_per_type=25, seed=0)
    ir = reliability.build(data, n_types=8)
    return ir, data, truth


def test_dimension(reliability_setup):
    from exmc_tpu.compiler import compile_logp

    ir, data, _ = reliability_setup
    m = compile_logp(ir)
    assert m.size == 4 + 2 * 8


def test_nuts_recovers_hypers(reliability_setup):
    ir, data, truth = reliability_setup
    trace, stats = sample(ir, num_warmup=400, num_samples=300, seed=1,
                          data=data)
    lkm = float(np.mean(trace["log_k_mean"]))
    llm = float(np.mean(trace["log_l_mean"]))
    assert abs(lkm - truth["log_k"].mean()) < 0.5
    assert abs(llm - truth["log_l"].mean()) < 0.5
    assert stats["divergences"].sum() < 0.1 * 300


def test_advi_on_reliability(reliability_setup):
    ir, data, truth = reliability_setup
    out = advi_fit(ir, num_steps=3000, seed=2, data=data)
    llm = float(out["draws"]["log_l_mean"].mean())
    assert abs(llm - truth["log_l"].mean()) < 0.6


def test_smc_on_reliability(reliability_setup):
    ir, data, truth = reliability_setup
    trace, info = smc_sample(ir, num_particles=600, seed=3, data=data)
    assert info["betas"][-1] == 1.0
    llm = float(trace["log_l_mean"].mean())
    assert abs(llm - truth["log_l"].mean()) < 0.7

"""PSIS-LOO option (extension beyond the reference's basic-IS LOO)."""

import numpy as np

from exmc_tpu import Builder, dists, model_comparison, sample


def _fit():
    rng = np.random.default_rng(0)
    ys = rng.normal(1.5, 1.0, size=40)
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "mu", dists.Normal, {"mu": 0.0, "sigma": 10.0})
    ir = Builder.rv(ir, "y", dists.Normal, {"mu": "mu", "sigma": 1.0})
    ir = Builder.obs(ir, "y_obs", "y", ys)
    trace, _ = sample(ir, num_warmup=300, num_samples=400, seed=0)
    return ir, trace, ys


def test_psis_loo_close_to_basic_on_wellspecified():
    ir, trace, ys = _fit()
    basic = model_comparison.loo(ir, trace, psis=False)
    psis = model_comparison.loo(ir, trace, psis=True)
    # well-specified model: both estimators agree closely
    assert abs(basic["elpd_loo"] - psis["elpd_loo"]) < 2.0
    assert "pareto_k" in psis
    assert psis["pareto_k"].shape == (len(ys),)
    # well-behaved weights: k-hat below the 0.7 reliability threshold
    assert (psis["pareto_k"] < 0.7).mean() > 0.9


def test_psis_loo_close_to_waic():
    ir, trace, ys = _fit()
    w = model_comparison.waic(ir, trace)
    psis = model_comparison.loo(ir, trace, psis=True)
    assert abs(w["elpd_waic"] - psis["elpd_loo"]) < 2.0

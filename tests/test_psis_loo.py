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


def test_gpd_khat_sign_convention():
    """Regression (ADVICE r1, high): k-hat must use the loo-package /
    Vehtari convention, POSITIVE for heavy tails, so the k>0.7
    reliability diagnostic can actually fire."""
    rng = np.random.default_rng(42)
    # weights themselves GPD(xi=0.5)-tailed: if U~Uniform,
    # W = 1 + sigma/xi*((1-U)^{-xi}-1) is shifted-GPD with shape 0.5,
    # so tail exceedances of W are exactly GPD(0.5)
    u = rng.uniform(size=4000)
    xi, sigma = 0.5, 1.0
    w = 1.0 + sigma / xi * ((1.0 - u) ** (-xi) - 1.0)
    log_w = np.log(w)
    log_w = log_w - log_w.max()
    smoothed, k_hat, _ = model_comparison._psis_smooth(log_w.copy())
    # heavy tail must be reported as positive k-hat near the true value
    assert 0.2 < k_hat < 1.0, f"k_hat={k_hat} should be ~+0.5 for xi=0.5 tails"
    # smoothed tail order statistics must remain heavy (unbounded-style
    # growth), not compressed to a bounded function: the top smoothed
    # weight should stay within a few nats of the raw max, far above the
    # tail cutoff
    m = max(int(np.ceil(min(0.2 * len(log_w), 3.0 * np.sqrt(len(log_w))))), 5)
    order = np.argsort(log_w)
    cutoff = log_w[order[-m - 1]]
    top_smoothed = smoothed[order[-m:]].max()
    assert top_smoothed > cutoff + 0.5 * (log_w.max() - cutoff)


def test_gpd_khat_light_tail_negative():
    """Bounded (light-tailed) weights should report k-hat <= ~0."""
    rng = np.random.default_rng(7)
    log_w = rng.uniform(-1.0, 0.0, size=2000)  # bounded support
    _, k_hat, _ = model_comparison._psis_smooth(log_w.copy())
    assert k_hat < 0.3


def test_loo_defaults_to_psis_and_warns_on_bad_khat():
    """VERDICT r2 #7: new users must get PSIS by default (pareto_k in the
    result), and k-hat > 0.7 observations must trigger a visible
    warning."""
    import warnings

    ir, trace, ys = _fit()
    res = model_comparison.loo(ir, trace)  # no psis kwarg
    assert "pareto_k" in res, "default loo() must be PSIS"

    # same call with an extreme outlier appended: its importance weights
    # are heavy-tailed, k-hat blows past 0.7 and the warning fires
    ys_bad = np.concatenate([ys, [45.0]])
    ir2 = Builder.new_ir()
    ir2 = Builder.rv(ir2, "mu", dists.Normal, {"mu": 0.0, "sigma": 10.0})
    ir2 = Builder.rv(ir2, "y", dists.Normal, {"mu": "mu", "sigma": 1.0})
    ir2 = Builder.obs(ir2, "y_obs", "y", ys_bad)
    trace2, _ = sample(ir2, num_warmup=300, num_samples=400, seed=0)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        res2 = model_comparison.loo(ir2, trace2)
    assert (res2["pareto_k"] > 0.7).any()
    assert any("k-hat" in str(w.message) for w in rec)


def test_gpd_fit_against_scipy():
    """Independent cross-check of the Zhang-Stephens GPD fit: scipy's MLE
    genpareto fit on the same exceedances must agree on the shape k-hat
    to ~0.1 for a clean synthetic GPD sample (the zero-egress surrogate
    for pinning against R loo-package values)."""
    from scipy import stats

    rng = np.random.default_rng(7)
    k_true = 0.4
    s = 4000
    # heavy-tailed weights whose exceedances are GPD(k_true)
    x = stats.genpareto.rvs(k_true, scale=1.0, size=s, random_state=rng)
    log_w = np.log1p(x)
    _, k_hat, _ = model_comparison._psis_smooth(np.sort(log_w))
    m = max(int(np.ceil(min(0.2 * s, 3.0 * np.sqrt(s)))), 5)
    tail = np.exp(np.sort(log_w)[-m:] - log_w.max())
    cutoff = np.exp(np.sort(log_w)[-m - 1] - log_w.max())
    exceed = tail - cutoff
    k_scipy = stats.genpareto.fit(exceed[exceed > 0], floc=0.0)[0]
    assert abs(k_hat - k_scipy) < 0.15, (k_hat, k_scipy)

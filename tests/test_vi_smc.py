"""ADVI / SMC / Pathfinder accuracy + WAIC/LOO + predictive tests
(reference advi/smc/pathfinder/model_comparison/predictive coverage)."""

import numpy as np
import pytest

from exmc_tpu import (
    Builder,
    advi_fit,
    dists,
    model_comparison,
    pathfinder_fit,
    predictive,
    sample,
    smc_sample,
)


def conjugate_ir(n=40, true_mu=1.5, seed=0):
    rng = np.random.default_rng(seed)
    ys = rng.normal(true_mu, 1.0, size=n)
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "mu", dists.Normal, {"mu": 0.0, "sigma": 10.0})
    ir = Builder.rv(ir, "y", dists.Normal, {"mu": "mu", "sigma": 1.0})
    ir = Builder.obs(ir, "y_obs", "y", ys)
    post_var = 1.0 / (1.0 / 100.0 + n)
    post_mean = post_var * ys.sum()
    return ir, post_mean, np.sqrt(post_var), ys


def test_advi_conjugate():
    ir, post_mean, post_sd, _ = conjugate_ir()
    out = advi_fit(ir, num_steps=4000, seed=0)
    mu_draws = out["draws"]["mu"]
    assert abs(float(mu_draws.mean()) - post_mean) < 0.1
    assert abs(float(mu_draws.std()) - post_sd) < 0.12
    assert out["elbo_history"].shape == (4000,)


def test_advi_constrained():
    rng = np.random.default_rng(1)
    ys = np.abs(rng.normal(0, 2.0, size=60))
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "sigma", dists.HalfNormal, {"sigma": 5.0})
    ir = Builder.rv(ir, "y", dists.Normal, {"mu": 0.0, "sigma": "sigma"})
    ir = Builder.obs(ir, "y_obs", "y", rng.normal(0, 2.0, size=60))
    out = advi_fit(ir, num_steps=3000, seed=1)
    s = out["draws"]["sigma"]
    assert (s > 0).all()
    assert 1.2 < float(s.mean()) < 3.0


def test_smc_conjugate():
    ir, post_mean, post_sd, _ = conjugate_ir()
    trace, info = smc_sample(ir, num_particles=1500, seed=0)
    mu = trace["mu"]
    assert abs(float(mu.mean()) - post_mean) < 0.15
    assert info["betas"][-1] == 1.0
    assert info["num_stages"] >= 1


def test_pathfinder_conjugate():
    ir, post_mean, post_sd, _ = conjugate_ir()
    out = pathfinder_fit(ir, num_iters=150, seed=0)
    mu = out["draws"]["mu"]
    # pathfinder's diag-normal fit is crude (reference pathfinder.ex:
    # sigma = 1/sqrt(|grad|+eps) blows up near the mode where grad -> 0,
    # so max-ELBO lands slightly off-mode); check rough location only
    assert abs(float(mu.mean()) - post_mean) < 0.7
    assert np.isfinite(out["elbo_path"]).any()


def test_waic_loo_finite_and_consistent():
    ir, _, _, ys = conjugate_ir()
    trace, _ = sample(ir, num_warmup=300, num_samples=300, seed=2)
    w = model_comparison.waic(ir, trace)
    l = model_comparison.loo(ir, trace)
    assert np.isfinite(w["waic"]) and np.isfinite(l["loo"])
    assert w["p_waic"] > 0
    # elpd estimates should roughly agree on a well-specified model
    assert abs(w["elpd_waic"] - l["elpd_loo"]) < 5.0
    assert len(w["pointwise"]) == len(ys)


def test_compare_ranks_better_model_first():
    rng = np.random.default_rng(3)
    ys = rng.normal(2.0, 1.0, size=50)

    def make(prior_mu):
        ir = Builder.new_ir()
        ir = Builder.rv(ir, "mu", dists.Normal, {"mu": prior_mu, "sigma": 0.1})
        ir = Builder.rv(ir, "y", dists.Normal, {"mu": "mu", "sigma": 1.0})
        ir = Builder.obs(ir, "y_obs", "y", ys)
        return ir

    good = make(2.0)   # prior tightly at the truth
    bad = make(-3.0)   # prior tightly wrong
    t_good, _ = sample(good, num_warmup=200, num_samples=200, seed=3)
    t_bad, _ = sample(bad, num_warmup=200, num_samples=200, seed=3)
    rows = model_comparison.compare({"good": (good, t_good), "bad": (bad, t_bad)})
    assert rows[0]["name"] == "good"
    assert rows[0]["rank"] == 0
    assert rows[1]["delta_elpd"] > 0
    # paired SE from pointwise diffs (Vehtari workflow): positive for
    # the loser, zero for the winner, and the gap here is decisive
    assert rows[0]["delta_elpd_se"] == 0.0
    assert rows[1]["delta_elpd_se"] > 0
    assert rows[1]["delta_elpd"] > 2 * rows[1]["delta_elpd_se"]


def test_prior_samples():
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "mu", dists.Normal, {"mu": 2.0, "sigma": 0.5})
    ir = Builder.rv(ir, "sigma", dists.HalfNormal, {"sigma": 1.0})
    ir = Builder.rv(ir, "y", dists.Normal, {"mu": "mu", "sigma": "sigma"})
    draws = predictive.prior_samples(ir, num_draws=2000, seed=0)
    assert abs(float(draws["mu"].mean()) - 2.0) < 0.05
    assert (draws["sigma"] > 0).all()
    # y marginal mean = E[mu]
    assert abs(float(draws["y"].mean()) - 2.0) < 0.1


def test_posterior_predictive():
    ir, post_mean, _, ys = conjugate_ir()
    trace, _ = sample(ir, num_warmup=300, num_samples=200, seed=4)
    ppc = predictive.posterior_predictive(ir, trace, seed=0)
    assert "y_obs" in ppc
    assert ppc["y_obs"].shape[:2] == (1, 200)
    # posterior predictive mean ~ posterior mean of mu
    assert abs(float(ppc["y_obs"].mean()) - post_mean) < 0.2


def test_posterior_predictive_mixture_likelihood():
    """Regression (ADVICE r1, low): composite (Mixture) likelihoods must
    posterior-predictive-sample instead of KeyError-ing on dropped
    components/params keys."""
    rng = np.random.default_rng(0)
    ys = np.concatenate([rng.normal(-2, 0.5, 60), rng.normal(3, 0.5, 60)])
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "m1", dists.Normal, {"mu": 3.0, "sigma": 2.0})
    ir = Builder.rv(
        ir, "y", dists.Mixture,
        {
            "components": [dists.Normal, dists.Normal],
            "params": [{"mu": -2.0, "sigma": 0.5}, {"mu": "m1", "sigma": 0.5}],
            "weights": np.array([0.5, 0.5]),
        },
    )
    ir = Builder.obs(ir, "y_obs", "y", ys)
    trace, _ = sample(ir, num_warmup=300, num_samples=200, seed=1)
    ppc = predictive.posterior_predictive(ir, trace, seed=0)
    assert ppc["y_obs"].shape[:2] == (1, 200)
    flat = np.asarray(ppc["y_obs"]).reshape(-1)
    # bimodal predictive: overall mean near 0.5*(-2 + 3) = 0.5
    assert abs(flat.mean() - 0.5) < 0.5
    # both modes represented
    assert (flat < 0).mean() > 0.25 and (flat > 0).mean() > 0.25


def test_advi_early_stop_on_device():
    """VERDICT r2 #6: the ELBO-window convergence test must TERMINATE the
    on-device while_loop (reference advi.ex:77-84 stops the host loop),
    not just annotate post-hoc."""
    ir, post_mean, post_sd, _ = conjugate_ir()
    out = advi_fit(ir, num_steps=20000, seed=0, window=100, tol=1e-3)
    assert out["converged_at"] is not None
    assert out["steps_run"] < 20000, "early stop never fired"
    assert out["steps_run"] >= out["converged_at"]
    # steps never run are NaN in the history; run steps are finite
    hist = out["elbo_history"]
    assert np.isfinite(hist[: out["steps_run"]]).all()
    assert np.isnan(hist[out["steps_run"]:]).all()
    # accuracy unaffected by stopping early
    mu_draws = out["draws"]["mu"]
    assert abs(float(mu_draws.mean()) - post_mean) < 0.1

    # opt-out runs every step
    out_full = advi_fit(ir, num_steps=1000, seed=0, early_stop=False)
    assert out_full["steps_run"] == 1000
    assert np.isfinite(out_full["elbo_history"]).all()


def test_advi_adam_path():
    ir, post_mean, post_sd, _ = conjugate_ir()
    out = advi_fit(ir, num_steps=4000, seed=2, optimizer="adam")
    mu_draws = out["draws"]["mu"]
    assert abs(float(mu_draws.mean()) - post_mean) < 0.1
    assert abs(float(mu_draws.std()) - post_sd) < 0.15
    with pytest.raises(ValueError, match="optimizer"):
        advi_fit(ir, num_steps=10, optimizer="rmsprop")


def test_smc_likelihood_tempering_evidence():
    """tempering='likelihood' telescopes to the marginal likelihood:
    validated against the CLOSED-FORM conjugate evidence (y jointly
    N(0, I + tau^2 11^T)) and cross-checked against the flow ELBO
    lower bound. The full-logp mode (reference parity) has no proper
    base measure and must not report one."""
    import numpy as np
    from exmc_tpu import Model, dists
    from exmc_tpu.smc import smc_sample

    rng = np.random.default_rng(5)
    y = rng.normal(2.0, 1.0, 30)
    with Model() as m:
        m.rv("mu", dists.Normal, {"mu": 0.0, "sigma": 3.0})
        m.rv("y", dists.Normal, {"mu": "mu", "sigma": 1.0})
        m.obs("y_obs", "y", y)
    n = len(y)
    cov = np.eye(n) + 9.0 * np.ones((n, n))
    _, logdet = np.linalg.slogdet(cov)
    log_z = -0.5 * (n * np.log(2 * np.pi) + logdet
                    + y @ np.linalg.solve(cov, y))

    trace, info = smc_sample(m.ir, num_particles=2000, seed=1,
                             tempering="likelihood")
    assert info["converged"]
    assert info["log_evidence"] == pytest.approx(log_z, abs=0.3)
    # posterior unchanged by the tempering path
    prec = 1.0 / 9.0 + n
    assert trace["mu"][0].mean() == pytest.approx(y.sum() / prec, abs=0.1)

    _, info_full = smc_sample(m.ir, num_particles=500, seed=0)
    assert "log_evidence" not in info_full

    with pytest.raises(ValueError, match="tempering"):
        smc_sample(m.ir, tempering="prior")


def test_partial_logp_split_sums_to_full():
    import jax.numpy as jnp
    import numpy as np
    from exmc_tpu import Model, dists
    from exmc_tpu.compiler import compile_logp, partial_logp

    y = np.linspace(-1, 2, 12)
    with Model() as m:
        m.rv("mu", dists.Normal, {"mu": 0.0, "sigma": 3.0})
        m.rv("sigma", dists.HalfNormal, {"sigma": 2.0})
        m.rv("y", dists.Normal, {"mu": "mu", "sigma": "sigma"})
        m.obs("y_obs", "y", y)
    model = compile_logp(m.ir, ncp=True)
    lp_p = partial_logp(model, "prior")
    lp_l = partial_logp(model, "likelihood")
    for z in ([0.0, 0.0], [1.3, -0.7], [-2.0, 0.4]):
        z = jnp.asarray(z)
        assert float(model.logp(z)) == pytest.approx(
            float(lp_p(z) + lp_l(z)), rel=1e-6)
    with pytest.raises(ValueError, match="part"):
        partial_logp(model, "posterior")


def test_log_marginal_likelihood_and_bayes_factor():
    """Evidence API: SMC estimate matches the closed form, the flow
    ELBO sits at-or-below it (lower bound), and the Bayes factor
    strongly favors the model whose prior covers the data."""
    import numpy as np
    from exmc_tpu import Model, dists
    from exmc_tpu.model_comparison import (
        bayes_factor,
        log_marginal_likelihood,
    )

    rng = np.random.default_rng(3)
    y = rng.normal(2.0, 1.0, 40)

    def make(mu0):
        with Model() as m:
            m.rv("mu", dists.Normal, {"mu": mu0, "sigma": 1.0})
            m.rv("y", dists.Normal, {"mu": "mu", "sigma": 1.0})
            m.obs("y_obs", "y", y)
        return m.ir

    n = len(y)
    cov = np.eye(n) + np.ones((n, n))  # prior sd 1 on mu
    _, logdet = np.linalg.slogdet(cov)
    log_z = -0.5 * (n * np.log(2 * np.pi) + logdet
                    + (y - 2.0) @ np.linalg.solve(cov, y - 2.0))

    smc = log_marginal_likelihood(make(2.0), method="smc",
                                  num_particles=2000, seed=0)
    assert smc["log_evidence"] == pytest.approx(log_z, abs=0.4)

    flow = log_marginal_likelihood(make(2.0), method="flow",
                                   num_iters=1200, seed=0)
    assert flow["lower_bound"]
    assert flow["log_evidence"] < log_z + 0.2      # bound (MC slack)
    assert flow["log_evidence"] > log_z - 1.0      # and reasonably tight
    assert flow["pareto_k"] < 0.7

    bf = bayes_factor(make(2.0), make(-3.0), num_particles=1000, seed=0)
    assert bf["log10_bf"] > 2.0  # decisive for the well-centered prior

    with pytest.raises(ValueError, match="method"):
        log_marginal_likelihood(make(2.0), method="bridge")


def test_smc_likelihood_tempering_accepts_compiled_model():
    """Regression (round-4 review): a CompiledModel input used to crash
    prior_samples (no .nodes); the rewritten-IR path must give the
    same evidence as the raw-IR path."""
    import numpy as np
    from exmc_tpu import Model, dists
    from exmc_tpu.compiler import compile_logp
    from exmc_tpu.smc import smc_sample

    rng = np.random.default_rng(5)
    y = rng.normal(2.0, 1.0, 30)
    with Model() as m:
        m.rv("mu", dists.Normal, {"mu": 0.0, "sigma": 3.0})
        m.rv("y", dists.Normal, {"mu": "mu", "sigma": 1.0})
        m.obs("y_obs", "y", y)
    _, info_ir = smc_sample(m.ir, num_particles=1500, seed=2,
                            tempering="likelihood")
    model = compile_logp(m.ir, ncp=True)
    _, info_cm = smc_sample(model, num_particles=1500, seed=2,
                            tempering="likelihood")
    assert info_cm["converged"]
    assert info_cm["log_evidence"] == pytest.approx(
        info_ir["log_evidence"], abs=0.5)


def test_log_marginal_likelihood_flow_conflicting_kwargs():
    from exmc_tpu import Model, dists
    from exmc_tpu.flows import flow_fit
    from exmc_tpu.model_comparison import log_marginal_likelihood

    with Model() as m:
        m.rv("mu", dists.Normal, {"mu": 0.0, "sigma": 1.0})
        m.rv("y", dists.Normal, {"mu": "mu", "sigma": 1.0})
        m.obs("y_obs", "y", np.zeros(5))
    fit = flow_fit(m.ir, num_iters=20)
    with pytest.raises(ValueError, match="not both"):
        log_marginal_likelihood(m.ir, method="flow", flow=fit,
                                num_iters=500)

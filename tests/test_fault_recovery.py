"""Chain-level fault recovery (VERDICT r1 task 4; reference
distributed.ex:172-180 retries failed chains on the coordinator).

Two layers:
* in-kernel: a dead carry (non-finite accepted state) re-initializes
  during warmup and increments a per-chain ``recoveries`` counter;
* host: ``sample_chains_sharded`` surfaces per-chain ``chain_ok``
  markers and re-dispatches dead chains as a fresh launch, splicing
  healthy retries into the trace instead of aborting the run.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from exmc_tpu import Builder, dists, sample
from exmc_tpu.compiler import compile_logp
from exmc_tpu.nuts.sampler import (
    NUTSSampler,
    _pipeline_init,
    _pipeline_segment,
    _pipeline_xs,
)
from exmc_tpu.parallel import make_mesh, sample_chains_sharded
from exmc_tpu.parallel.distributed import (
    _chain_health,
    _redispatch_failed_chains,
)
from exmc_tpu.utils import FaultInjector


def _ir():
    ys = np.array([2.1, 1.8, 2.5, 2.0, 1.9, 2.3])
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "mu", dists.Normal, {"mu": 0.0, "sigma": 5.0})
    ir = Builder.rv(ir, "x", dists.Normal, {"mu": "mu", "sigma": 0.5})
    ir = Builder.obs(ir, "x_obs", "x", ys)
    return ir


def test_inkernel_recovery_poisoned_chain_8_devices():
    """Inject a poisoned carry (NaN accepted state) into one chain of an
    8-chain run on the 8-device CPU mesh: the kernel resets it during
    warmup, counts the recovery, and ALL chains deliver finite draws."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    model = compile_logp(_ir())
    d = model.size
    mesh = make_mesh(8, dp=8, sp=1)
    data = model.data
    vag_fn = lambda q: model.value_and_grad(q, data)  # noqa: E731

    n_chains = 8
    keys = jax.random.split(jax.random.PRNGKey(0), n_chains)
    q0 = jnp.zeros((n_chains, d), jnp.float32) + 0.3

    def init_one(q, key):
        logp, grad = vag_fn(q)
        from exmc_tpu.nuts.leapfrog import make_metric

        return _pipeline_init(
            vag_fn, q, logp, grad, key,
            make_metric(jnp.ones((d,), jnp.float32)), 0.5, d, jnp.float32,
            False,
        )

    carry = jax.vmap(init_one)(q0, keys)
    # poison chain 3: NaN position AND logp — divergence semantics cannot
    # absorb a dead accepted state, only the recovery path can
    q_poisoned = carry[0].at[3].set(jnp.nan)
    logp_poisoned = carry[1].at[3].set(jnp.nan)
    carry = (q_poisoned, logp_poisoned) + carry[2:]

    sched_iters = 60
    from exmc_tpu.nuts.warmup import build_schedule

    sched = build_schedule(sched_iters, 6)
    xs = jax.tree.map(jnp.asarray, _pipeline_xs(sched, 20, 6))

    def seg(c, xs):
        return _pipeline_segment(vag_fn, c, xs, 0.8, 6, True, d,
                                 jnp.float32, False)

    with mesh:
        sharded_carry = jax.tree.map(
            lambda a: jax.device_put(
                a, NamedSharding(mesh, P("dp", *([None] * (a.ndim - 1))))
            ),
            carry,
        )
        out_carry, (draws, stats) = jax.jit(
            jax.vmap(seg, in_axes=(0, None), axis_name="chains")
        )(sharded_carry, xs)

    recoveries = np.asarray(out_carry[7])
    assert recoveries[3] >= 1, "poisoned chain must be reset"
    assert (recoveries[np.arange(8) != 3] == 0).all()
    # all chains (incl. the recovered one) end healthy
    post = np.asarray(draws)[:, sched_iters:]
    assert np.isfinite(post).all()
    assert np.isfinite(np.asarray(stats["logp"])[:, sched_iters:]).all()


def test_recoveries_stat_zero_on_clean_run():
    _, stats = sample(_ir(), num_warmup=200, num_samples=100, num_chains=4,
                      seed=0)
    assert "recoveries" in stats
    assert (stats["recoveries"] == 0).all()


def test_chain_health_markers():
    logp = np.zeros((4, 50))
    logp[2, 10] = np.nan
    ok = _chain_health({"logp": logp})
    np.testing.assert_array_equal(ok, [True, True, False, True])


def test_host_redispatch_splices_failed_chain():
    """Force one chain to be marked dead and verify the re-dispatch
    replaces it with a healthy retry chain (N-1 originals + 1 retried)."""
    ir = _ir()
    mesh = make_mesh(8, dp=8, sp=1)
    trace, stats = sample_chains_sharded(
        ir, 8, mesh, num_warmup=150, num_samples=100, seed=0,
        retry_failed=False,
    )
    assert stats["chain_ok"].all()
    orig_mu = trace["mu"].copy()
    # poison chain 5's record as a dead chain would leave it
    stats = {k: np.array(v) for k, v in stats.items()}
    trace = {k: np.array(v) for k, v in trace.items()}
    stats["logp"][5] = np.nan
    trace["mu"][5] = np.nan

    model = compile_logp(ir)
    sampler = NUTSSampler(model=model, num_warmup=150, num_samples=100)
    trace2, stats2 = _redispatch_failed_chains(
        sampler, mesh, trace, stats, None, model.data, seed=0,
    )
    assert stats2["redispatched"] == 1
    assert stats2["chain_ok"].all()
    assert np.isfinite(trace2["mu"]).all()
    # untouched chains keep their draws; chain 5 got fresh ones
    np.testing.assert_array_equal(trace2["mu"][0], orig_mu[0])
    assert abs(float(trace2["mu"][5].mean()) - 2.1) < 0.4


def test_fault_injector_sharded_run_survives():
    """FaultInjector on the sharded path: NaN faults inside the trigger
    region become divergences, every chain stays healthy (layer 1-2),
    and the run completes with chain_ok all-true."""
    model = FaultInjector(kind="nan", trigger_lo=0.395,
                          trigger_hi=0.405).wrap_model(compile_logp(_ir()))
    mesh = make_mesh(8, dp=8, sp=1)
    trace, stats = sample_chains_sharded(
        model, 8, mesh, num_warmup=200, num_samples=150, seed=1,
    )
    assert stats["chain_ok"].all()
    assert np.isfinite(trace["mu"]).all()
    assert abs(float(trace["mu"].mean()) - 2.1) < 0.4


def test_ensemble_rescue_teleports_outlier_chain():
    """Mechanism test: at a rescue checkpoint, a chain whose logp is
    hundreds of nats below the ensemble median adopts the donor state
    (jittered) and its metric; healthy chains are untouched."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from exmc_tpu import Builder, dists
    from exmc_tpu.compiler import compile_logp
    from exmc_tpu.nuts.leapfrog import make_metric
    from exmc_tpu.nuts.sampler import _pipeline_init, _pipeline_segment

    ys = np.array([1.0, 1.4, 0.6, 1.1, 0.9, 1.2, 0.8, 1.3], np.float32)
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "mu", dists.Normal, {"mu": 0.0, "sigma": 5.0})
    ir = Builder.rv(ir, "x", dists.Normal, {"mu": "mu", "sigma": 0.3},
                    shape=(8,))
    ir = Builder.obs(ir, "x_obs", "x", ys)
    model = compile_logp(ir, ncp=False)
    d = model.size
    vag_fn = lambda q: model.value_and_grad(q, None)

    # 6 chains: rescue requires >= 5 (below that the 75th-percentile
    # reference degenerates to the max chain — see do_rescue)
    q0 = jnp.zeros((6, d), jnp.float32).at[2, 0].set(150.0)

    def init_one(qi, key):
        logp, grad = vag_fn(qi)
        return _pipeline_init(vag_fn, qi, logp, grad, key, 
                              make_metric(jnp.ones((d,), jnp.float32)),
                              0.05, d, jnp.float32, False)

    keys = jax.vmap(jax.random.fold_in, (None, 0))(
        jax.random.PRNGKey(0), jnp.arange(6))
    carry = jax.vmap(init_one)(q0, keys)

    # 2 iterations; rescue fires at iteration 1
    xs = (
        jnp.zeros((2,), bool),            # update_mass
        jnp.zeros((2,), bool),            # window_end
        jnp.full((2,), 4, jnp.int32),     # depth cap
        jnp.ones((2,), bool),             # in_warmup
        jnp.zeros((2,), bool),            # eps search
        jnp.asarray([False, True]),       # rescue checkpoint
        jnp.zeros((2,), bool),            # emit (per-draw streaming)
        jnp.arange(2, dtype=jnp.int32),   # draw_idx
    )

    def seg(c, x):
        return _pipeline_segment(vag_fn, c, x, 0.8, 4, True, d,
                                 jnp.float32, False, rescue_axis="chains")

    out_carry, _ = jax.jit(jax.vmap(seg, in_axes=(0, None),
                                    axis_name="chains"))(carry, xs)
    rescues = np.asarray(out_carry[8])
    assert rescues.tolist() == [0, 0, 1, 0, 0, 0], rescues
    # the rescued chain is now in the typical set, not at mu = 150
    assert abs(float(out_carry[0][2, 0])) < 10.0

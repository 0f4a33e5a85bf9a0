"""Multi-host / multi-chip chain distribution (the TPU-native
counterpart of reference nuts/distributed.ex).

Reference contract (distributed.ex:56-209): validate nodes, warmup on
the coordinator, broadcast tuning, fan chains out per node, retry failed
chains on the coordinator. Here:

* ``initialize_distributed()`` = the node-validation step
  (jax.distributed.initialize over DCN when env vars are present);
* tuning broadcast = replicated arrays over the mesh (one ICI/DCN
  broadcast, no :erpc);
* chain fan-out = the chain axis of ``jit(vmap(pipeline))`` sharded over
  "dp" — XLA partitions the independent per-chain programs with zero
  cross-chip traffic in the hot loop;
* fault recovery: a failed host surfaces as a JAX runtime error at the
  orchestration layer; NaN-level faults are already absorbed inside the
  kernel (divergence semantics, tree.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from exmc_tpu.compiler import CompiledModel, compile_logp
from exmc_tpu.config import default_dtype
from exmc_tpu.nuts.sampler import NUTSSampler, CHAIN_SEED_STRIDE, _init_position
from exmc_tpu.parallel.sharding import make_mesh


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None):
    """Multi-host bring-up (reference validate_nodes!,
    distributed.ex:105-122). No-op when single-process."""
    if coordinator_address is None:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def sample_chains_sharded(ir, num_chains, mesh=None, *, seed=0, data=None,
                          ncp=True, shared_warmup=False, retry_failed=True,
                          **opts):
    """Multi-chip multi-chain NUTS (reference Distributed.sample_chains,
    distributed.ex:56): chains sharded across the mesh's "dp" axis,
    per-chain adaptation on-device, one jitted program per host.

    When the mesh has an "sp" axis > 1, the LIKELIHOOD is additionally
    data-parallel: observation rows (registered via ``Builder.data``,
    D69) shard over "sp" and each gradient evaluation psums partial
    values/grads across the axis — the public product path for models
    whose data doesn't fit (or saturate) one chip (VERDICT r1 task 3;
    composes with pooled_adaptation's cross-chain Welford psum).

    Works identically on 1 chip (mesh of 1) — the analogue of the
    reference's ``nodes: [node()]`` coordinator-only mode used for
    testing without a cluster."""
    model = ir if isinstance(ir, CompiledModel) else compile_logp(ir, ncp=ncp)
    if mesh is None:
        mesh = make_mesh()
    dp = mesh.shape["dp"]
    sp = mesh.shape.get("sp", 1)
    if num_chains % dp != 0:
        raise ValueError(f"num_chains={num_chains} not divisible by dp={dp}")

    known = (
        "num_warmup", "num_samples", "max_tree_depth", "target_accept",
        "dense_mass", "pooled_adaptation", "interweave", "gibbs_scales",
        "ensemble_rescue", "adapt_mass",
    )
    unknown = set(opts) - set(known)
    if unknown:
        raise TypeError(f"unknown sampler options: {sorted(unknown)}")
    dtype = default_dtype()
    d = model.size
    if data is None:
        data = model.data

    vag_builder = None
    if sp > 1:
        if data is None:
            raise ValueError(
                "sp>1 shards the likelihood over observation data rows: "
                "register data with Builder.data(ir, tensor) (the "
                "'__obs_data' JIT-argument pattern, D69)"
            )
        from exmc_tpu.parallel.sharding import (
            make_data_parallel_vag,
            shard_data,
        )

        dp_vag = make_data_parallel_vag(model, mesh)
        vag_builder = lambda data_arr: (lambda q: dp_vag(q, data_arr))  # noqa: E731
        data = shard_data(mesh, data)

    sampler = NUTSSampler(
        model=model,
        shared_warmup=shared_warmup,
        vag_builder=vag_builder,
        **{k: opts[k] for k in known if k in opts},
    )

    base = jax.random.PRNGKey(seed)
    keys = jax.vmap(lambda i: jax.random.fold_in(base, i * CHAIN_SEED_STRIDE))(
        jnp.arange(num_chains)
    )
    init_keys = jax.vmap(jax.random.fold_in, (None, 0))(
        jax.random.fold_in(base, 10_000_019), jnp.arange(num_chains)
    )
    q_inits = jax.vmap(lambda k: _init_position(k, d, dtype))(init_keys)

    chain_sharding = NamedSharding(mesh, P("dp"))
    keys = jax.device_put(keys, NamedSharding(mesh, P("dp", None)))
    q_inits = jax.device_put(q_inits, NamedSharding(mesh, P("dp", None)))
    ws_eps = jax.device_put(jnp.ones((num_chains,), dtype), chain_sharding)
    ws_inv = jax.device_put(
        jnp.ones((num_chains, d), dtype), NamedSharding(mesh, P("dp", None))
    )
    if sampler.dense_mass:
        ws_inv = jax.device_put(
            jnp.broadcast_to(jnp.eye(d, dtype=dtype), (num_chains, d, d)),
            NamedSharding(mesh, P("dp", None, None)),
        )

    def launch(q_inits, keys, attempt):
        try:
            with mesh:
                return sampler._run_jit(
                    data, q_inits, keys, ws_eps, ws_inv,
                    num_chains=num_chains, warm_started=False,
                )
        except Exception:
            # transient host/runtime failure (e.g. a TPU worker restart):
            # one full relaunch, the coordinator-retry analogue of
            # reference distributed.ex:172-180
            if attempt >= 1:
                raise
            return launch(q_inits, keys, attempt + 1)

    draws, stats, tuning = launch(q_inits, keys, 0)

    host = _host_gather(mesh)
    draws = host(draws)
    stats = {k: host(v) for k, v in stats.items()}
    stats["step_size"] = host(tuning["step_size"])
    stats["inv_mass"] = host(tuning["inv_mass"])
    stats["recoveries"] = host(tuning["recoveries"])
    stats["divergences"] = stats["diverging"].sum(axis=-1)
    trace = sampler.constrain_trace(draws, data)
    return _redispatch_failed_chains(
        sampler, mesh, trace, stats, np.asarray(draws), data, seed,
        shared_warmup=shared_warmup,
        max_retries=1 if retry_failed else 0,
    )


def _host_gather(mesh):
    """``np.asarray`` that also works when the mesh spans PROCESSES
    (the real multi-host path, reference distributed.ex:142-165's
    result collection): chain-sharded outputs are not fully addressable
    on any one host, so reshard to fully-replicated (one DCN/ICI
    collective per array) and read the local copy."""
    if jax.process_count() == 1:
        return np.asarray
    replicated = NamedSharding(mesh, P())

    def gather(x):
        x = jax.jit(lambda a: a, out_shardings=replicated)(jnp.asarray(x))
        return np.asarray(x.addressable_data(0))

    return gather


def _chain_health(stats):
    """Per-chain failure markers: a healthy chain has finite logp at
    every kept draw (non-finite accepted state = dead; in-warmup deaths
    were already reset+counted by the kernel's recovery path)."""
    return np.isfinite(np.asarray(stats["logp"])).all(axis=-1)


def _redispatch_failed_chains(sampler, mesh, trace, stats, draws, data,
                              seed, *, shared_warmup=False, max_retries=1):
    """Surface per-chain failure markers and re-dispatch dead chains as a
    fresh (smaller) launch on the surviving mesh instead of aborting the
    whole run (reference distributed.ex:172-180's chain retry). Healthy
    retry chains splice into the original trace; chains that remain dead
    after ``max_retries`` stay marked in ``stats["chain_ok"]``."""
    ok = _chain_health(stats)
    stats["chain_ok"] = ok
    stats["redispatched"] = 0
    if ok.all() or max_retries < 1:
        return trace, stats

    dp = mesh.shape["dp"]
    bad_idx = np.flatnonzero(~ok)
    # pad to a dp multiple so the retry launch shards evenly
    n_retry = max(int(np.ceil(len(bad_idx) / dp)) * dp, dp)
    retry_trace, retry_stats = sample_chains_sharded(
        sampler.model, n_retry, mesh, seed=seed + 104729, data=data,
        shared_warmup=shared_warmup, retry_failed=False,
        num_warmup=sampler.num_warmup, num_samples=sampler.num_samples,
        max_tree_depth=sampler.max_tree_depth,
        target_accept=sampler.target_accept,
        dense_mass=sampler.dense_mass,
        pooled_adaptation=sampler.pooled_adaptation,
        interweave=sampler.interweave,
        gibbs_scales=sampler.gibbs_scales,
        ensemble_rescue=sampler.ensemble_rescue,
        adapt_mass=sampler.adapt_mass,
    )
    healthy = np.flatnonzero(retry_stats["chain_ok"])[: len(bad_idx)]
    # np.asarray views of device arrays are read-only: copy before splicing
    trace = {k: np.array(v) for k, v in trace.items()}
    stats = {
        k: (np.array(v) if isinstance(v, np.ndarray) else v)
        for k, v in stats.items()
    }
    ok = np.array(ok)
    for i, j in zip(bad_idx[: len(healthy)], healthy):
        for k in trace:
            trace[k][i] = retry_trace[k][j]
        for k in ("logp", "diverging", "accept_prob", "depth", "step_size",
                  "inv_mass", "divergences"):
            if k in stats and k in retry_stats:
                stats[k][i] = retry_stats[k][j]
        ok[i] = True
    stats["chain_ok"] = ok
    stats["redispatched"] = len(healthy)
    return trace, stats

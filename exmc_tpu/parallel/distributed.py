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
                          ncp=True, shared_warmup=False, **opts):
    """Multi-chip multi-chain NUTS (reference Distributed.sample_chains,
    distributed.ex:56): chains sharded across the mesh's "dp" axis,
    per-chain adaptation on-device, one jitted program per host.

    Works identically on 1 chip (mesh of 1) — the analogue of the
    reference's ``nodes: [node()]`` coordinator-only mode used for
    testing without a cluster."""
    model = ir if isinstance(ir, CompiledModel) else compile_logp(ir, ncp=ncp)
    if mesh is None:
        mesh = make_mesh()
    dp = mesh.shape["dp"]
    if num_chains % dp != 0:
        raise ValueError(f"num_chains={num_chains} not divisible by dp={dp}")

    known = (
        "num_warmup", "num_samples", "max_tree_depth", "target_accept",
        "dense_mass", "pooled_adaptation",
    )
    unknown = set(opts) - set(known)
    if unknown:
        raise TypeError(f"unknown sampler options: {sorted(unknown)}")
    sampler = NUTSSampler(
        model=model,
        shared_warmup=shared_warmup,
        **{k: opts[k] for k in known if k in opts},
    )
    dtype = default_dtype()
    d = model.size
    if data is None:
        data = model.data

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

    with mesh:
        draws, stats, tuning = sampler._run_jit(
            data, q_inits, keys, ws_eps, ws_inv,
            num_chains=num_chains, warm_started=False,
        )

    stats = {k: np.asarray(v) for k, v in stats.items()}
    stats["step_size"] = np.asarray(tuning["step_size"])
    stats["inv_mass"] = np.asarray(tuning["inv_mass"])
    stats["divergences"] = stats["diverging"].sum(axis=-1)
    trace = sampler.constrain_trace(draws, data)
    return trace, stats

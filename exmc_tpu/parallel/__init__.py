"""Multi-chip / multi-host parallelism.

The reference's distribution layer is Erlang RPC: coordinator warmup ->
tuning broadcast -> per-node chain fan-out with coordinator fallback
(reference nuts/distributed.ex:56-209, SURVEY.md §2.10-2.11). The
TPU-native equivalents here:

* chain parallelism  — chains sharded over a mesh axis ("dp"): each
  device runs its local chains' full NUTS pipeline; zero collectives in
  the hot loop (chains are independent, like BEAM processes but fused).
* data parallelism   — the log-density itself sharded over a "sp" axis
  for large-n likelihoods: each device scores its data shard, one psum
  per evaluation rides the ICI (exmc_tpu.parallel.sharding).
* multi-host         — ``initialize_distributed()`` wraps
  ``jax.distributed.initialize``; the same mesh code then spans hosts
  over ICI/DCN (no :erpc, no IR serialization — JAX models are pure
  functions of arrays, so the reference's "closure barrier"
  (DISTRIBUTED_BENCHMARKS.md:110-142) does not exist).
"""

from exmc_tpu.parallel.sharding import (
    make_mesh,
    data_parallel_vag,
    shard_chains,
)
from exmc_tpu.parallel.distributed import (
    initialize_distributed,
    sample_chains_sharded,
)
from exmc_tpu.parallel.diagnostics import (
    sharded_ess,
    sharded_nested_rhat,
    sharded_rhat,
)

__all__ = [
    "make_mesh",
    "data_parallel_vag",
    "shard_chains",
    "initialize_distributed",
    "sample_chains_sharded",
    "sharded_rhat",
    "sharded_ess",
    "sharded_nested_rhat",
]

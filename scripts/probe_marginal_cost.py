"""Probe the on-chip cost of one sv_marginal step at T=5000.

The axon worker kernel-faults on multi-minute device calls (followup3/5,
2026-08-19); this measures (a) one vmapped logp+grad, (b) a tiny chunked
NUTS run, so longt_bench's chunk_iters can be sized to keep every device
call comfortably under the watchdog.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    t_len = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    import jax
    import jax.numpy as jnp

    from exmc_tpu.benchmarks.suite import sv_model
    from exmc_tpu.compiler import compile_logp
    from exmc_tpu.marginal import sv_marginal_model
    from exmc_tpu.nuts.sampler import _make_sampler

    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)

    r = np.asarray(sv_model(t=t_len).nodes["r_obs"].op[2])
    ir_m = sv_marginal_model(r, newton_iters=12)
    model = compile_logp(ir_m, ncp=False)
    d = model.size
    print(f"T={t_len} d={d}", flush=True)

    vlg = jax.jit(jax.vmap(jax.value_and_grad(model.logp)))
    q = jnp.zeros((8, d), jnp.float32)
    t0 = time.time()
    v, g = jax.block_until_ready(vlg(q))
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(5):
        v, g = jax.block_until_ready(vlg(q))
    per_vlg = (time.time() - t0) / 5
    print(json.dumps({"vlg_compile_s": round(compile_s, 2),
                      "vlg_per_call_s": round(per_vlg, 4),
                      "logp0": float(v[0])}), flush=True)

    # tiny chunked run: 10+10 iterations in chunks of 5 -> 4 device calls
    sampler = _make_sampler(model, num_warmup=10, num_samples=10,
                            max_tree_depth=8)
    t0 = time.time()
    sampler.run_chunked(num_chains=8, seed=0, chunk_iters=5)
    chunk_compile_s = time.time() - t0
    t0 = time.time()
    sampler.run_chunked(num_chains=8, seed=1, chunk_iters=5)
    warm_wall = time.time() - t0
    per_iter = warm_wall / 20
    print(json.dumps({"chunk_compile_s": round(chunk_compile_s, 2),
                      "warm_wall_20_iters_s": round(warm_wall, 2),
                      "per_iter_s": round(per_iter, 3),
                      "chunk_for_45s": max(1, int(45 / max(per_iter, 1e-6)))}),
          flush=True)


if __name__ == "__main__":
    main()

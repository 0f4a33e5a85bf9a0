"""Sweep the tridiagonal-kernel block size at T=5000 on the current
backend: per-call latency of one vmapped logp+grad for each block, plus
cross-block logp agreement. Sizes longt_bench's marginal row (the axon
worker kills multi-minute device calls, so the logp must be fast enough
that a NUTS chunk stays well under a minute)."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    t_len = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    blocks = [int(b) for b in (sys.argv[2].split(",") if len(sys.argv) > 2
                               else ["128", "256", "512", "1024"])]
    import jax
    import jax.numpy as jnp

    from exmc_tpu import marginal
    from exmc_tpu.benchmarks.suite import sv_model
    from exmc_tpu.compiler import compile_logp

    print(f"device: {jax.devices()[0]}", flush=True)
    r = np.asarray(sv_model(t=t_len).nodes["r_obs"].op[2])

    ref_logp = None
    for blk in blocks:
        marginal._BLOCK = blk
        ir_m = marginal.sv_marginal_model(r, newton_iters=12)
        model = compile_logp(ir_m, ncp=False)
        vlg = jax.jit(jax.vmap(jax.value_and_grad(model.logp)))
        q = jnp.zeros((8, model.size), jnp.float32)
        t0 = time.time()
        v, g = jax.block_until_ready(vlg(q))
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(10):
            v, g = jax.block_until_ready(vlg(q))
        per = (time.time() - t0) / 10
        lp = float(v[0])
        if ref_logp is None:
            ref_logp = lp
        print(json.dumps({"block": blk, "compile_s": round(compile_s, 2),
                          "per_call_s": round(per, 4), "logp0": lp,
                          "dlogp_vs_first": lp - ref_logp}), flush=True)


if __name__ == "__main__":
    main()

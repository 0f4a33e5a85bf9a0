"""Tiny chunked NUTS run on sv_marginal at T=5000: measures per-chunk
wall at max_tree_depth=6 / chunk_iters=5 so the full longt row can be
sized under the axon multi-minute-call watchdog."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    t_len = 5000
    import jax

    from exmc_tpu import marginal
    from exmc_tpu.benchmarks.suite import sv_model
    from exmc_tpu.compiler import compile_logp
    from exmc_tpu.nuts.sampler import _make_sampler

    print(f"device: {jax.devices()[0]}", flush=True)
    marginal._BLOCK = 1024
    r = np.asarray(sv_model(t=t_len).nodes["r_obs"].op[2])
    ir_m = marginal.sv_marginal_model(r, newton_iters=12)
    model = compile_logp(ir_m, ncp=False)

    sampler = _make_sampler(model, num_warmup=20, num_samples=20,
                            max_tree_depth=6)
    t0 = time.time()
    sampler.run_chunked(num_chains=8, seed=0, chunk_iters=5)
    first = time.time() - t0
    t0 = time.time()
    trace, stats = sampler.run_chunked(num_chains=8, seed=1, chunk_iters=5)
    warm = time.time() - t0
    print(json.dumps({"compile_plus_first_40it_s": round(first, 2),
                      "warm_40it_s": round(warm, 2),
                      "per_iter_warm_s": round(warm / 40, 3),
                      "mean_depth": float(np.asarray(
                          stats["tree_depth"], np.float64).mean())
                      if "tree_depth" in stats else None,
                      "sigma_mean": float(trace["sigma"].mean())}),
          flush=True)


if __name__ == "__main__":
    main()

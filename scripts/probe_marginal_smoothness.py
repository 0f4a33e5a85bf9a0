"""Smoothness probe for the Laplace-marginal logZ surface (D-T39).

NUTS on ``sv_marginal_model`` at T=5000 is a TWO-dimensional sampling
problem, yet the first on-chip runs crawled at min-ESS ~5 per 600
draws (LONGT.json f32 rows: max R-hat 3.19, then 2.11 with pooled
adaptation + INLA-seeded inits). For a 2-d posterior that is not a
geometry problem — it is a SURFACE problem: accumulated rounding
across the ~70 length-5000 tridiagonal scans behind every density
evaluation leaves logZ(sigma, nu) microscopically jagged, and NUTS
responds to the jitter, not the posterior.

This probe measures the jitter directly: logZ along a fine sigma
transect (+-1 INLA sd around the mode, nu fixed at its posterior
mean), summarized by the standard deviation of THIRD differences —
for a smooth function d3 ~ h^3 |f'''| ~ 1e-7 at this spacing, so
anything larger is numerical noise.

Measured (2026-08-20, T=5000, 192/201 points, newton_iters=12):

    CPU f32:  d3 std 0.156      (25 Newton iters: 0.155 — NOT truncation)
    CPU f64:  d3 std 7.6e-08
    TPU f32:  d3 std 0.157      (same as CPU f32 — accumulation, not
              the TPU's approximate transcendental/reciprocal units)
    TPU f64:  d3 std 8.7e-08    (f64 is software-emulated on TPU but
              the scans are LATENCY-bound: logZ+grad measured 138 ms
              vs 165 ms for the f32 version — emulation is free here)

Usage: python scripts/probe_marginal_smoothness.py [--x64] [--cpu]
           [--t 5000] [--iters 12]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--t", type=int, default=5000)
    p.add_argument("--iters", type=int, default=12)
    p.add_argument("--x64", action="store_true")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.x64:
        os.environ["EXMC_TPU_X64"] = "1"
    import numpy as np
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from exmc_tpu.benchmarks.suite import sv_model
    from exmc_tpu.config import default_dtype
    from exmc_tpu.marginal import _sv_loglik, make_grw_marginal

    dt = default_dtype()
    r = np.asarray(sv_model(t=args.t).nodes["r_obs"].op[2])
    marg = make_grw_marginal(_sv_loglik(r), len(r),
                             newton_iters=args.iters)
    # +-1 INLA sd around the T=5000 posterior mode (LONGT.json)
    sig = np.linspace(0.0233 - 0.0026, 0.0233 + 0.0026, 192)
    f = jax.jit(jax.vmap(
        lambda s: marg(s, {"nu": jnp.asarray(10.872, dt)})[0]))
    lz = []
    t0 = time.time()
    # 64-point batches: one full-width call at T=5000 kernel-faulted
    # the axon worker (same bound as sv_inla's grid_batch)
    for i in range(0, len(sig), 64):
        lz.append(np.asarray(f(jnp.asarray(sig[i:i + 64], dt))))
    lz = np.concatenate(lz)
    wall = time.time() - t0
    d3 = float(np.std(np.diff(lz, 3)))
    print(json.dumps({
        "platform": jax.devices()[0].platform,
        "dtype": dt.__name__,
        "T": args.t,
        "newton_iters": args.iters,
        "wall_s": round(wall, 1),
        "logZ_min": round(float(lz.min()), 2),
        "logZ_max": round(float(lz.max()), 2),
        "d3_std": d3,
        "smooth": bool(d3 < 1e-4),
    }), flush=True)


if __name__ == "__main__":
    main()

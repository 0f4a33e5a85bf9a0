"""Hardware-utilization evidence (round-5 VERDICT item 2): how far from
the chip's roof does the sampling scan run, and which roof governs?

Two rows, two roofs:

* eight_schools (d=10, 1024 chains): the headline workload. Per-leapfrog
  useful FLOPs are counted from XLA's own cost analysis of the
  value-and-grad program; achieved FLOP/s = leapfrogs/s x FLOPs/leapfrog.
  This workload is LATENCY-bound (VPU-sized states, sequential scan) —
  the meaningful metrics are transitions/s against the scan-latency
  floor and the chain-count knee (capacity curve), not MXU %%.

* dense-mass MVN (d=256, 1024 chains): an MXU-shaped workload — every
  leapfrog multiplies the dense inverse-mass (256x256) into 1024
  momenta (2 x 1024 x 256^2 FLOPs per halfstep pair). Achieved TFLOP/s
  vs the v5e peak shows what the framework reaches when the model HAS
  the FLOPs.

Also captures one jax.profiler trace of the warm eight_schools run
(profiles/r05_trace) and appends 4096/8192-chain rows to the capacity
curve. Writes UTILIZATION.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# v5e single-chip peaks (public figures: 197 bf16 TFLOP/s, 819 GB/s HBM)
PEAK_BF16_TFLOPS = 197.0
PEAK_HBM_GBS = 819.0


def vag_flops_eight_schools():
    """XLA cost analysis of one value-and-grad evaluation (d=10)."""
    from bench import eight_schools_ir
    from exmc_tpu.compiler import compile_logp

    model = compile_logp(eight_schools_ir())
    d = model.size
    q = jnp.zeros((d,), jnp.float32)
    compiled = jax.jit(model.value_and_grad).lower(q).compile()
    try:
        flops = float(compiled.cost_analysis()["flops"])
    except Exception:
        flops = float("nan")
    return flops, d


def eight_schools_row():
    from bench import eight_schools_ir
    from exmc_tpu.nuts.sampler import _make_sampler

    chains, warm, draws = 1024, 200, 500
    s = _make_sampler(eight_schools_ir(), num_warmup=warm,
                      num_samples=draws, pooled_adaptation=True)
    s.run(num_chains=chains, seed=0)  # compile/AOT-load + warm
    t0 = time.time()
    trace, stats = s.run(num_chains=chains, seed=1)
    wall = time.time() - t0
    if os.environ.get("EXMC_UTIL_TRACE"):
        # separate profiled run: tracing inflates wall ~14x (78 s vs
        # 5.5 s measured), so it must never share a run with timing
        trace_dir = os.path.join(ROOT, "profiles", "r05_trace")
        os.makedirs(trace_dir, exist_ok=True)
        with jax.profiler.trace(trace_dir):
            s.run(num_chains=chains, seed=1)

    flops_vag, d = vag_flops_eight_schools()
    # post-warmup leapfrogs are counted exactly; warmup transitions run
    # the same kernel for warm/draws of the iterations — scale by the
    # per-iteration mean (depth schedule differs slightly; honest
    # estimate, labeled as such)
    steps_draws = float(np.asarray(stats["n_steps"], np.float64).sum())
    steps_total_est = steps_draws * (warm + draws) / draws
    # leapfrog = 1 vag + ~10d elementwise (two half-kicks, drift,
    # kinetic); tree bookkeeping adds ~6d per merge — excluded (floor)
    flops_leap = flops_vag + 10 * d
    achieved = steps_total_est * flops_leap / wall
    return {
        "model": "eight_schools d=10",
        "chains": chains,
        "wall_s": round(wall, 2),
        "leapfrogs_total_est": int(steps_total_est),
        "leapfrogs_per_s": round(steps_total_est / wall, 0),
        "flops_per_leapfrog_vag_xla": flops_vag,
        "achieved_gflops": round(achieved / 1e9, 2),
        "pct_of_bf16_peak": round(achieved / (PEAK_BF16_TFLOPS * 1e12)
                                  * 100, 5),
        "transitions_per_s": round(chains * (warm + draws) / wall, 0),
        "note": ("latency-bound: 40 KB of chain state, VPU-sized ops, "
                 "sequential scan — the roof is scan-step latency, "
                 "not FLOPs; see capacity knee"),
    }


def dense_mvn_row():
    """MXU-shaped workload: dense-mass NUTS on a d=256 correlated MVN."""
    from exmc_tpu import Builder, dists
    from exmc_tpu.nuts.sampler import _make_sampler

    # sized to stay well under the axon worker's single-call watchdog:
    # the 1024-chain x 200-iter variant kernel-faulted the worker
    # (same failure mode as the T=5000 INLA grid, marginal.py notes)
    d, chains, warm, draws = 256, 512, 50, 100
    rng = np.random.default_rng(0)
    A = rng.normal(size=(d, d)) / np.sqrt(d)
    cov = (A @ A.T + np.eye(d)).astype(np.float32)
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "x", dists.MvNormal,
                    {"mu": np.zeros(d, np.float32), "cov": cov},
                    shape=(d,))
    s = _make_sampler(ir, num_warmup=warm, num_samples=draws,
                      dense_mass=True, max_tree_depth=8)
    s.run(num_chains=chains, seed=0)
    t0 = time.time()
    trace, stats = s.run(num_chains=chains, seed=1)
    wall = time.time() - t0
    steps_draws = float(np.asarray(stats["n_steps"], np.float64).sum())
    steps_total_est = steps_draws * (warm + draws) / draws
    # per leapfrog per chain: velocity = Minv @ p (2 d^2 FLOPs) + vag
    # (MVN logp grad: prec @ x, another 2 d^2) -> 4 d^2 useful FLOPs
    flops_leap = 4.0 * d * d
    achieved = steps_total_est * flops_leap / wall
    return {
        "model": f"dense-mass MVN d={d}",
        "chains": chains,
        "wall_s": round(wall, 2),
        "leapfrogs_total_est": int(steps_total_est),
        "leapfrogs_per_s": round(steps_total_est / wall, 0),
        "flops_per_leapfrog_analytic": flops_leap,
        "achieved_tflops": round(achieved / 1e12, 3),
        "pct_of_bf16_peak": round(achieved / (PEAK_BF16_TFLOPS * 1e12)
                                  * 100, 2),
        "note": ("f32 matmul precision=highest (PPL correctness "
                 "default, ~6 bf16 MXU passes per f32 product): the "
                 "f32-effective roof is ~PEAK/6"),
    }


def capacity_extension():
    from bench import eight_schools_ir
    from exmc_tpu.diagnostics import ess
    from exmc_tpu.nuts.sampler import _make_sampler

    rows = []
    for c in (4096, 8192):
        # each count in a try/except: the 8192-chain single call is
        # KNOWN to kernel-fault the axon worker (single-call ceiling,
        # recorded in UTILIZATION.json) — one crashing count must not
        # discard the measured rows or the artifacts (review finding)
        try:
            s = _make_sampler(eight_schools_ir(), num_warmup=200,
                              num_samples=500, pooled_adaptation=True)
            s.run(num_chains=c, seed=0)
            t0 = time.time()
            trace, stats = s.run(num_chains=c, seed=1)
            wall = time.time() - t0
            e = float(ess(trace["mu"]))
            row = {
                "chains": c,
                "wall_s": round(wall, 2),
                "draws_per_s": round(c * 500 / wall, 0),
                "ess_per_s": round(e / wall, 0),
                "mu": round(float(trace["mu"].mean()), 2),
            }
        except Exception as exc:
            row = {"chains": c, "error": type(exc).__name__,
                   "note": (str(exc).splitlines() or [""])[0][:160]}
        rows.append(row)
        print(json.dumps(row), flush=True)
        if "error" in row:
            break  # a worker crash poisons the backend for this process
    cap_path = os.path.join(ROOT, "CAPACITY.json")
    cap = json.load(open(cap_path))
    # fresh measurements REPLACE stale same-chain-count rows
    fresh = {r["chains"]: r for r in rows if "error" not in r}
    cap = [r for r in cap if r["chains"] not in fresh]
    cap.extend(fresh.values())
    cap.sort(key=lambda r: r["chains"])
    json.dump(cap, open(cap_path, "w"), indent=1)
    return rows


def main():
    out = {}
    for key, fn in (("eight_schools", eight_schools_row),
                    ("dense_mvn", dense_mvn_row),
                    ("capacity_extension", capacity_extension)):
        try:
            out[key] = fn()
        except Exception as exc:  # partial results still get written
            out[key] = {"error": type(exc).__name__,
                        "note": (str(exc).splitlines() or [""])[0][:160]}
        print(json.dumps(out[key]), flush=True)
    with open(os.path.join(ROOT, "UTILIZATION.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote UTILIZATION.json")


if __name__ == "__main__":
    main()

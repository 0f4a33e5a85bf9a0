"""Long-T state-space scaling benchmark (VERDICT r1 task 7; reference
docs/STATE_SPACE_MODELS.md:20-31 documents the recipe but benchmarks
only T=100).

Runs the stochastic-volatility model at T in {100, 1000, 5000} and the
GRW+Normal Kalman-validated model at T in {1000, 5000} on the current
backend (real TPU by default), recording wall, min-ESS/s and capacity.
Writes LONGT.json.

Usage: python scripts/longt_bench.py [--chains 8] [--seeds 1]
"""

import argparse
import json
import os
import signal
import sys
import time

# `timeout`-style SIGTERM must run `finally` blocks (the checkpoint
# sidecar's cumulative wall is written there); the default handler
# kills the process without unwinding
signal.signal(signal.SIGTERM, lambda *_: sys.exit(143))

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--chains", type=int, default=8)
    parser.add_argument("--warmup", type=int, default=500)
    parser.add_argument("--samples", type=int, default=500)
    parser.add_argument("--chunk", type=int, default=250)
    parser.add_argument("--out", default="LONGT.json")
    parser.add_argument("--cases", default=None,
                        help="comma-separated kind:T filters, e.g. "
                             "'sv_marginal:5000' (default: all)")
    parser.add_argument("--cpu", action="store_true",
                        help="force the CPU backend (tunnel-down runs)")
    parser.add_argument("--quick", action="store_true",
                        help="coarser INLA grid / fewer Newton iters "
                             "(single-core CPU validation)")
    parser.add_argument("--treedepth", type=int, default=None,
                        help="max_tree_depth for the sv_marginal row "
                             "(depth 6 bounds the worst warmup iteration "
                             "to 63 leapfrogs ~ 10 s at T=5000 — the axon "
                             "watchdog kills multi-minute device calls)")
    parser.add_argument("--x64", action="store_true",
                        help="run everything in float64 (sets EXMC_TPU_X64 "
                             "before JAX import). The sv_marginal row NEEDS "
                             "this: f32 accumulation across the T=5000 "
                             "tridiagonal/Newton scans leaves ~0.16-nat "
                             "third-difference noise on the logZ transect "
                             "(f64: 7.6e-8) — rough enough that 2-d NUTS "
                             "stalls at min-ESS ~5 per 600 draws (D-T39)")
    parser.add_argument("--checkpoint", default=None,
                        help="path prefix for crash-resumable sv_marginal "
                             "sampling: run_chunked checkpoints after every "
                             "chunk and an OUTER retry loop relaunches this "
                             "script after an axon worker crash (the dead "
                             "backend poisons the process); the INLA grid "
                             "and cumulative wall persist in a sidecar")
    args = parser.parse_args()

    if args.x64:
        # before ANY jax import: exmc_tpu.config reads the env at import
        # and flips jax_enable_x64 (a no-op once a backend exists)
        os.environ["EXMC_TPU_X64"] = "1"

    if args.cpu:
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")

    import jax

    from exmc_tpu import Builder, dists
    from exmc_tpu.benchmarks.suite import sv_model
    from exmc_tpu.diagnostics import ess, rhat
    from exmc_tpu.nuts.sampler import _make_sampler

    def grw_model(t, seed=31):
        rng = np.random.default_rng(seed)
        q, r = 0.1, 0.5
        x_true = np.cumsum(rng.normal(0.0, q, size=t))
        ys = (x_true + rng.normal(0.0, r, size=t)).astype(np.float32)
        ir = Builder.new_ir()
        ir = Builder.rv(ir, "x", dists.GaussianRandomWalk, {"sigma": q},
                        shape=(t,))
        ir = Builder.rv(ir, "y", dists.Normal, {"mu": "x", "sigma": r},
                        shape=(t,))
        ir = Builder.obs(ir, "y_obs", "y", ys)
        return ir

    rows = []
    cases = [
        ("sv", 100), ("sv", 1000), ("sv", 5000),
        ("grw", 1000), ("grw", 5000),
        ("sv_marginal", 5000),
    ]
    if args.cases:
        want = {tuple(c.split(":")) for c in args.cases.split(",")}
        cases = [(k, t) for k, t in cases if (k, str(t)) in want]
    # partial runs merge into the existing file instead of clobbering it
    prior_rows = []
    if args.cases and os.path.exists(args.out):
        with open(args.out) as f:
            prior = json.load(f)
        run_keys = {(k, t) for k, t in cases}
        prior_rows = [r for r in prior.get("rows", [])
                      if (r["model"], r["T"]) not in run_keys]
    for kind, t in cases:
        if kind == "sv_marginal":
            # VERDICT r3 item 3: the T=5000 SV answer in the measured
            # record. The latent path is MARGINALIZED by the O(T)
            # Laplace approximation (marginal.py tridiagonal scans);
            # NUTS samples only (sigma, nu). Accuracy is asserted
            # against the INLA grid (same approximation, quadrature
            # instead of MCMC) — the full-path run at this T needed
            # 26 min and still had max R-hat 1.68 (row above).
            from exmc_tpu.marginal import sv_inla, sv_marginal_model

            r = np.asarray(sv_model(t=t).nodes["r_obs"].op[2])
            meta_path = (args.checkpoint + ".meta.json"
                         if args.checkpoint else None)
            meta = {"wall_s": 0.0, "attempts": 0}
            if meta_path and os.path.exists(meta_path):
                with open(meta_path) as f:
                    meta = json.load(f)
            # quick mode (single-core CPU validation): coarser INLA
            # reference grid + fewer Newton iterations — accuracy
            # z-scores compare MEANS against the grid's sds, which a
            # 20x20 geomspace grid resolves fine
            if "inla" in meta:
                inla = meta["inla"]
            elif args.quick:
                inla = sv_inla(r, sigma_grid=np.geomspace(0.002, 0.2, 20),
                               nu_grid=np.geomspace(2.0, 80.0, 20),
                               newton_iters=12)
            else:
                # grid_batch bounds each device call: the full
                # 1600-point single call at T=5000 kernel-faulted the
                # axon worker (followup3 log, 2026-08-19)
                inla = sv_inla(r, grid_batch=64)
            if meta_path and "inla" not in meta:
                meta["inla"] = {k: float(inla[k]) for k in
                                ("sigma_mean", "sigma_sd",
                                 "nu_mean", "nu_sd")}
                meta["inla"]["n_failed"] = int(inla.get("n_failed", 0))
                with open(meta_path, "w") as f:
                    json.dump(meta, f)
            ir_m = sv_marginal_model(r, newton_iters=12)
            skw = {}
            if args.treedepth:
                skw["max_tree_depth"] = args.treedepth
            # pooled_adaptation: with overdispersed inits the
            # between-chain spread enters the merged Welford window-1
            # variance, so the metric starts near the posterior scale
            # even before individual chains traverse it. Guards against
            # the frozen-metric feedback seen in the pre-D-T38 on-chip
            # run (bf16 default corrupted the 2x2 scan algebra ->
            # jagged logZ -> eps collapsed to 2e-3 -> Welford saw
            # frozen chains -> M^-1 locked 7-15x too small; CPU f32
            # at T=1200 mixes at eps ~0.9/depth 2.2 with either
            # setting, pooled slightly better).
            sampler = _make_sampler(ir_m, ncp=False,
                                    num_warmup=args.warmup,
                                    num_samples=args.samples,
                                    pooled_adaptation=True, **skw)
            # Overdispersed inits from the INLA marginals (lognormal
            # jitter, 2x the grid sd). Stan-style box inits land at
            # sigma ~ e^{+-2}, where the 12-iteration Newton solve has
            # NOT converged — the spurious logZ surface there collapses
            # the step size to ~1e-5 and freezes all 8 chains (longt7
            # log, 2026-08-19: max R-hat 21563 at 300+300). Warm
            # starting hyperparameters from a cheap grid approximation
            # is the standard INLA-within-MCMC recipe; 2-sd dispersion
            # preserves R-hat's init-diversity requirement.
            init_arr = None
            if np.isfinite([inla[k] for k in ("sigma_mean", "sigma_sd",
                                              "nu_mean", "nu_sd")]).all():
                rng_i = np.random.default_rng(2024)
                z = rng_i.normal(size=(args.chains, 2))
                # cap the log-space jitter at +-1 (a factor of e): with
                # a coarse grid the delta-method sd can exceed the mean
                # and an uncapped 2-sd draw lands at nu ~ 300
                ls_sd = min(inla["sigma_sd"] / inla["sigma_mean"], 0.5)
                ln_sd = min(inla["nu_sd"] / inla["nu_mean"], 0.5)
                init_arr = np.stack([
                    sampler.model.unconstrain({
                        "sigma": inla["sigma_mean"]
                        * np.exp(np.clip(2.0 * z[i, 0], -2, 2) * ls_sd),
                        "nu": inla["nu_mean"]
                        * np.exp(np.clip(2.0 * z[i, 1], -2, 2) * ln_sd),
                    }) for i in range(args.chains)
                ]).astype(np.float32)

            def go_m(seed, ckpt=None):
                # tightly chunked: one vmapped logp+grad at T=5000 is
                # 0.165 s (probe_marginal_block.py — latency-bound in
                # the 12 Newton scans, block size barely moves it), so
                # a depth-6 iteration is <= 63 leapfrogs ~ 10 s and a
                # 5-iteration chunk stays under the axon watchdog that
                # killed the chunk-50 attempt (followup5, 2026-08-19)
                kw = {}
                if ckpt:
                    kw["checkpoint_path"] = ckpt
                    if os.path.exists(ckpt):
                        kw["resume_from"] = ckpt
                return sampler.run_chunked(num_chains=args.chains,
                                           seed=seed, init=init_arr,
                                           chunk_iters=min(args.chunk, 5),
                                           **kw)

            if args.checkpoint:
                # crash-resumable single measured pass: the axon worker
                # dies sporadically on this program (longt6 log), so
                # wall accumulates across process relaunches in the
                # sidecar (try/finally runs on the crash exception) and
                # run_chunked resumes bit-identically from the .npz
                meta["attempts"] += 1
                t0 = time.time()
                try:
                    trace, stats = go_m(1, ckpt=args.checkpoint + ".npz")
                finally:
                    meta["wall_s"] += time.time() - t0
                    with open(meta_path, "w") as f:
                        json.dump(meta, f)
                wall = meta["wall_s"]
                compile_s = None
            else:
                t0 = time.time()
                go_m(0)
                compile_s = time.time() - t0
                t0 = time.time()
                trace, stats = go_m(1)
                wall = time.time() - t0
            ess_vals = [float(ess(trace[k])) for k in ("sigma", "nu")]
            rhat_vals = [float(rhat(trace[k])) for k in ("sigma", "nu")]
            sig_mean = float(trace["sigma"].mean())
            nu_mean = float(trace["nu"].mean())
            d_sig = abs(sig_mean - inla["sigma_mean"]) / inla["sigma_sd"]
            d_nu = abs(nu_mean - inla["nu_mean"]) / inla["nu_sd"]
            row = {
                "model": kind, "T": t, "d": 2,
                "chains": args.chains, "wall_s": round(wall, 2),
                "compile_s": (None if compile_s is None
                              else round(compile_s, 2)),
                "min_ess": round(min(ess_vals), 1),
                "min_ess_per_s": round(min(ess_vals) / wall, 2),
                "max_rhat": round(max(rhat_vals), 4),
                "divergence_rate": float(stats["divergences"].sum())
                / (args.chains * args.samples),
                "sigma_mean": round(sig_mean, 5),
                "nu_mean": round(nu_mean, 3),
                "inla_sigma_mean": round(inla["sigma_mean"], 5),
                "inla_sigma_sd": round(inla["sigma_sd"], 5),
                "inla_nu_mean": round(inla["nu_mean"], 3),
                "inla_nu_sd": round(inla["nu_sd"], 3),
                "accuracy_z_sigma": round(d_sig, 3),
                "accuracy_z_nu": round(d_nu, 3),
                "accuracy_pass": bool(d_sig < 3.0 and d_nu < 3.0),
            }
            if args.x64:
                row["dtype"] = "float64"
                row["note_precision"] = (
                    "f64 run (D-T39): f32 leaves ~0.16-nat third-difference "
                    "noise on the logZ transect (TPU and CPU alike; Newton "
                    "truncation ruled out at 12 vs 25 iters) -> DA shrinks "
                    "eps into the noise floor and the watchdog-bounded "
                    "depth-6 trees starve mixing (f32 chip rows: max R-hat "
                    "3.19 plain / 2.11 pooled+INLA-seeded, min-ESS ~5). "
                    "f64 transect d3 7.6e-8 (CPU) / 8.7e-8 (TPU); the "
                    "scans are latency-bound so emulated f64 logZ+grad "
                    "costs 138 ms vs 165 ms f32")
            if args.checkpoint:
                row["attempts"] = meta["attempts"]
                row["note"] = ("crash-resumable run: wall_s is cumulative "
                               "across worker-crash relaunches incl. "
                               "service compile (checkpointed chunks, "
                               "bit-identical resume)")
            rows.append(row)
            print(json.dumps(row), flush=True)
            continue
        ir = sv_model(t=t) if kind == "sv" else grw_model(t)
        ncp = kind == "sv"
        # SV rows run with ASIS interweaving (nuts/interweave.py): the
        # innovation scale is eligible, and at long T the (z, sigma)
        # ridge makes it load-bearing (with ensemble rescue it takes
        # T=5000 from 4/8 frozen chains to all-healthy)
        sampler = _make_sampler(ir, ncp=ncp, num_warmup=args.warmup,
                                num_samples=args.samples,
                                interweave=(kind == "sv"))

        def go(seed):
            return sampler.run_chunked(num_chains=args.chains, seed=seed,
                                       chunk_iters=args.chunk)

        t0 = time.time()
        go(0)
        compile_s = time.time() - t0
        t0 = time.time()
        trace, stats = go(1)
        wall = time.time() - t0

        # min/median ESS over a representative subset of latent coords
        # (all coords at T=5000 would dominate the wall with FFTs)
        key = "s" if kind == "sv" else "x"
        idx = np.unique(np.linspace(0, t - 1, 25).astype(int))
        ess_vals, rhat_vals = [], []
        for i in idx:
            x = trace[key][:, :, i]
            ess_vals.append(float(ess(x)))
            rhat_vals.append(float(rhat(x)))
        for extra in ("sigma", "nu"):
            if extra in trace:
                ess_vals.append(float(ess(trace[extra][:, :, 0]
                                          if trace[extra].ndim == 3
                                          else trace[extra])))
        row = {
            "model": kind, "T": t, "d": t + (2 if kind == "sv" else 0),
            "chains": args.chains, "wall_s": round(wall, 2),
            "compile_s": round(compile_s, 2),
            "min_ess": round(min(ess_vals), 1),
            "min_ess_per_s": round(min(ess_vals) / wall, 2),
            "max_rhat": round(max(rhat_vals), 4),
            "divergence_rate": float(stats["divergences"].sum())
            / (args.chains * args.samples),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    out = {"platform": jax.devices()[0].platform,
           "device": str(jax.devices()[0]),
           "protocol": f"{args.warmup}+{args.samples}, {args.chains} chains,"
                       f" chunked {args.chunk}",
           "rows": prior_rows + rows}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"-> {args.out}")


if __name__ == "__main__":
    main()

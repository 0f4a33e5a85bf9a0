"""Run the seven-model suite on the real chip and write
BENCH_SUITE.json + BENCH_SUITE_AUTO.md (the reference's
STANDARD_BENCHMARKS race protocol adapted to vmapped chains).
BENCHMARKS.md is the hand-curated results document — this script never
overwrites it."""

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from exmc_tpu.benchmarks.suite import MODELS, REFERENCE_ESS_PER_S, run_model

CHAINS = {
    "simple": 256, "medium": 256, "stress": 256, "eight_schools": 256,
    "funnel": 128, "logistic": 128, "sv": 64,
}
# After the vectorized U-turn checks all seven models complete 2000
# iterations in one device call within watchdog limits at ta=0.8.
# Round 3 chunked eight_schools because its ta=0.995 recipe ran deep
# trees for minutes and crashed the tunnel's TPU worker twice; the
# round-4 gibbs_scales recipe runs depth ~3 trees (see EXTRA_OPTS), so
# the bound is gone — run_one's error path still retries chunked.
CHUNKED = {}

# the reference pipeline applies automatic NCP by default; only
# eight_schools runs centered "deliberately, because the centered
# version is the harder test" (STANDARD_BENCHMARKS.md §II). Round 4:
# the hierarchical trio runs CENTERED + NUTS-within-Gibbs instead —
# same posteriors, conditional-Gaussian trajectories (see EXTRA_OPTS).
NCP = {name: name not in ("eight_schools", "medium", "stress")
       for name in MODELS}

# per-model sampler overrides from the round-2 adaptation-quality study
# (VERDICT r1 task 6, measured on-chip at 256 chains, 1000+1000):
# hierarchical models at target_accept 0.95 cut divergences 10-30x AND
# raise min-ESS/s (medium: 46 -> 1008; worst param is the hierarchical
# scale, which needs small steps): eight_schools centered
# ta=0.8 div 2.9% rhat 1.035 -> ta=0.95 div 1.1% rhat 1.025 at equal
# ESS/s. See BENCHMARKS.md adaptation-study table.
EXTRA_OPTS = {
    # medium/stress, round 4: centered + NUTS-within-Gibbs, same
    # machinery as eight_schools below — tau frozen (conditional given
    # tau is Gaussian), both ASIS legs move it, analytic conditional
    # metric with the SAMPLED obs noise read from the current point.
    # The SAMPLED obs noise sigma_y is frozen too, with its own
    # scaled-inv-chi^2 Gibbs group (D-T28 correction: the conditional
    # metric reads sigma_y, so it must not move in the trajectory).
    # Measured (32 chains, 500+800, 3 seeds each, CPU): divergences 0
    # on every seed, max R-hat <= 1.005, min-ESS 5.3-7.9k per 25.6k
    # draws (vs NCP ta=.95 baselines 4.3k/5.4k), warm wall 4-5 s on one
    # CPU core. Round 3's medium caveat (suff-leg-only interweave
    # collapsed mu on a seed at J=2) does not recur: the ancillary
    # regression leg anchors tau to the data, and 3/3 seeds are clean.
    "medium": {"target_accept": 0.8, "interweave": True,
               "gibbs_scales": True},
    "stress": {"target_accept": 0.8, "interweave": True,
               "gibbs_scales": True},
    # centered 8sch, round 4: NUTS-within-Gibbs (VERDICT r3 item 2).
    # gibbs_scales freezes tau in the trajectory (the conditional given
    # tau is GAUSSIAN — no funnel), the two ASIS Gibbs legs move tau
    # (ancillary leg = exact truncated-Gaussian regression draw), and
    # the analytic conditional metric (1/tau^2 + sum 1/s^2) keeps the
    # integrator stable at small tau. Measured (64 chains, 500+1000,
    # CPU, vs 2-d quadrature): divergence rate 1.38% -> 0.0, max R-hat
    # 1.004, tau ESS 45%/draw (was ~3%), mean depth 3.3, moments exact
    # (tau 3.268 vs 3.284 quadrature). Replaces round 3's
    # 1000+3000 ta=.995 recipe (R-hat 1.010, div 1.41%, 242 s/seed —
    # history in git). Still "the harder test": the PATH stays
    # centered; tau's Gibbs moves are exact MCMC on the same posterior.
    "eight_schools": {"target_accept": 0.8, "interweave": True,
                      "gibbs_scales": True},
    # ASIS interweaving: the innovation scale is eligible and the
    # T=100 low-sigma trap mode (2/5 seeds pre-rescue) dissolves
    "sv": {"interweave": True},
}


def run_one(name, chunked=None):
    kw = dict(num_chains=CHAINS[name], num_warmup=1000, num_samples=1000,
              seed=0, ncp=NCP[name], chunked=chunked, seeds=5)
    kw.update(EXTRA_OPTS.get(name, {}))
    try:
        return run_model(name, **kw)
    except Exception as e:  # noqa
        # tunnel instability / watchdog: retry once in bounded calls.
        # NOTE: if the TPU worker itself crashed, this retry ALSO fails —
        # the backend is dead for the rest of the process; the parent's
        # per-model subprocess isolation is what actually recovers.
        print(f"  retrying {name} chunked after: {e}", flush=True)
        try:
            return run_model(name, **dict(kw, chunked=chunked or 500))
        except Exception as e2:  # noqa
            return {"model": name, "error": str(e2)}


def main():
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    if "--child" in sys.argv:
        # single-model worker: last stdout line is the result JSON
        r = run_one(argv[0], chunked=CHUNKED.get(argv[0]))
        print("RESULT " + json.dumps(r, default=float), flush=True)
        return

    models = argv or list(MODELS)
    # merge with prior results so partial re-runs don't clobber the table
    results = {}
    if os.path.exists("BENCH_SUITE.json"):
        with open("BENCH_SUITE.json") as f:
            results = json.load(f)
    for name in models:
        print(f"=== {name} ===", flush=True)
        # each model runs in its own subprocess: a TPU worker crash
        # (UNAVAILABLE) kills the backend for the whole client process,
        # so without isolation one crash poisons every later model
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), name, "--child"],
            capture_output=True, text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        r = {"model": name, "error": f"child died rc={proc.returncode}: "
             f"{proc.stderr[-300:]}"}
        for line in proc.stdout.splitlines():
            if line.startswith("RESULT "):
                r = json.loads(line[len("RESULT "):])
            else:
                print(line, flush=True)
        if "error" in r and "error" not in results.get(name, {"error": 1}):
            # never clobber a good prior row with a tunnel failure
            print(f"  keeping prior row for {name} after: {r['error'][:80]}",
                  flush=True)
            continue
        results[name] = r
        print(json.dumps(r, default=float), flush=True)

    with open("BENCH_SUITE.json", "w") as f:
        json.dump(results, f, indent=1, default=float)

    lines = [
        "# BENCHMARKS — seven-model suite on one TPU v5e chip",
        "",
        "Protocol: 1000 warmup + 1000 draws per chain, vmapped chains per",
        "the table, per-chain adaptation, max_depth 10, 5-seed MEDIANS",
        "(the reference race protocol, STANDARD_BENCHMARKS.md:105).",
        "Wall time excludes compile (reported separately); min-ESS/s is the",
        "worst parameter, matching the reference's metric",
        "(STANDARD_BENCHMARKS.md:105).",
        "",
        "| model | chains | wall s | compile s | min-ESS/s | vs eXMC | vs PyMC | max R-hat | div rate |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for name, r in results.items():
        if "error" in r:
            lines.append(f"| {name} | - | ERROR: {r['error'][:60]} |")
            continue
        lines.append(
            f"| {name} | {r['num_chains']} | {r['wall_s']:.1f} | "
            f"{r.get('compile_s', float('nan')):.0f} | "
            f"{r['min_ess_per_s']:.1f} | "
            f"{r['vs_exmc']:.0f}x | {r['vs_pymc']:.0f}x | "
            f"{r['max_rhat']:.3f} | {r['divergence_rate']:.4f} |"
        )
    ref = ", ".join(
        f"{k}: eXMC {v[0]}/PyMC {v[1]}" for k, v in REFERENCE_ESS_PER_S.items()
    )
    lines += ["", f"Reference ESS/s baselines (88-thread Xeon): {ref}", ""]
    with open("BENCH_SUITE_AUTO.md", "w") as f:
        f.write("\n".join(lines))
    print("wrote BENCH_SUITE.json + BENCH_SUITE_AUTO.md")


if __name__ == "__main__":
    main()

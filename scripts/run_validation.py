"""Run the full 30-model gold-standard battery and write VALIDATION.md.

Usage:
    python scripts/run_validation.py [--platform cpu|tpu] [--out VALIDATION.md]

Default platform is cpu (8 virtual devices): the battery checks sampler
CORRECTNESS, which is platform-independent (same XLA program, different
backend); TPU runs add hours of remote-compile latency across 30
programs. Pass --platform tpu to reproduce on the chip.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

parser = argparse.ArgumentParser()
parser.add_argument("--platform", default="cpu", choices=["cpu", "tpu"])
parser.add_argument("--out", default="VALIDATION.md")
parser.add_argument("--json", dest="json_out", default="VALIDATION.json")
args = parser.parse_args()

if args.platform == "cpu":
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
else:
    import jax

from exmc_tpu.benchmarks.validation import validate  # noqa: E402

INVARIANCE_SECTION = """\
## Exact kernel invariance (round 5, VERDICT r4 item 3)

Sharper than SBC: chains start at EXACT target samples, take K=8 NUTS
transitions, and the final states must still be exactly
target-distributed (`tests/test_exact_invariance.py`). Statistics per
target: per-dim KS vs the exact marginal CDF, whitened radius² KS vs
chi²(d) (the capped-weight bug class detector), and a fixed linear
functional's KS — each on R=4 disjoint-seed replicates of N=8192
chains, Stouffer-combined (a real bias reproduces per replicate and
grows √R; an isolated fluke dilutes), Holm-controlled at family
α=0.005. Measured combined p-values (8-device CPU mesh, f32):

| target | per-dim KS | radius² χ² | functional | accept |
|---|---|---|---|---|
| N(0, I₄), eps 0.7 | 0.13 / 0.40 / 0.21 / 0.018 | 0.17 | 0.18 | 0.926 |
| equicorrelated ρ=0.8 (d=3), eps 0.35 | 0.89 / 0.77 / 0.76 | 0.086 | 0.78 | 0.938 |

Negative controls (must REJECT through the same machinery): 15%
marginal sd inflation and 10% radial mode-shrink both reject
decisively — the battery's sensitivity floor. A single-replicate
seed-lottery note: 1 of 16 seeds examined while building the test
produced a 3.2σ excursion (per-dim KS p=4e-5) with 15 clean seeds
pooling to z=1.7 — i.e. no kernel bias; the replicate combination
makes the shipped test robust to exactly this.

Matched-RNG lockstep vs the C++ oracle
(`test_native_tree.py::test_matched_rng_lockstep_tree_shape`): the XLA
kernel's key-split discipline is mirrored on the host to extract its
momentum draw + per-doubling direction bits; those directions are
FORCED into the recursive C++ oracle (new `exmc_build_full_tree_dirs`
entry point) on chains precomputed at the same step size. Tree shape —
depth, leapfrog count, divergence flag — is a deterministic function
of geometry + directions, and matches EXACTLY on 300/300 trials (mean
accept agrees to <5e-4), so any inner/outer U-turn-check or
merge-termination discrepancy between the two formulations is caught
deterministically, not statistically.
"""

t0 = time.time()
n_pass, results = validate()
wall = time.time() - t0

lines = [
    "# VALIDATION — gold-standard posterior results",
    "",
    "Pass criteria per the reference's posteriordb harness",
    "(benchmark/posteriordb/README.md:17-23): every parameter mean within",
    "0.5 reference SD and SD ratio within [0.5, 2.0].",
    "",
    f"Battery: {len(results)} models — 6 round-1 cores + the round-2/3",
    "expansions (exmc_tpu/benchmarks/gold_models.py). Targets are EXACT:",
    "conjugate/analytic moments, 1e-10 quadrature for scalar-parameter",
    "models, and Kalman/RTS smoothing for the T=1000 GaussianRandomWalk —",
    "stronger per-model than posteriordb's reference MCMC draws. Coverage:",
    "all 28 distributions (incl. the round-3 Binomial /",
    "NegativeBinomial / Categorical / Multinomial / ZeroSumNormal /",
    "LKJCholesky / Flat additions), ordered/zero-sum/cholesky-corr",
    "constrained types,",
    "meas_obs matmul/affine Jacobians,",
    "right+interval censoring, dense mass matrix, simplex",
    "(stick-breaking), auto-NCP funnel, long-T latent paths, and 3 models",
    "built through the Stan frontend.",
    "",
    "Round-5 additions (VERDICT r4 item 7, posteriordb class breadth):",
    "a CROSSED-random-effects LMM at real scale (d=54, exact via the",
    "balanced-design ANOVA eigendecomposition + rank-2 Woodbury",
    "conditionals), a logistic-binomial GLMM on the REAL AV-TEST",
    "detection counts (exact shared-t-grid quadrature), and an ordinal",
    "regression with free ordered cutpoints on the REAL Kilpisjärvi",
    "summers (exact 3-d grid) — real-data rows now 4.",
    "",
    f"Protocol: 1000+1000, 4 chains, seed 42, platform={args.platform}"
    f" ({jax.devices()[0].platform}), wall {wall:.0f}s.",
    "",
    f"## Result: {n_pass}/{len(results)} PASS",
    "",
    "| model | pass | divergences | div rate | max R-hat |",
    "|---|---|---|---|---|",
]
for r in results:
    lines.append(
        f"| {r['model']} | {'PASS' if r['pass'] else 'FAIL'} | "
        f"{r['divergences']} | {r['divergence_rate']:.2g} | "
        f"{r['max_rhat']} |"
    )
lines.append("")
# standing section: the kernel-level exactness evidence (maintained
# here so battery regeneration preserves it; results are from the
# deterministic-seed tests, re-run via pytest)
lines.append(INVARIANCE_SECTION.rstrip())
lines.append("")
lines.append("### Per-parameter detail")
lines.append("")
for r in results:
    lines.append(f"#### {r['model']}: {'PASS' if r['pass'] else 'FAIL'} "
                 f"(divergences {r['divergences']}, max R-hat {r['max_rhat']})")
    for p, d in r["params"].items():
        def fmt(v):
            a = [v] if not isinstance(v, list) else v
            if len(a) > 4:
                return f"[{a[0]:.4g}, {a[1]:.4g}, ... x{len(a)}]"
            return "[" + ", ".join(f"{x:.4g}" for x in a) + "]"
        lines.append(
            f"- {p}: mean {fmt(d['mean'])} (ref {fmt(d['ref_mean'])}), "
            f"sd {fmt(d['sd'])} (ref {fmt(d['ref_sd'])}) -> "
            f"{'ok' if d['pass'] else 'FAIL'}"
        )
    lines.append("")

with open(args.out, "w") as f:
    f.write("\n".join(lines))
with open(args.json_out, "w") as f:
    json.dump({"n_pass": n_pass, "n_total": len(results),
               "platform": args.platform, "wall_s": round(wall, 1),
               "results": results}, f, indent=1, default=str)
print(f"\n{n_pass}/{len(results)} PASS -> {args.out}")
sys.exit(0 if n_pass == len(results) else 1)

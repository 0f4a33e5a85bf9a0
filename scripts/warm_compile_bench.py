"""Measure WARM first-call latency per suite model and merge
``compile_s_warm`` into BENCH_SUITE.json.

Each model runs in a fresh subprocess (so nothing is jit-cached in
process memory) with the persistent XLA compilation cache active.
Protocol: TWO warm child runs per model — the first guarantees the
cache holds executables for the CURRENT source tree (any edit that
changes the traced program invalidates entries, like ccache), the
second is the measurement. Both are recorded because the residual
warm latency is dominated by the remote-compile/device-load service,
whose variance on a byte-identical, fully-cached program was measured
at 6.4 s vs 161.8 s (154/154 persistent-cache hits in both runs; the
157.8 s gap sits AFTER the final cache hit — see BENCHMARKS.md
"Compile latency and the persistent cache"). The reference amortized
dispatch; we amortize compilation (reference
lib/exmc/nuts/tree.ex:30-35, DECISIONS D39/D40) — the device-load leg
belongs to the service, not the client.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def child(name):
    from run_suite_bench import CHAINS, CHUNKED, EXTRA_OPTS, NCP

    from exmc_tpu.benchmarks.suite import run_model

    kw = dict(num_chains=CHAINS[name], num_warmup=1000, num_samples=1000,
              seed=0, ncp=NCP[name], chunked=CHUNKED.get(name), seeds=1)
    kw.update(EXTRA_OPTS.get(name, {}))
    t0 = time.time()
    r = run_model(name, **kw)
    print("RESULT " + json.dumps(
        {"model": name, "compile_s_warm": r["compile_s"],
         "wall_s": r["wall_s"], "total_s": time.time() - t0,
         "max_rhat": r["max_rhat"]}), flush=True)


def run_child(name):
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), name, "--child"],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    lines = [l for l in proc.stdout.splitlines() if l.startswith("RESULT ")]
    if not lines:
        print(f"  FAILED: {proc.stderr[-2000:]}", flush=True)
        return None
    return json.loads(lines[-1][len("RESULT "):])


def main():
    if "--child" in sys.argv:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        child(sys.argv[1])
        return

    from exmc_tpu.benchmarks.suite import MODELS

    models = [a for a in sys.argv[1:] if not a.startswith("--")] or list(MODELS)
    with open("BENCH_SUITE.json") as f:
        results = json.load(f)
    for name in models:
        print(f"=== {name} (populate) ===", flush=True)
        r1 = run_child(name)
        if r1 is None:
            continue
        print(f"  {r1}", flush=True)
        print(f"=== {name} (warm measure) ===", flush=True)
        r2 = run_child(name)
        if r2 is None:
            continue
        print(f"  {r2}", flush=True)
        if name in results and "error" not in results[name]:
            results[name]["compile_s_warm"] = r2["compile_s_warm"]
            results[name]["compile_s_warm_runs"] = [
                r1["compile_s_warm"], r2["compile_s_warm"]]
        with open("BENCH_SUITE.json", "w") as f:
            json.dump(results, f, indent=1)
    print("merged compile_s_warm into BENCH_SUITE.json", flush=True)


if __name__ == "__main__":
    main()

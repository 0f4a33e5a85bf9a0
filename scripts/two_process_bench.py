"""Two-process distributed-sampling overhead row (VERDICT r3 item 6).

Times the SAME sharded sampling job two ways on localhost CPU:

  A. one process, 4 virtual devices, dp=4 mesh  (baseline)
  B. two Gloo-clustered processes x 2 virtual devices each, the same
     4-device dp mesh spanning both (the reference's 2-node
     sample_chains analogue, distributed.ex:56-101)

The delta is the multi-process tax: jax.distributed init + cross-
process collectives + the host-gather of results. Like the rest of
MULTICHIP_BENCH.json this is an OVERHEAD BOUND, not a speedup claim —
both variants share one physical CPU; on real hardware each process
adds chips. Merges a "two_process_sampling" entry into
MULTICHIP_BENCH.json.

Usage: python scripts/two_process_bench.py [--chains N]
"""

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "MULTICHIP_BENCH.json")

WORKER = """
import os, sys, time
os.environ["TF_CPP_MIN_LOG_LEVEL"] = "3"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=%(devs)d").strip()
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, %(root)r)

mode = sys.argv[1]
if mode == "multi":
    from exmc_tpu.parallel.distributed import initialize_distributed
    pid = int(sys.argv[2])
    ok = initialize_distributed("127.0.0.1:47674",
                                num_processes=2, process_id=pid)
    assert ok and jax.process_count() == 2

import numpy as np
from exmc_tpu import Builder, dists
from exmc_tpu.parallel import make_mesh, sample_chains_sharded

ys = np.array([2.1, 1.8, 2.5, 2.0, 1.9, 2.3])
ir = Builder.new_ir()
ir = Builder.rv(ir, "mu", dists.Normal, {"mu": 0.0, "sigma": 5.0})
ir = Builder.rv(ir, "sigma", dists.HalfNormal, {"sigma": 2.0})
ir = Builder.rv(ir, "x", dists.Normal, {"mu": "mu", "sigma": "sigma"})
ir = Builder.obs(ir, "x_obs", "x", ys)

mesh = make_mesh(4, dp=4, sp=1)
t0 = time.time()
trace, stats = sample_chains_sharded(
    ir, %(chains)d, mesh, seed=0, num_warmup=300, num_samples=300,
    max_tree_depth=8)
compile_and_run = time.time() - t0
t0 = time.time()
trace, stats = sample_chains_sharded(
    ir, %(chains)d, mesh, seed=1, num_warmup=300, num_samples=300,
    max_tree_depth=8)
warm = time.time() - t0
mu = float(np.asarray(trace["mu"]).mean())
assert abs(mu - 2.1) < 0.3, mu
assert np.asarray(stats["chain_ok"]).all()
print("ROW", json.dumps({"cold_s": round(compile_and_run, 3),
                         "warm_s": round(warm, 3),
                         "mu_mean": round(mu, 4)}))
import json
"""


def run_single(chains):
    code = WORKER % {"devs": 4, "root": ROOT, "chains": chains}
    code = "import json\n" + code
    proc = subprocess.run([sys.executable, "-c", code, "single"],
                          capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    row = [ln for ln in proc.stdout.splitlines() if ln.startswith("ROW")][0]
    return json.loads(row[4:])


def run_multi(chains):
    code = WORKER % {"devs": 2, "root": ROOT, "chains": chains}
    code = "import json\n" + code
    procs = [subprocess.Popen([sys.executable, "-c", code, "multi", str(i)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for i in (0, 1)]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]
    rows = []
    for out in outs:
        row = [ln for ln in out.splitlines() if ln.startswith("ROW")][0]
        rows.append(json.loads(row[4:]))
    assert rows[0]["mu_mean"] == rows[1]["mu_mean"]  # same gathered result
    return {"cold_s": max(r["cold_s"] for r in rows),
            "warm_s": max(r["warm_s"] for r in rows),
            "mu_mean": rows[0]["mu_mean"]}


def main():
    chains = 16
    if "--chains" in sys.argv:
        chains = int(sys.argv[sys.argv.index("--chains") + 1])
    t0 = time.time()
    single = run_single(chains)
    multi = run_multi(chains)
    entry = {
        "protocol": f"{chains} chains, 300+300, dp=4 mesh; single = one "
                    "process x 4 virtual devices, multi = 2 Gloo "
                    "processes x 2 devices (same mesh); warm = second "
                    "call, cached executable; localhost CPU — read as "
                    "the multi-process TAX, both variants share one "
                    "physical CPU",
        "single_process": single,
        "two_process": multi,
        "warm_overhead_pct": round(
            100.0 * (multi["warm_s"] / single["warm_s"] - 1.0), 1),
        "wall_s_total": round(time.time() - t0, 1),
    }
    data = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            data = json.load(f)
    data["two_process_sampling"] = entry
    with open(OUT, "w") as f:
        json.dump(data, f, indent=1)
    print(json.dumps(entry, indent=1))
    print(f"merged into {OUT}")


if __name__ == "__main__":
    main()

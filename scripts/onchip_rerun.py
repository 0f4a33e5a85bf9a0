"""One-command on-chip re-measurement fleet (round 4).

Probes the axon backend (child process, killable), then runs every
tunnel-gated benchmark in priority order, each in its own subprocess
with a bound, logging pass/fail. Safe to re-run: each script merges or
overwrites only its own artifact.

Usage: python scripts/onchip_rerun.py [--skip-probe]
"""

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

# (label, argv, timeout_s)
JOBS = [
    ("headline bench (superchain + nested R-hat)",
     [sys.executable, "bench.py"], 3600),
    ("suite (new hierarchical-trio recipe)",
     [sys.executable, "scripts/run_suite_bench.py"], 14400),
    ("longt (adds sv_marginal:5000)",
     [sys.executable, "scripts/longt_bench.py"], 7200),
    ("SBC_r04 (R=512/1024, 6 models)",
     [sys.executable, "scripts/sbc_evidence.py"], 10800),
    ("AOT executable serialization probe",
     [sys.executable, "scripts/aot_serialize_bench.py"], 3600),
    ("ChEES/SNAPER/MEADS vs NUTS lockstep dividend (D-T29/30/31)",
     [sys.executable, "scripts/chees_bench.py"], 7200),
    ("validation battery (48 golds)",
     [sys.executable, "scripts/run_validation.py"], 7200),
]


def main():
    if "--skip-probe" not in sys.argv:
        from bench import _wait_for_backend

        ok, info = _wait_for_backend()
        print(f"backend probe: ok={ok} ({info})", flush=True)
        if not ok:
            print("tunnel still down — nothing run", flush=True)
            return 1
    log = []
    for label, argv, bound in JOBS:
        print(f"=== {label}", flush=True)
        t0 = time.time()
        try:
            proc = subprocess.run(argv, cwd=ROOT, timeout=bound)
            rc = proc.returncode
        except subprocess.TimeoutExpired:
            rc = "timeout"
        row = {"job": label, "rc": rc, "wall_s": round(time.time() - t0, 1)}
        log.append(row)
        print(json.dumps(row), flush=True)
    with open(os.path.join(ROOT, "ONCHIP_RERUN.json"), "w") as f:
        json.dump(log, f, indent=1)
    print("wrote ONCHIP_RERUN.json", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Round-end test-suite artifact (round-5 VERDICT item 8): run the full
non-slow suite and record counts + wall + environment in TESTS_r{N}.json,
so suite-green is an artifact, not a claim.

Usage: python scripts/run_tests_artifact.py [round_number]
"""

import json
import os
import re
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "-q",
         "-m", "not slow", "-rs", "--durations=10"],
        cwd=ROOT, capture_output=True, text=True,
    )
    wall = time.time() - t0
    out = proc.stdout + proc.stderr
    tail = "\n".join(out.strip().splitlines()[-40:])

    # token-pair parse of the summary line: robust to any combination
    # and order of passed/failed/skipped/xfailed/xpassed/error tokens
    # (the fixed-order regex dropped counts exactly when something
    # unusual happened — review finding)
    counts = {}
    summary = ""
    for line in out.splitlines():
        if re.search(r"\bin [0-9.]+s", line) and re.search(
                r"\d+ (passed|failed|skipped|deselected|xfailed|"
                r"xpassed|error)", line):
            summary = line
    for n, tok in re.findall(
            r"(\d+) (passed|failed|skipped|deselected|xfailed|"
            r"xpassed|errors?)", summary):
        counts[tok.rstrip("s") if tok.startswith("error") else tok] = int(n)
    m = re.search(r"\bin ([0-9.]+)s", summary)
    if m:
        counts["pytest_wall_s"] = float(m.group(1))
    skip_reasons = re.findall(r"^SKIPPED \[\d+\] (.+)$", out, re.M)

    import jax

    artifact = {
        "round": rnd,
        "rc": proc.returncode,
        "wall_s": round(wall, 1),
        "counts": counts,
        "skip_reasons": sorted(set(skip_reasons)),
        "platform": "cpu (8 virtual devices, tests/conftest.py)",
        "host_cores": os.cpu_count(),
        "jax": jax.__version__,
        "tail": tail if proc.returncode != 0 else tail.splitlines()[-1],
    }
    path = os.path.join(ROOT, f"TESTS_r{rnd:02d}.json")
    with open(path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps({k: artifact[k] for k in
                      ("rc", "wall_s", "counts")}))
    print(f"wrote {path}")
    sys.exit(proc.returncode)


if __name__ == "__main__":
    main()

"""AOT executable serialization vs the axon service's executable-load
wall (VERDICT r3 item 5; TODO #3).

Round-3 localization: the JAX persistent compile cache is hit-for-hit
warm, yet a byte-identical fully-cached program still pays 5 s->580 s
of first-call latency on the axon backend — the service's EXECUTABLE
LOAD leg. Question: does shipping a serialized COMPILED executable
(jax.experimental.serialize_executable: pickles the loaded XLA
executable, skipping compile entirely on reload) also skip that leg,
or does the service re-load the executable either way?

Protocol (per model, all timed):
  cold process A:  lower+compile, first call, serialize -> .bin
  warm process B:  deserialize_and_load, first call   <- the measurement
  warm process C:  ordinary jit with persistent cache  <- the control

Usage: python scripts/aot_serialize_bench.py [--cpu] [--child MODE NAME]
Writes AOT_SERIALIZE.json.

MEASURED (CPU, 2026-08-18): the XLA:CPU client CANNOT serialize these
executables at all — ``serialize_executable`` raises
``UNIMPLEMENTED: `LessThan` is not serializable`` on any program with
comparisons (i.e. every NUTS pipeline). The experiment is therefore
TPU-only; run it when the tunnel is up. If the axon client raises the
same UNIMPLEMENTED, that is the D-T negative result: no client-side
serialization path exists around the service's executable-load leg.
"""

import json
import os
import pickle
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "AOT_SERIALIZE.json"
BIN_DIR = "/tmp/exmc_aot"

MODELS = ["simple", "eight_schools"]


def _build(name, num_chains=64):
    import jax
    import jax.numpy as jnp

    from exmc_tpu.benchmarks.suite import build_model
    from exmc_tpu.nuts.sampler import _make_sampler
    from exmc_tpu.config import default_dtype

    ncp = name != "eight_schools"
    sampler = _make_sampler(build_model(name), ncp=ncp, num_warmup=200,
                            num_samples=200)
    d = sampler.model.size
    dtype = default_dtype()
    base = jax.random.PRNGKey(0)
    keys = jax.vmap(lambda i: jax.random.fold_in(base, i * 7919))(
        jnp.arange(num_chains))
    q = jnp.zeros((num_chains, d), dtype) + 0.1
    ws_eps = jnp.ones((num_chains,), dtype)
    ws_inv = jnp.ones((num_chains, d), dtype)
    args = (None, q, keys, ws_eps, ws_inv)
    jitted = jax.jit(sampler._run,
                     static_argnames=("num_chains", "warm_started"))
    return jitted, args, dict(num_chains=num_chains, warm_started=False)


def child(mode, name):
    import jax

    t_import = time.time()
    jitted, args, kw = _build(name)
    t_build = time.time()
    path = os.path.join(BIN_DIR, f"{name}.bin")

    if mode == "serialize":
        lowered = jitted.lower(*args, **kw)
        t_lower = time.time()
        compiled = lowered.compile()
        t_compile = time.time()
        out = compiled(*args)
        jax.block_until_ready(out)
        t_first = time.time()
        from jax.experimental.serialize_executable import serialize

        payload, in_tree, out_tree = serialize(compiled)
        os.makedirs(BIN_DIR, exist_ok=True)
        with open(path, "wb") as f:
            pickle.dump((payload, in_tree, out_tree), f)
        row = {"build_s": round(t_build - t_import, 2),
               "lower_s": round(t_lower - t_build, 2),
               "compile_s": round(t_compile - t_lower, 2),
               "first_call_s": round(t_first - t_compile, 2),
               "bin_mb": round(os.path.getsize(path) / 1e6, 2)}
    elif mode == "deserialize":
        from jax.experimental.serialize_executable import (
            deserialize_and_load,
        )

        with open(path, "rb") as f:
            payload, in_tree, out_tree = pickle.load(f)
        t_read = time.time()
        compiled = deserialize_and_load(payload, in_tree, out_tree)
        t_load = time.time()
        out = compiled(*args)
        jax.block_until_ready(out)
        t_first = time.time()
        row = {"build_s": round(t_build - t_import, 2),
               "read_s": round(t_read - t_build, 2),
               "deserialize_s": round(t_load - t_read, 2),
               "first_call_s": round(t_first - t_load, 2)}
    else:  # control: ordinary jit, persistent cache warm
        out = jitted(*args, **kw)
        jax.block_until_ready(out)
        t_first = time.time()
        row = {"build_s": round(t_build - t_import, 2),
               "jit_first_call_s": round(t_first - t_build, 2)}
    print("RESULT " + json.dumps(row), flush=True)


def main():
    if "--child" in sys.argv:
        i = sys.argv.index("--child")
        mode, name = sys.argv[i + 1], sys.argv[i + 2]
        if "--cpu" in sys.argv:
            import jax

            jax.config.update("jax_platforms", "cpu")
        child(mode, name)
        return

    cpu = ["--cpu"] if "--cpu" in sys.argv else []
    results = {}
    for name in MODELS:
        results[name] = {}
        for mode in ("serialize", "deserialize", "control"):
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--child", mode, name] + cpu,
                capture_output=True, text=True, timeout=1800,
            )
            row = {"error": f"rc={proc.returncode}: {proc.stderr[-300:]}"}
            for line in proc.stdout.splitlines():
                if line.startswith("RESULT "):
                    row = json.loads(line[len("RESULT "):])
            results[name][mode] = row
            print(name, mode, json.dumps(row), flush=True)
    import jax

    results["platform"] = "cpu" if cpu else jax.devices()[0].platform
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()

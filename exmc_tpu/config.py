"""Global configuration for exmc_tpu.

The reference exposes backend/precision knobs via application env
(reference jit.ex:61-99, DECISIONS D53: f64 on EXLA-CPU, f32 on
EMLX/Vulkan). On TPU the native compute dtype is float32; float64 is
available on CPU for golden-path validation by setting EXMC_TPU_X64=1
(which flips ``jax_enable_x64``) before importing JAX arrays.

All f32 numeric-hygiene lessons from the reference apply here
(DECISIONS D53/D54/D55): log-transform clamps, scale floors, and
overflow-safe logit identities — see exmc_tpu.transforms / exmc_tpu.math.
"""

import os

import jax
import jax.numpy as jnp

_X64 = os.environ.get("EXMC_TPU_X64", "0") == "1"
if _X64:  # pragma: no cover - env-dependent
    jax.config.update("jax_enable_x64", True)


# On TPU, f32 jnp.matmul/@/dot_general default to bfloat16 MXU passes
# (8-bit mantissa). That is the right trade for NN workloads; for a PPL
# it is not: log-density algebra feeds accept/reject decisions and
# iterated recurrences compound the truncation. Measured failure
# (2026-08-19, on chip): the T=5000 Laplace-marginal INLA grid came
# back degenerate (sigma_sd 4e-5, 705/1600 grid points non-finite)
# purely from bf16 2x2 Möbius products, while the identical f32
# program on CPU matched truth to 0.8 sd. Dense-mass leapfrog, CHEES
# rotations, Pathfinder L-BFGS algebra and GLM linear predictors all
# run through the same default. No exmc workload has an MXU-bound
# matmul where bf16's throughput would pay, so the framework defaults
# to full-f32 matmuls everywhere; override via env for A/B checks.
_MM_PREC = os.environ.get("EXMC_TPU_MATMUL_PRECISION", "highest")
if _MM_PREC not in ("", "default"):
    jax.config.update("jax_default_matmul_precision", _MM_PREC)


# ---------------------------------------------------------------------------
# Persistent XLA compilation cache.
#
# The reference's deepest perf lesson is amortizing compile/dispatch cost
# (reference tree.ex:30-35, DECISIONS D39/D40: ~250us per JIT dispatch drove
# the whole speculative-buffer design). The TPU build's analogue is
# first-call compile latency: a 1024-chain NUTS program takes minutes to
# compile but milliseconds to run. JAX ships a persistent on-disk cache that
# makes byte-identical programs compile-once-per-machine instead of
# once-per-process; we enable it unconditionally at import.
#
# Controls:
#   EXMC_TPU_CACHE_DIR=<path>  cache location (default ~/.cache/exmc_tpu/xla)
#   EXMC_TPU_CACHE_DIR=0       disable entirely
# ---------------------------------------------------------------------------
_CACHE_DIR = os.environ.get("EXMC_TPU_CACHE_DIR", "")
if _CACHE_DIR != "0":
    if not _CACHE_DIR:
        _CACHE_DIR = os.path.join(
            os.path.expanduser("~"), ".cache", "exmc_tpu", "xla"
        )
    try:
        os.makedirs(_CACHE_DIR, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
        # Cache every compile, however small: NUTS pipelines re-jit many
        # small helper programs (unpack, diagnostics) whose aggregate
        # first-call cost is noticeable on the remote-compile backend.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # pragma: no cover - read-only FS etc.
        _CACHE_DIR = ""


def compilation_cache_dir():
    """Active persistent-cache directory, or '' if disabled."""
    return _CACHE_DIR


def program_tunables():
    """Module-level globals that alter TRACED PROGRAMS without passing
    through any function signature. Every entry must ride the AOT
    executable-cache key (sampler._aot_key_parts): a fast-key hit never
    re-lowers, so a tunable missing here would silently serve an
    executable compiled under a different value. Keep this list in
    lockstep with any new call-time-resolved global."""
    from exmc_tpu import marginal

    return (("marginal._BLOCK", marginal._BLOCK),
            ("matmul_precision", _MM_PREC))


def host_cpu_tag():
    """Short fingerprint of the host CPU's ISA feature set (Linux:
    the /proc/cpuinfo flags line; elsewhere the machine/processor
    strings)."""
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha256(line.encode()).hexdigest()[:8]
    except OSError:
        pass
    import platform as _platform

    key = _platform.machine() + "|" + _platform.processor()
    return hashlib.sha256(key.encode()).hexdigest()[:8]


def retarget_cache_for_cpu():
    """Point the persistent compile cache at a host-tagged subdir.

    XLA:CPU persistent entries embed AOT-compiled machine code; an
    entry written on a machine with a wider ISA (e.g. avx512) can
    SIGILL on a narrower one (cpu_aot_loader.cc warns exactly this
    when loading a foreign entry). Deliberate CPU-backend runs
    (tests/conftest.py, __graft_entry__ dryruns) call this after
    switching jax_platforms so each host reads only its own CPU
    binaries; the TPU cache (service-compiled, machine-independent)
    stays shared at the parent dir.

    Note: cpu_aot_loader.cc still logs a feature-mismatch error for
    +prefer-no-scatter/+prefer-no-gather on every reload -- those are
    XLA-internal tuning pseudo-features absent from cpuid, so the
    loader flags them even for blobs compiled on this same machine
    (verified: fresh dir, compile, reload => same log). Benign."""
    global _CACHE_DIR
    if not _CACHE_DIR:
        return
    base = _CACHE_DIR
    tag = "cpu-" + host_cpu_tag()
    if os.path.basename(base) == tag:
        return
    d = os.path.join(base, tag)
    try:
        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        # the compilation-cache singleton latches its directory on
        # first use; if anything compiled before the retarget (e.g. a
        # TPU entry()-check preceding a CPU dryrun) the config update
        # alone would be a silent no-op for the live cache
        from jax._src import compilation_cache as _cc

        _cc.reset_cache()
        _CACHE_DIR = d
    except Exception:  # pragma: no cover - read-only FS etc.
        pass


def aot_cache_dir():
    """Directory for serialized compiled EXECUTABLES, or None (D-T35).

    Beyond the compile cache above: on the remote-compile TPU service a
    warm compile cache still pays the executable-LOAD leg (tens of
    seconds to minutes per program); ``exmc_tpu.aot`` pickles the
    loaded executable and restores it in <1 s (AOT_SERIALIZE.json).
    Default: on for TPU backends, off elsewhere (the XLA:CPU client
    cannot serialize executables — measured UNIMPLEMENTED).

    Controls:
      EXMC_AOT_CACHE=<path>  cache location (overrides the default)
      EXMC_AOT_CACHE=0       disable
    """
    env = os.environ.get("EXMC_AOT_CACHE")
    if env is not None:
        if env in ("", "0", "off"):
            return None
        return env
    try:
        platform = jax.default_backend()
    except Exception:  # pragma: no cover - backend init failure
        return None
    if platform == "tpu":
        return os.path.join(
            os.path.expanduser("~"), ".cache", "exmc_tpu", "aot")
    return None


def x64_enabled() -> bool:
    return jax.config.jax_enable_x64


def default_dtype():
    """Default floating dtype for flat vectors / compiled log-densities."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


# Scale parameters are floored at this value so that badly-scaled warmup
# points never divide by zero (reference DECISIONS D55; dist modules floor
# sigma at 1e-30, e.g. reference normal.ex:15-24).
SCALE_FLOOR = 1e-30

# Clamp for the exp/log constraint transform: exp(20) ~ 4.9e8 stays finite
# in f32; f64 allows a much wider range (reference transform.ex:15-29, D54).
def log_transform_clamp():
    return 200.0 if x64_enabled() else 20.0


# Divergence threshold on the joint-logp drop at a tree leaf
# (reference tree.ex:1040-1048, D26: divergence iff delta_joint < -1000).
DIVERGENCE_THRESHOLD = 1000.0


def backend_info():
    """Runtime backend report (the analogue of the reference's
    Exmc.JIT backend auto-detection, jit.ex:127-134 — on JAX the
    platform is already unified; this is observability only)."""
    devices = jax.devices()
    return {
        "platform": jax.default_backend(),
        "num_devices": len(devices),
        "devices": [str(d) for d in devices],
        "x64": x64_enabled(),
        "default_dtype": str(default_dtype().__name__
                             if hasattr(default_dtype(), "__name__")
                             else default_dtype()),
    }

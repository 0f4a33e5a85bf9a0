"""ctypes bindings for the native C++ tree builder
(native/exmc_tree/tree.cpp — the counterpart of the reference's Rust NIF
wrapper, nuts/native_tree.ex:18-76, with the same graceful-skip contract
as its ``skip_compilation?`` guard: if g++ or the build is unavailable,
``available()`` returns False and callers fall back to the XLA kernel).
"""

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_SRC = Path(__file__).resolve().parents[2] / "native" / "exmc_tree" / "tree.cpp"
_BUILD_DIR = Path(__file__).resolve().parents[2] / "native" / "build"
_LIB_PATH = _BUILD_DIR / "libexmc_tree.so"

_lib = None
_load_error = None


def _build():
    _BUILD_DIR.mkdir(parents=True, exist_ok=True)
    subprocess.run(
        ["g++", "-O2", "-shared", "-fPIC", "-o", str(_LIB_PATH), str(_SRC)],
        check=True,
        capture_output=True,
    )


def _load():
    global _lib, _load_error
    if _lib is not None or _load_error is not None:
        return _lib
    try:
        if not _LIB_PATH.exists() or _LIB_PATH.stat().st_mtime < _SRC.stat().st_mtime:
            _build()
        lib = ctypes.CDLL(str(_LIB_PATH))
        fn = lib.exmc_build_full_tree
        dp = ctypes.POINTER(ctypes.c_double)
        ip = ctypes.POINTER(ctypes.c_int)
        fn.argtypes = [
            dp, dp, ctypes.c_double,          # q0, p0, logp0
            dp, dp, dp, ctypes.c_int,          # fwd chain
            dp, dp, dp, ctypes.c_int,          # bwd chain
            ctypes.c_int, dp, ctypes.c_int,    # d, inv_mass, max_depth
            ctypes.c_double, ctypes.c_uint64,  # div threshold, seed
            ip, ip, ip, ip, dp,                # outputs
        ]
        fn.restype = ctypes.c_int
        fn2 = lib.exmc_build_full_tree_dirs
        fn2.argtypes = [
            dp, dp, ctypes.c_double,           # q0, p0, logp0
            dp, dp, dp, ctypes.c_int,          # fwd chain
            dp, dp, dp, ctypes.c_int,          # bwd chain
            ctypes.c_int, dp, ctypes.c_int,    # d, inv_mass, max_depth
            ctypes.c_double, ctypes.c_uint64,  # div threshold, seed
            ip,                                # forced dirs (+1/-1)
            ip, ip, ip, ip, dp,                # outputs
        ]
        fn2.restype = ctypes.c_int
        _lib = lib
    except Exception as e:  # pragma: no cover - toolchain-dependent
        _load_error = e
    return _lib


def available() -> bool:
    return _load() is not None


def _cptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def build_full_tree(q0, p0, logp0, fwd, bwd, inv_mass, max_depth=10,
                    divergence_threshold=1000.0, seed=0, dirs=None):
    """Build a NUTS tree from precomputed leapfrog chains.

    ``fwd``/``bwd``: tuples (q[n,d], p[n,d], logp[n]) of forward/backward
    chains from the initial point (same contract as the reference NIF,
    native_tree.ex:36-76). CONVENTION: the backward chain is the leapfrog
    integration with step -eps, so its stored momenta stay oriented in
    FORWARD time (matching the signed-eps convention of the XLA kernel,
    exmc_tpu/nuts/tree.py) — rho sums and U-turn dot products mix
    momenta from both chains and require one consistent orientation.

    ``dirs``: optional per-doubling directions (+1/-1, length >=
    max_depth) replacing the internal PRNG's coin flips — the
    matched-RNG lockstep hook (tree SHAPE is deterministic given
    geometry + directions; see test_native_tree.py lockstep tests).

    Returns dict(selected, depth, n_leapfrog, diverging, accept_prob);
    ``selected`` is a signed step index."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native tree unavailable: {_load_error}")
    q0 = np.ascontiguousarray(q0, np.float64)
    p0 = np.ascontiguousarray(p0, np.float64)
    qf, pf, lf = (np.ascontiguousarray(x, np.float64) for x in fwd)
    qb, pb, lb = (np.ascontiguousarray(x, np.float64) for x in bwd)
    d = q0.shape[0]
    inv_mass = np.ascontiguousarray(inv_mass, np.float64)

    sel = ctypes.c_int()
    depth = ctypes.c_int()
    n_lf = ctypes.c_int()
    div = ctypes.c_int()
    acc = ctypes.c_double()
    common = (
        _cptr(q0), _cptr(p0), ctypes.c_double(float(logp0)),
        _cptr(qf), _cptr(pf), _cptr(lf), ctypes.c_int(qf.shape[0]),
        _cptr(qb), _cptr(pb), _cptr(lb), ctypes.c_int(qb.shape[0]),
        ctypes.c_int(d), _cptr(inv_mass), ctypes.c_int(max_depth),
        ctypes.c_double(divergence_threshold), ctypes.c_uint64(seed),
    )
    outs = (
        ctypes.byref(sel), ctypes.byref(depth), ctypes.byref(n_lf),
        ctypes.byref(div), ctypes.byref(acc),
    )
    if dirs is None:
        rc = lib.exmc_build_full_tree(*common, *outs)
    else:
        dirs = np.ascontiguousarray(dirs, np.int32)
        # explicit raise (not assert: stripped under python -O, and the
        # C side reads dirs[depth] unchecked — an out-of-bounds or
        # non-±1 value is undefined behavior in native code)
        if dirs.shape[0] < max_depth or not np.all(np.abs(dirs) == 1):
            raise ValueError(
                f"dirs must have >= max_depth ({max_depth}) entries of "
                f"+1/-1; got shape {dirs.shape}")
        rc = lib.exmc_build_full_tree_dirs(
            *common, dirs.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            *outs)
    return {
        "ok": rc == 0,
        "selected": sel.value,
        "depth": depth.value,
        "n_leapfrog": n_lf.value,
        "diverging": bool(div.value),
        "accept_prob": acc.value,
    }

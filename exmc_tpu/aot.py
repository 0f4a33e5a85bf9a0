"""Persistent AOT executable cache (D-T35).

The axon TPU service loads executables slowly: a byte-identical program
with a warm persistent *compile* cache still pays tens of seconds to
minutes of first-call latency (the service's executable-load leg —
TODO #3, round-3 localization). ``jax.experimental.serialize_executable``
skips that leg entirely: the loaded XLA executable pickles to ~10 MB and
``deserialize_and_load`` restores it in under a second
(AOT_SERIALIZE.json: eight_schools 27.7 s warm jit -> 0.8 s deserialize).

This module wraps a jitted callable with a disk cache of serialized
executables. Keys cover everything that determines the compiled
program: the model/IR fingerprint, sampler options, static argument
values, dynamic argument shapes/dtypes, platform + device kind, x64
mode, and the jax version — a stale or foreign entry never matches, it
just misses. Every failure path (unreadable file, deserialize error,
UNIMPLEMENTED serialize on the CPU client) falls back to the ordinary
jit call, so the cache can never break sampling, only speed it up.

The reference's analogue is its warm-start amortization lesson
(tree.ex:30-35: dispatch/compile overheads dominate re-runs); here the
whole compiled transition is the artifact being reused.
"""

import hashlib
import os
import pickle
import threading
import warnings
from collections import OrderedDict

import jax

_MAX_ENTRIES = 64  # ~10 MB each; bound the cache dir at ~640 MB
_lock = threading.Lock()
_serialize_broken = set()  # platforms whose client cannot serialize

# In-process memo of loaded executables: repeat calls (chunked runs,
# warm-start refresh cycles, re-runs in one process) must not pay the
# disk read + deserialize (~0.7 s) per call.
_MEMO = OrderedDict()
_MEMO_MAX = 32


_code_version_cache = None


def _code_version():
    """Hash of the package's Python source, computed once per process.
    A serialized executable embodies the traced program of the code
    that built it; any source change must invalidate every persistent
    entry, or a bug fix would silently keep running the pre-fix
    algorithm from cache. (A version string would go stale between
    releases; hashing the source cannot.)"""
    global _code_version_cache
    if _code_version_cache is None:
        import exmc_tpu

        root = os.path.dirname(os.path.abspath(exmc_tpu.__file__))
        h = hashlib.sha256()
        for dirpath, dirnames, filenames in os.walk(root):
            dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
            for fn in sorted(filenames):
                if fn.endswith(".py"):
                    h.update(fn.encode())
                    with open(os.path.join(dirpath, fn), "rb") as f:
                        h.update(f.read())
        _code_version_cache = h.hexdigest()[:16]
    return _code_version_cache


def _tree_sig(x):
    """Stable string of the shapes/dtypes (not values) of a pytree."""
    leaves, treedef = jax.tree.flatten(x)
    parts = [str(treedef)]
    for leaf in leaves:
        shape = getattr(leaf, "shape", ())
        dtype = getattr(leaf, "dtype", type(leaf).__name__)
        parts.append(f"{shape}:{dtype}")
    return "|".join(parts)


def cache_key(key_material, args, static_kw):
    """sha256 hex over program identity + arg shapes + environment."""
    dev = jax.devices()[0]
    h = hashlib.sha256()
    for part in (
        jax.__version__,
        _code_version(),
        dev.platform,
        getattr(dev, "device_kind", ""),
        str(jax.config.jax_enable_x64),
        repr(key_material),
        repr(sorted(static_kw.items())),
        _tree_sig(args),
    ):
        h.update(str(part).encode())
        h.update(b"\0")
    return h.hexdigest()


def _evict(cache_dir):
    try:
        entries = sorted(
            (os.path.getmtime(os.path.join(cache_dir, f)),
             os.path.join(cache_dir, f))
            for f in os.listdir(cache_dir) if f.endswith(".bin")
        )
        for _, path in entries[: max(0, len(entries) - _MAX_ENTRIES)]:
            os.remove(path)
    except OSError:
        pass


def _load(path):
    try:
        from jax.experimental.serialize_executable import (
            deserialize_and_load,
        )

        with open(path, "rb") as f:
            payload, in_tree, out_tree = pickle.load(f)
        out = deserialize_and_load(payload, in_tree, out_tree)
        try:
            os.utime(path)  # hits refresh mtime: _evict stays LRU
        except OSError:
            pass
        return out
    except Exception as e:  # stale jax / foreign topology / bad file
        warnings.warn(
            f"aot cache entry unreadable ({type(e).__name__}: {e}); "
            "recompiling", stacklevel=3)
        try:
            os.remove(path)
        except OSError:
            pass
        return None


def _store(compiled, path):
    platform = jax.devices()[0].platform
    if platform in _serialize_broken:
        return
    try:
        from jax.experimental.serialize_executable import serialize

        payload, in_tree, out_tree = serialize(compiled)
        cache_dir = os.path.dirname(path)
        os.makedirs(cache_dir, exist_ok=True)
        tmp = f"{path}.tmp{os.getpid()}"
        with open(tmp, "wb") as f:
            pickle.dump((payload, in_tree, out_tree), f)
        os.replace(tmp, path)
        _evict(cache_dir)
    except Exception as e:
        # the XLA:CPU client raises UNIMPLEMENTED on any program with
        # comparisons (measured, aot_serialize_bench.py) — remember and
        # stop retrying this process
        _serialize_broken.add(platform)
        warnings.warn(
            f"aot executable serialization unavailable on this backend "
            f"({type(e).__name__}); falling back to plain jit",
            stacklevel=3)


def call(jitted, args, static_kw, key_material, cache_dir):
    """``jitted(*args, **static_kw)`` through the AOT executable cache.

    ``key_material``: hashable program identity (IR fingerprint,
    options, a tag for which function this is). ``static_kw`` must be
    exactly the jitted function's static arguments. Returns the call's
    outputs; on any cache failure the ordinary jit path runs instead.
    """
    if cache_dir is None:
        return jitted(*args, **static_kw)
    key = cache_key(key_material, args, static_kw)
    path = os.path.join(cache_dir, key + ".bin")
    # the lock guards ONLY the memo dict — disk reads (~0.7 s
    # deserialize) and stores (~10 MB serialize+write) run outside it
    # so concurrent samplers on other keys never queue behind I/O
    with _lock:
        compiled = _MEMO.get(key)
        if compiled is not None:
            _MEMO.move_to_end(key)
    from_disk = False
    if compiled is None and os.path.exists(path):
        compiled = _load(path)
        from_disk = compiled is not None
    if compiled is None:
        try:
            compiled = jitted.lower(*args, **static_kw).compile()
        except Exception:  # lowering quirks: never break the call
            return jitted(*args, **static_kw)
        _store(compiled, path)
    with _lock:
        _MEMO[key] = compiled
        _MEMO.move_to_end(key)
        while len(_MEMO) > _MEMO_MAX:
            _MEMO.popitem(last=False)
    try:
        return compiled(*args)
    except Exception as e:
        # an AOT executable is stricter than jit about input placement
        # (no auto-sharding); a layout/topology mismatch must degrade
        # to the ordinary jit call, never break sampling
        warnings.warn(
            f"aot executable rejected the call "
            f"({type(e).__name__}); using plain jit", stacklevel=2)
        with _lock:
            _MEMO.pop(key, None)
        if from_disk:
            try:
                os.remove(path)
            except OSError:
                pass
        return jitted(*args, **static_kw)

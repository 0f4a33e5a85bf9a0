"""Persistent AOT executable cache (D-T35).

The axon TPU service loads executables slowly: a byte-identical program
with a warm persistent *compile* cache still pays tens of seconds to
minutes of first-call latency (the service's executable-load leg —
TODO #3, round-3 localization). ``jax.experimental.serialize_executable``
skips that leg entirely: the loaded XLA executable pickles to ~10 MB and
``deserialize_and_load`` restores it in under a second
(AOT_SERIALIZE.json: eight_schools 27.7 s warm jit -> 0.8 s deserialize).

This module wraps a jitted callable with a disk cache of serialized
executables, looked up through TWO keys:

1. FAST key (``cache_key``): the model/IR fingerprint, sampler options,
   static argument values, dynamic argument shapes/dtypes, platform +
   device kind, x64 mode, jax version, and a hash of the package
   source. A hit costs one tiny ``.ref`` read + one deserialize.
2. HLO key: on a fast-key miss the program is LOWERED client-side
   (seconds) and the executable blob is addressed by a hash of the
   lowered HLO text + environment. The source hash in the fast key is
   deliberately coarse — ANY ``.py`` edit invalidates every fast key —
   but an edit that doesn't change what a program lowers to reaches
   the same HLO, so the blob still hits and the fast key is re-aliased
   to it. Measured stakes: one unrelated commit between the round-4
   store and hit passes cost a 574 s service recompile of the stress
   suite row; with the HLO level that edit costs one lowering.

Blobs live at ``<hlo_key>.bin``; fast keys are ``<fast_key>.ref``
pointer files naming the blob. Every failure path (unreadable file,
deserialize error, UNIMPLEMENTED serialize on the CPU client) falls
back to the ordinary jit call, so the cache can never break sampling,
only speed it up.

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


def _env_parts():
    """Everything about the process environment that determines whether
    a serialized executable is loadable and correct here."""
    dev = jax.devices()[0]
    return (
        jax.__version__,
        dev.platform,
        getattr(dev, "device_kind", ""),
        str(jax.config.jax_enable_x64),
    )


def cache_key(key_material, args, static_kw):
    """FAST key: sha256 hex over program identity + arg shapes +
    environment + package-source hash. Misses on any source edit; the
    HLO key below catches the edits that didn't change the program."""
    h = hashlib.sha256()
    for part in _env_parts() + (
        _code_version(),
        repr(key_material),
        repr(sorted(static_kw.items())),
        _tree_sig(args),
    ):
        h.update(str(part).encode())
        h.update(b"\0")
    return h.hexdigest()


def _hlo_key(lowered):
    """HLO key: sha256 over the lowered program text + environment —
    source-edit-insensitive (two sources that lower identically share
    the executable blob)."""
    h = hashlib.sha256()
    for part in _env_parts():
        h.update(str(part).encode())
        h.update(b"\0")
    h.update(lowered.as_text().encode())
    return h.hexdigest()


def _write_ref(ref_path, hkey):
    """Alias a fast key to an executable blob (tiny pointer file)."""
    try:
        tmp = f"{ref_path}.tmp{os.getpid()}"
        with open(tmp, "w") as f:
            f.write(hkey)
        os.replace(tmp, ref_path)
    except OSError:
        pass


def _evict(cache_dir):
    try:
        entries = sorted(
            (os.path.getmtime(os.path.join(cache_dir, f)),
             os.path.join(cache_dir, f))
            for f in os.listdir(cache_dir) if f.endswith(".bin")
        )
        for _, path in entries[: max(0, len(entries) - _MAX_ENTRIES)]:
            os.remove(path)
        # drop fast-key aliases whose blob was evicted (refs are tiny,
        # but a dangling one would cost a pointless open+miss forever)
        for f in os.listdir(cache_dir):
            if not f.endswith(".ref"):
                continue
            ref = os.path.join(cache_dir, f)
            try:
                with open(ref) as fh:
                    hkey = fh.read().strip()
            except OSError:
                continue
            if not os.path.exists(os.path.join(cache_dir, hkey + ".bin")):
                os.remove(ref)
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
    ref_path = os.path.join(cache_dir, key + ".ref")
    legacy_path = os.path.join(cache_dir, key + ".bin")
    blob_path = None
    # the lock guards ONLY the memo dict — disk reads (~0.7 s
    # deserialize) and stores (~10 MB serialize+write) run outside it
    # so concurrent samplers on other keys never queue behind I/O
    with _lock:
        compiled = _MEMO.get(key)
        if compiled is not None:
            _MEMO.move_to_end(key)
    from_disk = False
    if compiled is None and os.path.exists(ref_path):
        try:
            with open(ref_path) as f:
                candidate = os.path.join(cache_dir, f.read().strip() + ".bin")
        except OSError:
            candidate = None
        if candidate and os.path.exists(candidate):
            compiled = _load(candidate)
            blob_path = candidate
        from_disk = compiled is not None
        if compiled is None:
            try:
                os.remove(ref_path)
            except OSError:
                pass
    if compiled is None and os.path.exists(legacy_path):
        # pre-ref-scheme entry stored directly under the fast key
        compiled = _load(legacy_path)
        blob_path = legacy_path
        from_disk = compiled is not None
    if compiled is None:
        try:
            lowered = jitted.lower(*args, **static_kw)
        except Exception:  # lowering quirks: never break the call
            return jitted(*args, **static_kw)
        try:
            hkey = _hlo_key(lowered)
        except Exception:
            hkey = None
        if hkey is not None:
            blob_path = os.path.join(cache_dir, hkey + ".bin")
            if os.path.exists(blob_path):
                # second-level hit: the source changed but this program
                # didn't — re-alias the fast key instead of recompiling
                compiled = _load(blob_path)
                from_disk = compiled is not None
        if compiled is None:
            try:
                compiled = lowered.compile()
            except Exception:
                return jitted(*args, **static_kw)
            if hkey is not None:
                _store(compiled, blob_path)
        if hkey is not None and os.path.exists(blob_path):
            _write_ref(ref_path, hkey)
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
            for p in (blob_path, ref_path):
                if p is None:
                    continue
                try:
                    os.remove(p)
                except OSError:
                    pass
        return jitted(*args, **static_kw)

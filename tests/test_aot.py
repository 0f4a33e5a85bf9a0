"""AOT executable cache (exmc_tpu/aot.py, D-T35).

The XLA:CPU client cannot serialize executables (measured
UNIMPLEMENTED, aot_serialize_bench.py), so on the test backend these
exercise the key construction, the fallback paths, and the store/load
plumbing via monkeypatched serializers; the real serialize/deserialize
round trip is measured on-chip (AOT_SERIALIZE.json: eight_schools
27.7 s warm jit -> 0.8 s deserialize).
"""

import os
import pickle
import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from exmc_tpu import aot


def _jitted():
    return jax.jit(lambda x: x * 2.0 + 1.0)


def test_cache_key_stable_and_shape_sensitive():
    j = _jitted()
    a1 = (jnp.ones((3,)),)
    k1 = aot.cache_key(("tag", "sig"), a1, {})
    k2 = aot.cache_key(("tag", "sig"), (jnp.zeros((3,)),), {})
    assert k1 == k2  # values don't matter
    assert k1 != aot.cache_key(("tag", "sig"), (jnp.ones((4,)),), {})
    assert k1 != aot.cache_key(("tag", "other"), a1, {})
    assert k1 != aot.cache_key(("tag", "sig"), a1, {"n": 2})
    del j


def test_call_disabled_is_plain_jit():
    out = aot.call(_jitted(), (jnp.ones((2,)),), {}, ("t",), None)
    np.testing.assert_allclose(np.asarray(out), [3.0, 3.0])


def test_call_mismatched_executable_falls_back(tmp_path):
    """A deserialized executable that rejects the call degrades to the
    plain jit path with a warning and drops the entry. (On this CPU
    backend the deserializer binds all 8 virtual devices, so a loaded
    entry always rejects single-shard args — which makes it a natural
    permanent fixture for this fallback; on the single-chip TPU the
    round trip succeeds, AOT_SERIALIZE.json.)"""
    j = jax.jit(lambda x: jnp.where(x > 0, x, -x) * 2.0)
    args = (jnp.ones((2,)),)
    aot._serialize_broken.clear()
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = aot.call(j, args, {}, ("t1",), str(tmp_path))
        had_entry = any(
            f.endswith(".bin") for f in os.listdir(str(tmp_path)))
        aot._MEMO.clear()  # force the disk-load path, not the memo
        out2 = aot.call(j, args, {}, ("t1",), str(tmp_path))
    np.testing.assert_allclose(np.asarray(out), [2.0, 2.0])
    np.testing.assert_allclose(np.asarray(out2), [2.0, 2.0])
    if had_entry:  # loaded-then-rejected path exercised
        assert any("rejected the call" in str(x.message)
                   or "unreadable" in str(x.message) for x in w)
    aot._serialize_broken.clear()


def test_call_corrupt_entry_recompiles(tmp_path):
    j = _jitted()
    args = (jnp.ones((2,)),)
    path = os.path.join(
        str(tmp_path), aot.cache_key(("t2",), args, {}) + ".bin")
    with open(path, "wb") as f:
        f.write(b"not a pickle")
    aot._serialize_broken.clear()
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = aot.call(j, args, {}, ("t2",), str(tmp_path))
    np.testing.assert_allclose(np.asarray(out), [3.0, 3.0])
    assert any("unreadable" in str(x.message) for x in w)
    # the corrupt bytes are gone: either removed, or replaced by a
    # fresh valid entry (this trivial program serializes even on CPU)
    if os.path.exists(path):
        with open(path, "rb") as f:
            assert f.read() != b"not a pickle"
    aot._serialize_broken.clear()


def test_store_load_round_trip_with_fake_serializer(tmp_path, monkeypatch):
    """Full disk round trip with the serializer monkeypatched (the CPU
    client can't serialize real executables)."""
    import jax.experimental.serialize_executable as se

    captured = {}

    def fake_serialize(compiled):
        captured["compiled"] = compiled
        return b"payload", "in_tree", "out_tree"

    def fake_deserialize(payload, in_tree, out_tree):
        assert (payload, in_tree, out_tree) == (
            b"payload", "in_tree", "out_tree")
        return captured["compiled"]

    monkeypatch.setattr(se, "serialize", fake_serialize)
    monkeypatch.setattr(se, "deserialize_and_load", fake_deserialize)
    aot._serialize_broken.clear()

    j = _jitted()
    args = (jnp.arange(3.0),)
    out1 = aot.call(j, args, {}, ("t3",), str(tmp_path))
    files = [f for f in os.listdir(str(tmp_path)) if f.endswith(".bin")]
    assert len(files) == 1
    with open(os.path.join(str(tmp_path), files[0]), "rb") as f:
        assert pickle.load(f) == (b"payload", "in_tree", "out_tree")
    out2 = aot.call(j, args, {}, ("t3",), str(tmp_path))  # hits the file
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2))
    aot._serialize_broken.clear()


def test_source_edit_realiases_instead_of_recompiling(tmp_path,
                                                      monkeypatch):
    """Two-level lookup: a package-source change (different fast key)
    whose program lowers to the same HLO must reuse the stored blob and
    just write a new .ref alias — NOT recompile (the round-4 suite paid
    a 574 s service recompile for exactly this)."""
    import jax.experimental.serialize_executable as se

    captured = {}
    monkeypatch.setattr(se, "serialize",
                        lambda c: (captured.setdefault("c", c), b"p",
                                   "i", "o")[1:])
    monkeypatch.setattr(se, "deserialize_and_load",
                        lambda p, i, o: captured["c"])
    aot._serialize_broken.clear()
    aot._MEMO.clear()

    compiles = []
    real_lower = jax.stages.Wrapped.lower

    j = _jitted()
    args = (jnp.arange(3.0),)
    monkeypatch.setattr(aot, "_code_version", lambda: "src-v1")
    out1 = aot.call(j, args, {}, ("t4",), str(tmp_path))

    # "edit" the source: new fast key, same program
    monkeypatch.setattr(aot, "_code_version", lambda: "src-v2")
    aot._MEMO.clear()

    class CountingLowered:
        def __init__(self, inner):
            self._inner = inner

        def as_text(self):
            return self._inner.as_text()

        def compile(self):
            compiles.append(1)
            return self._inner.compile()

    monkeypatch.setattr(
        jax.stages.Wrapped, "lower",
        lambda self, *a, **k: CountingLowered(real_lower(self, *a, **k)))
    out2 = aot.call(_jitted(), args, {}, ("t4",), str(tmp_path))

    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2))
    bins = [f for f in os.listdir(str(tmp_path)) if f.endswith(".bin")]
    refs = [f for f in os.listdir(str(tmp_path)) if f.endswith(".ref")]
    assert len(bins) == 1  # one blob, shared
    assert len(refs) == 2  # both source versions alias it
    assert compiles == []  # the second call never recompiled
    aot._serialize_broken.clear()
    aot._MEMO.clear()


def test_evict_bounds_entries(tmp_path, monkeypatch):
    monkeypatch.setattr(aot, "_MAX_ENTRIES", 3)
    for i in range(6):
        p = os.path.join(str(tmp_path), f"{i}.bin")
        with open(p, "wb") as f:
            f.write(b"x")
        os.utime(p, (i, i))
    # aliases: one to a blob that survives, one to a blob that goes
    for name, target in (("keep.ref", "5"), ("dangling.ref", "0")):
        with open(os.path.join(str(tmp_path), name), "w") as f:
            f.write(target)
    aot._evict(str(tmp_path))
    left = sorted(os.listdir(str(tmp_path)))
    assert left == ["3.bin", "4.bin", "5.bin", "keep.ref"]


def test_sampler_run_with_aot_cache_dir(tmp_path, monkeypatch):
    """End-to-end: Sampler.run through aot.call (serialize falls back
    on CPU) produces the same posterior as the plain path."""
    from exmc_tpu import Builder, dists
    from exmc_tpu.nuts.sampler import _make_sampler

    ys = np.array([1.9, 2.1, 2.3, 2.0, 1.8, 2.2], np.float32)
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "mu", dists.Normal, {"mu": 0.0, "sigma": 5.0})
    ir = Builder.rv(ir, "y", dists.Normal, {"mu": "mu", "sigma": 0.5})
    ir = Builder.obs(ir, "y_obs", "y", ys)
    sampler = _make_sampler(ir, ncp=False, num_warmup=200, num_samples=200)

    monkeypatch.setenv("EXMC_AOT_CACHE", str(tmp_path))
    aot._serialize_broken.clear()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        t1, _ = sampler.run(num_chains=2, seed=0)
    monkeypatch.setenv("EXMC_AOT_CACHE", "0")
    t2, _ = sampler.run(num_chains=2, seed=0)
    np.testing.assert_allclose(
        np.asarray(t1["mu"]), np.asarray(t2["mu"]), rtol=1e-5)
    aot._serialize_broken.clear()


def test_run_chunked_with_aot_cache_dir(tmp_path, monkeypatch):
    """Chunked runs through aot.call match the plain path bit-for-bit
    and only compile once per program (the in-process memo serves the
    later chunks)."""
    from exmc_tpu import Builder, dists
    from exmc_tpu.nuts.sampler import _make_sampler

    ys = np.array([1.9, 2.1, 2.3, 2.0, 1.8, 2.2], np.float32)
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "mu", dists.Normal, {"mu": 0.0, "sigma": 5.0})
    ir = Builder.rv(ir, "y", dists.Normal, {"mu": "mu", "sigma": 0.5})
    ir = Builder.obs(ir, "y_obs", "y", ys)
    sampler = _make_sampler(ir, ncp=False, num_warmup=100, num_samples=100)

    monkeypatch.setenv("EXMC_AOT_CACHE", str(tmp_path))
    aot._serialize_broken.clear()
    aot._MEMO.clear()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        t1, _ = sampler.run_chunked(num_chains=2, chunk_iters=64, seed=0)
    monkeypatch.setenv("EXMC_AOT_CACHE", "0")
    t2, _ = sampler.run_chunked(num_chains=2, chunk_iters=64, seed=0)
    np.testing.assert_allclose(
        np.asarray(t1["mu"]), np.asarray(t2["mu"]), rtol=1e-5)
    aot._serialize_broken.clear()
    aot._MEMO.clear()


def test_ir_fingerprint_custom_dists_stable_by_code():
    """Custom dists / raw callables hash by code + closure VALUES, not
    object identity (review fix: id() leaked process-specific keys
    into the persistent AOT cache). Same code + closures => same
    signature; different closure values => different signature."""
    import jax.numpy as jnp
    from exmc_tpu import Builder, dists
    from exmc_tpu.nuts.sampler import ir_fingerprint

    def build(scale):
        def logpdf(value, params, data=None):
            return -0.5 * jnp.sum((value / scale) ** 2)

        lik = dists.Custom(logpdf_fn=logpdf, support="real")
        ir = Builder.new_ir()
        ir = Builder.rv(ir, "x", lik, {})
        return ir

    s1, stable1 = ir_fingerprint(build(2.0))
    s2, stable2 = ir_fingerprint(build(2.0))
    s3, _ = ir_fingerprint(build(3.0))
    assert s1 == s2  # fresh-but-identical closures agree
    assert s1 != s3  # closure VALUES are part of the program
    assert stable1 and stable2

    # a builtin (no __code__) can only be identified by id -> unstable
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "x", dists.Custom(logpdf_fn=abs, support="real"),
                    {})
    _, stable = ir_fingerprint(ir)
    assert not stable


def test_aot_disk_cache_disabled_for_unstable_signatures(tmp_path,
                                                         monkeypatch):
    """_aot_key_parts must return cache_dir=None when the IR signature
    is identity-based (cross-process keys would collide/miss
    unpredictably)."""
    from exmc_tpu import Builder, dists
    from exmc_tpu.nuts.sampler import _make_sampler

    monkeypatch.setenv("EXMC_AOT_CACHE", str(tmp_path))
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "x", dists.Custom(logpdf_fn=abs, support="real"),
                    {})
    sampler = _make_sampler(ir, ncp=False, num_warmup=10, num_samples=10)
    _, cdir, _ = sampler._aot_key_parts()
    assert cdir is None

    ir2 = Builder.new_ir()
    ir2 = Builder.rv(ir2, "mu", dists.Normal, {"mu": 0.0, "sigma": 1.0})
    sampler2 = _make_sampler(ir2, ncp=False, num_warmup=10, num_samples=10)
    _, cdir2, opts2 = sampler2._aot_key_parts()
    assert cdir2 == str(tmp_path)
    from exmc_tpu.nuts.sampler import _SAMPLER_OPT_KEYS
    keys2 = [k for k, _ in opts2]
    assert keys2[: len(_SAMPLER_OPT_KEYS)] == list(_SAMPLER_OPT_KEYS)
    # call-time-resolved program tunables ride the key too (a fast-key
    # hit never re-lowers — review finding, round 4)
    assert "marginal._BLOCK" in keys2

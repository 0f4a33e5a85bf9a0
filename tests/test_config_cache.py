"""Persistent-cache host scoping (config.py).

XLA:CPU persistent entries embed AOT-compiled machine code; loading a
foreign machine's entry risks SIGILL (cpu_aot_loader.cc warns). CPU
runs therefore retarget the cache to a per-host subdir — conftest.py
already called retarget_cache_for_cpu() before these tests run."""

import os

from exmc_tpu import config


def test_host_cpu_tag_stable_and_short():
    t1 = config.host_cpu_tag()
    t2 = config.host_cpu_tag()
    assert t1 == t2
    assert len(t1) == 8
    assert all(c in "0123456789abcdef" for c in t1)


def test_retarget_is_idempotent_and_active():
    d1 = config.compilation_cache_dir()
    if not d1:  # cache disabled in this environment
        return
    assert os.path.basename(d1) == "cpu-" + config.host_cpu_tag()
    config.retarget_cache_for_cpu()  # second call: no nesting
    d2 = config.compilation_cache_dir()
    assert d2 == d1
    import jax

    assert jax.config.jax_compilation_cache_dir == d1

"""Cross-chip diagnostics agree exactly with the host estimators."""

import numpy as np
import jax.numpy as jnp

from exmc_tpu.diagnostics import ess, rhat
from exmc_tpu.parallel.diagnostics import sharded_ess, sharded_rhat
from exmc_tpu.parallel.sharding import make_mesh


def test_sharded_rhat_matches_host():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(16, 400)), jnp.float32)
    mesh = make_mesh(8, dp=8, sp=1)
    with mesh:
        got = float(sharded_rhat(x, mesh))
    assert abs(got - float(rhat(x))) < 1e-5


def test_sharded_rhat_detects_bad_chain():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(16, 300))
    x[3] += 5.0
    x = jnp.asarray(x, jnp.float32)
    mesh = make_mesh(8, dp=8, sp=1)
    with mesh:
        got = float(sharded_rhat(x, mesh))
    assert got > 1.5


def test_sharded_ess_matches_host():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(16, 512)), jnp.float32)
    mesh = make_mesh(8, dp=8, sp=1)
    with mesh:
        got = float(sharded_ess(x, mesh))
    assert abs(got - float(ess(x))) / float(ess(x)) < 1e-4


def test_sharded_ess_penalizes_unmixed_chains():
    rng = np.random.default_rng(3)
    x = rng.normal(scale=0.1, size=(16, 512))
    x += np.arange(16)[:, None] * 5.0
    x = jnp.asarray(x, jnp.float32)
    mesh = make_mesh(8, dp=8, sp=1)
    with mesh:
        got = float(sharded_ess(x, mesh))
    assert got < 60
    assert abs(got - float(ess(x))) / max(float(ess(x)), 1.0) < 1e-3


def test_sharded_nested_rhat_matches_host():
    from exmc_tpu.diagnostics import nested_rhat
    from exmc_tpu.parallel.diagnostics import sharded_nested_rhat

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(32, 50)), jnp.float32)
    mesh = make_mesh(8, dp=8, sp=1)
    with mesh:
        got = float(sharded_nested_rhat(x, mesh, num_superchains=8))
    assert abs(got - float(nested_rhat(x, 8))) < 1e-5


def test_sharded_nested_rhat_detects_stuck_superchain():
    from exmc_tpu.parallel.diagnostics import sharded_nested_rhat

    rng = np.random.default_rng(5)
    x = rng.normal(size=(32, 50))
    x[0:4] += 10.0  # first superchain stuck far away
    x = jnp.asarray(x, jnp.float32)
    mesh = make_mesh(8, dp=8, sp=1)
    with mesh:
        got = float(sharded_nested_rhat(x, mesh, num_superchains=8))
    assert got > 1.5


def test_sharded_nested_rhat_rejects_split_superchains():
    import pytest

    from exmc_tpu.parallel.diagnostics import sharded_nested_rhat

    x = jnp.zeros((16, 10), jnp.float32)
    mesh = make_mesh(8, dp=8, sp=1)
    # 16 chains / 8 devices = 2 per shard; k=4 -> m=4 spans two shards
    with pytest.raises(ValueError, match="whole number"):
        sharded_nested_rhat(x, mesh, num_superchains=4)


def test_sharded_diagnostics_survive_large_offset():
    """f32 one-pass between-variance cancellation regression (round-5
    review): draws with a large common offset must still match the
    host estimators, which center before squaring."""
    from exmc_tpu.diagnostics import nested_rhat
    from exmc_tpu.parallel.diagnostics import sharded_nested_rhat

    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(32, 200)) * 0.01 + 1000.0,
                    jnp.float32)
    mesh = make_mesh(8, dp=8, sp=1)
    with mesh:
        r = float(sharded_rhat(x, mesh))
        nr = float(sharded_nested_rhat(x, mesh, num_superchains=8))
        e = float(sharded_ess(x, mesh))
    assert np.isfinite(r) and abs(r - float(rhat(x))) < 1e-3
    assert np.isfinite(nr) and abs(nr - float(nested_rhat(x, 8))) < 1e-3
    host_e = float(ess(x))
    assert np.isfinite(e) and abs(e - host_e) / host_e < 0.05

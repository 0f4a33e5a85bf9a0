"""Test harness config.

Tests run on CPU with 8 virtual devices so multi-chip sharding tests
execute without TPU hardware (the analogue of the reference's
``nodes: [node()]`` trick, SURVEY.md §4) — and in float32, matching the
TPU compute dtype, so f32 numeric hygiene is actually exercised.
"""

import os

# The persistent compilation cache (config.py) replays XLA:CPU AOT
# executables; the loader logs a benign-but-noisy machine-feature
# mismatch ERROR per entry (XLA pseudo-features like +prefer-no-scatter
# are absent from the host-detection list). Silence C++ logging for
# test runs.
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon TPU plugin (sitecustomize) forces jax_platforms="axon,cpu" at
# interpreter startup, overriding the JAX_PLATFORMS env var — select CPU
# via config instead (must happen before any backend is initialized).
jax.config.update("jax_platforms", "cpu")

# CPU persistent-cache entries embed host machine code; reading another
# machine's entries risks SIGILL (cpu_aot_loader warning) — scope the
# cache to a per-host subdir for CPU runs.
from exmc_tpu.config import retarget_cache_for_cpu  # noqa: E402

retarget_cache_for_cpu()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def assert_close(a, b, atol=1e-5, rtol=1e-5):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=atol, rtol=rtol)

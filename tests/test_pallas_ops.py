"""Pallas fused-leapfrog kernel vs the XLA scan reference (the Vulkan
fused-chain diag-test analogue, reference nuts/fused_chain_diag_test.exs)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from exmc_tpu.ops import fused_leapfrog_gaussian
from exmc_tpu.ops.fused_leapfrog import reference_leapfrog_gaussian


@pytest.mark.parametrize("c,d,k", [(8, 4, 16), (16, 128, 64)])
def test_fused_matches_reference(c, d, k):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(c, d)), jnp.float32)
    p = jnp.asarray(rng.normal(size=(c, d)), jnp.float32)
    mu = jnp.asarray(rng.normal(size=d), jnp.float32)
    prec = jnp.asarray(rng.uniform(0.5, 2.0, size=d), jnp.float32)
    inv_mass = jnp.ones(d, jnp.float32)
    eps = 0.05

    qf, pf, lp = fused_leapfrog_gaussian(q, p, mu, prec, inv_mass, eps, k,
                                         tile_c=c)
    qr, pr, lr = reference_leapfrog_gaussian(q, p, mu, prec, inv_mass, eps, k)
    np.testing.assert_allclose(np.asarray(qf), np.asarray(qr), atol=1e-4,
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(pf), np.asarray(pr), atol=1e-4,
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lr), atol=1e-3,
                               rtol=1e-4)


def test_fused_energy_conservation():
    """Joint energy conserved over a long fused chain at small eps."""
    c, d, k = 8, 8, 400
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(c, d)), jnp.float32)
    p = jnp.asarray(rng.normal(size=(c, d)), jnp.float32)
    mu = jnp.zeros(d)
    prec = jnp.ones(d)
    inv_mass = jnp.ones(d)

    def joint(q, p):
        return (-0.5 * jnp.sum(q * q, axis=-1)) - 0.5 * jnp.sum(p * p, axis=-1)

    j0 = joint(q, p)
    qf, pf, _ = fused_leapfrog_gaussian(q, p, mu, prec, inv_mass, 0.01, k,
                                        tile_c=c)
    j1 = joint(qf, pf)
    np.testing.assert_allclose(np.asarray(j1), np.asarray(j0), atol=2e-3)

"""Pooled cross-chain adaptation: Welford moments merged across the
vmap axis at window ends (TPU-native; no reference analogue — their
chains could only broadcast chain 0's tuning)."""

import numpy as np
import jax.numpy as jnp

from exmc_tpu import Builder, dists, sample
from exmc_tpu.nuts.mass_matrix import (
    WelfordState,
    welford_finalize,
    welford_init,
    welford_merge_across,
    welford_update,
)


def test_welford_merge_math():
    """Merging per-chain states equals one stream over all samples."""
    import jax

    rng = np.random.default_rng(0)
    xs = rng.normal(size=(4, 50, 3)).astype(np.float32) * np.array(
        [1.0, 2.0, 0.5], np.float32
    )

    def accumulate(chain):
        st = welford_init(3)
        for x in chain:
            st = welford_update(st, jnp.asarray(x))
        return st

    states = jax.tree.map(
        lambda *leaves: jnp.stack(leaves),
        *[accumulate(xs[c]) for c in range(4)],
    )
    merged = jax.vmap(
        lambda st: welford_merge_across(st, "c"), axis_name="c"
    )(states)
    # every lane gets the same merged state
    np.testing.assert_allclose(merged.mean[0], merged.mean[3], rtol=1e-6)
    flat = xs.reshape(-1, 3)
    np.testing.assert_allclose(
        np.asarray(merged.mean[0]), flat.mean(axis=0), rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(merged.m2[0]) / (flat.shape[0] - 1),
        flat.var(axis=0, ddof=1),
        rtol=1e-3,
    )


def _aniso_ir():
    # anisotropic Gaussian: true posterior variances (1, 16, 0.25)
    cov = np.diag([1.0, 16.0, 0.25])
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "x", dists.MvNormal,
                    {"mu": np.zeros(3), "cov": cov})
    return ir


def test_pooled_adaptation_short_warmup():
    """With pooling, a SHORT warmup (150 iters, 16 chains) already
    recovers the anisotropic scales; the pooled inv_mass is identical
    across chains and close to the true variances."""
    trace, stats = sample(
        _aniso_ir(), num_chains=16, num_warmup=150, num_samples=300,
        seed=0, pooled_adaptation=True,
    )
    inv_mass = stats["inv_mass"]
    np.testing.assert_allclose(inv_mass[0], inv_mass[7], rtol=1e-5)
    ratios = inv_mass[0] / np.array([1.0, 16.0, 0.25])
    assert (ratios > 0.4).all() and (ratios < 2.5).all(), inv_mass[0]
    emp = trace["x"].reshape(-1, 3).var(axis=0)
    np.testing.assert_allclose(emp, [1.0, 16.0, 0.25], rtol=0.35)


def test_pooled_vs_perchain_same_posterior():
    trace_p, _ = sample(_aniso_ir(), num_chains=8, num_warmup=300,
                        num_samples=300, seed=1, pooled_adaptation=True)
    trace_i, _ = sample(_aniso_ir(), num_chains=8, num_warmup=300,
                        num_samples=300, seed=2, pooled_adaptation=False)
    m_p = trace_p["x"].reshape(-1, 3).mean(axis=0)
    m_i = trace_i["x"].reshape(-1, 3).mean(axis=0)
    np.testing.assert_allclose(m_p, m_i, atol=0.4)

"""Property-based statistical tests of the NUTS kernel over randomized
targets (the reference's PropCheck "statham" models,
statham_tree_test.exs:1-14: random model configs -> whole trees ->
invariants + statistical properties: accept ~0.65 band, proposal
diversity, correct moments)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from exmc_tpu.nuts.leapfrog import make_metric
from exmc_tpu.nuts.tree import nuts_transition


def run_chain(vag, d, eps, n_iters, seed, metric=None, max_depth=10):
    if metric is None:
        metric = make_metric(jnp.ones(d))

    def step(carry, key):
        q, logp, grad = carry
        q, logp, grad, stats = nuts_transition(
            vag, metric, eps, q, logp, grad, key, max_depth
        )
        return (q, logp, grad), (q, stats)

    q0 = jnp.zeros(d)
    logp0, grad0 = vag(q0)
    keys = jax.random.split(jax.random.PRNGKey(seed), n_iters)
    _, (qs, stats) = jax.lax.scan(step, (q0, logp0, grad0), keys)
    return np.asarray(qs), {k: np.asarray(v) for k, v in stats.items()}


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_anisotropic_gaussian_invariants(seed):
    """Random per-coordinate scales in [0.3, 3]: the kernel must keep
    accept in a sane band, terminate without divergence, produce diverse
    proposals, and recover every marginal variance."""
    rng = np.random.default_rng(seed)
    d = int(rng.integers(2, 8))
    scales = jnp.asarray(rng.uniform(0.3, 3.0, size=d), jnp.float32)

    def vag(q):
        z = q / scales
        return -0.5 * jnp.sum(z * z), -q / (scales * scales)

    eps = 0.3 * float(scales.min())
    qs, stats = run_chain(vag, d, eps, 2000, seed + 100)
    qs = qs[400:]
    accept = stats["accept_prob"]
    assert 0.6 < accept.mean() <= 1.0
    assert stats["diverging"].mean() < 0.02
    moved = np.mean(np.any(np.diff(qs, axis=0) != 0, axis=1))
    assert moved > 0.9
    np.testing.assert_allclose(
        qs.var(axis=0), np.asarray(scales) ** 2, rtol=0.35
    )


def test_depth_scales_with_condition_number():
    """Badly conditioned targets need deeper trees at a fixed eps — the
    qualitative behavior the U-turn criterion exists to produce."""
    def vag_iso(q):
        return -0.5 * jnp.sum(q * q), -q

    scales = jnp.asarray([1.0, 10.0], jnp.float32)

    def vag_aniso(q):
        z = q / scales
        return -0.5 * jnp.sum(z * z), -q / (scales * scales)

    _, s_iso = run_chain(vag_iso, 2, 0.3, 600, 5)
    _, s_aniso = run_chain(vag_aniso, 2, 0.3, 600, 5)
    assert s_aniso["depth"].mean() > s_iso["depth"].mean() + 0.5


def test_energy_stats_centered():
    """E[energy change] across transitions ~ 0 for a well-tuned chain
    (energy = -joint at the proposal; large drift indicates a broken
    Hamiltonian or weight bug)."""
    def vag(q):
        return -0.5 * jnp.sum(q * q), -q

    _, stats = run_chain(vag, 4, 0.5, 2000, 9)
    de = np.diff(stats["energy"][200:])
    assert abs(de.mean()) < 0.05


def test_max_depth_respected():
    def vag(q):
        return jnp.zeros(()), jnp.zeros_like(q)  # free particle: no U-turn

    _, stats = run_chain(vag, 2, 0.1, 50, 11, max_depth=6)
    assert stats["depth"].max() == 6
    assert stats["n_steps"].max() <= 2**6


def test_dynamic_depth_cap():
    def vag(q):
        return jnp.zeros(()), jnp.zeros_like(q)

    metric = make_metric(jnp.ones(2))
    q = jnp.zeros(2)
    logp, grad = vag(q)
    _, _, _, stats = nuts_transition(
        vag, metric, 0.1, q, logp, grad, jax.random.PRNGKey(0), 10,
        max_depth_dyn=jnp.asarray(3, jnp.int32),
    )
    assert int(stats["depth"]) == 3


def test_poker_table_session():
    from exmc_tpu.apps.poker import Table, archetypes

    t = Table(archetypes()[:2], seed=0).play(30)
    assert t.hand_counts() == [30, 30]
    t.play(10)
    assert t.hand_counts() == [40, 40]

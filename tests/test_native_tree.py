"""Cross-validation of the two tree implementations.

The C++ builder (native/exmc_tree/tree.cpp) is a RECURSIVE formulation;
the XLA kernel (exmc_tpu/nuts/tree.py) is ITERATIVE with checkpoint
stacks. Same semantics by construction — these statistical tests are
the merge-protocol property checks the reference says would have caught
its capped-weight / biased-progressive bugs "in four lines"
(statham_merge_test.exs:1-15, D49/D50)."""

import math

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from exmc_tpu import native
from exmc_tpu.nuts.leapfrog import make_metric
from exmc_tpu.nuts.tree import nuts_transition

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def numpy_leapfrog_chain(q0, p0, grad_fn, logp_fn, eps, n, inv_mass):
    """Precompute an n-step leapfrog chain in f64 (the reference NIF's
    precomputed-states contract)."""
    qs, ps, lps = [], [], []
    q, p = q0.copy(), p0.copy()
    g = grad_fn(q)
    for _ in range(n):
        p_half = p + 0.5 * eps * g
        q = q + eps * inv_mass * p_half
        g = grad_fn(q)
        p = p_half + 0.5 * eps * g
        qs.append(q.copy())
        ps.append(p.copy())
        lps.append(logp_fn(q))
    return np.array(qs), np.array(ps), np.array(lps)


def gaussian_chains(q0, p0, eps, n, inv_mass):
    logp_fn = lambda q: -0.5 * float(q @ q)
    grad_fn = lambda q: -q
    fwd = numpy_leapfrog_chain(q0, p0, grad_fn, logp_fn, eps, n, inv_mass)
    # backward = leapfrog with -eps (momenta stay forward-oriented)
    bwd = numpy_leapfrog_chain(q0, p0, grad_fn, logp_fn, -eps, n, inv_mass)
    return fwd, bwd


def test_free_particle_runs_to_max_depth():
    """Constant density, constant momentum: never turns, never diverges,
    accept=1, tree reaches max depth; selection symmetric around 0."""
    d = 2
    q0 = np.zeros(d)
    p0 = np.array([1.0, 0.5])
    inv_mass = np.ones(d)
    n = 2**6
    # free particle: logp = 0 everywhere, straight-line chain
    qs_f = np.cumsum(np.tile(0.1 * p0, (n, 1)), axis=0)
    ps_f = np.tile(p0, (n, 1))
    lp_f = np.zeros(n)
    qs_b = -qs_f
    ps_b = np.tile(p0, (n, 1))  # forward-oriented momenta (see contract)
    lp_b = np.zeros(n)

    selections = []
    for seed in range(200):
        # equal-KE leaves: joint identical everywhere
        out = native.build_full_tree(
            q0, p0, 0.0, (qs_f, ps_f, lp_f), (qs_b, ps_b, lp_b),
            inv_mass, max_depth=5, seed=seed,
        )
        assert out["ok"]
        assert not out["diverging"]
        assert out["depth"] == 5
        assert abs(out["accept_prob"] - 1.0) < 1e-12
        selections.append(out["selected"])
    sel = np.array(selections)
    assert abs(sel.mean()) < 4.0       # symmetric
    assert sel.std() > 5.0             # genuinely multinomial, not sticky
    assert (np.abs(sel) <= 31).all()   # within 2^5 - 1 steps


def test_divergent_leaf_terminates():
    d = 1
    q0 = np.zeros(d)
    p0 = np.ones(d)
    n = 8
    qs = np.cumsum(np.ones((n, 1)), axis=0)
    ps = np.ones((n, 1))
    lp = np.zeros(n)
    lp_bad = lp.copy()
    lp_bad[0] = -1e10  # immediate divergence in both directions
    out = native.build_full_tree(
        q0, p0, 0.0, (qs, ps, lp_bad), (-qs, ps, lp_bad), np.ones(1),
        max_depth=4, seed=3,
    )
    assert out["ok"]
    assert out["diverging"]
    assert out["selected"] == 0  # stays at the initial point


def test_biased_progressive_merge_probabilities():
    """Biased progressive outer merge (D50): the one-leaf subtree wins
    with probability min(1, w_sub / w_traj). With init weight 1:
    fwd leaf weight 0.5 -> taken w.p. 0.5; bwd leaf weight 0.25 ->
    taken w.p. 0.25. (A balanced merge would give 1/3 and 1/5 — this
    test distinguishes the two protocols, the exact bug class of
    reference D50.)"""
    d = 1
    q0 = np.zeros(d)
    p0 = np.ones(d)
    n = 4
    qs = np.cumsum(np.ones((n, 1)), axis=0)
    ps = np.ones((n, 1))
    lp_f = np.zeros(n)
    lp_f[0] = math.log(0.5) + 0.5  # joint - joint0 = log 0.5 (KE = 0.5)
    lp_b = np.zeros(n)
    lp_b[0] = math.log(0.25) + 0.5
    counts = {0: 0, 1: 0, -1: 0}
    trials = 4000
    for seed in range(trials):
        out = native.build_full_tree(
            # logp0 = 0.5 so joint0 = logp0 - KE(p0=1) = 0
            q0, p0, 0.5, (qs, ps, lp_f), (-qs, ps, lp_b), np.ones(1),
            max_depth=1, seed=seed,
        )
        counts[out["selected"]] += 1
    f1 = counts[1] / trials
    fm1 = counts[-1] / trials
    assert abs(f1 - 0.5 * 0.5) < 0.03      # dir fair x biased accept 0.5
    assert abs(fm1 - 0.5 * 0.25) < 0.03    # dir fair x biased accept 0.25
    assert abs(counts[0] / trials - 0.625) < 0.03


def test_cpp_vs_xla_kernel_statistics():
    """Depth / leapfrog-count / acceptance distributions of the recursive
    C++ oracle and the iterative XLA kernel agree on a 2-d Gaussian."""
    d = 2
    inv_mass = np.ones(d)
    eps = 0.45
    q0 = np.array([0.7, -0.4])
    max_depth = 8
    n_trials = 150

    # --- C++ oracle: sample momentum in numpy, precompute chains ---
    rng = np.random.default_rng(0)
    cpp_depth, cpp_steps, cpp_accept = [], [], []
    for t in range(n_trials):
        p0 = rng.normal(size=d)
        fwd, bwd = gaussian_chains(q0, p0, eps, 2**max_depth, inv_mass)
        out = native.build_full_tree(
            q0, p0, -0.5 * float(q0 @ q0), fwd, bwd, inv_mass,
            max_depth=max_depth, seed=1000 + t,
        )
        assert out["ok"]
        cpp_depth.append(out["depth"])
        cpp_steps.append(out["n_leapfrog"])
        cpp_accept.append(out["accept_prob"])

    # --- XLA kernel ---
    def vag(q):
        return -0.5 * jnp.sum(q * q), -q

    metric = make_metric(jnp.ones(d))

    def one(key):
        logp, grad = vag(jnp.asarray(q0, jnp.float32))
        _, _, _, stats = nuts_transition(
            vag, metric, eps, jnp.asarray(q0, jnp.float32), logp, grad,
            key, max_depth,
        )
        return stats["depth"], stats["n_steps"], stats["accept_prob"]

    keys = jax.random.split(jax.random.PRNGKey(7), n_trials)
    xla_depth, xla_steps, xla_accept = jax.jit(jax.vmap(one))(keys)

    # with full Stan-check parity at inner merges the two formulations
    # agree almost exactly (measured: depth 2.800 vs 2.803 at 300 trials)
    assert abs(np.mean(cpp_depth) - np.mean(np.asarray(xla_depth))) < 0.4
    assert abs(np.mean(cpp_accept) - np.mean(np.asarray(xla_accept))) < 0.05
    # band wide enough to survive f32 reduction-order shifts across
    # platforms/JAX versions, tight enough to catch formulation bugs
    ratio = np.mean(cpp_steps) / max(np.mean(np.asarray(xla_steps)), 1)
    assert 0.7 < ratio < 1.4


def test_matched_rng_lockstep_tree_shape():
    """Matched-RNG lockstep (round-5 VERDICT item 3): mirror the XLA
    kernel's key-split discipline on the host (threefry is deterministic,
    eager == traced) to extract the transition's momentum draw and
    per-doubling direction bits, force those directions into the C++
    oracle on chains precomputed with the same step size, and assert
    EXACT per-trial equality of tree shape — depth, leapfrog count,
    divergence flag — plus mean-accept parity. Shape is a deterministic
    function of geometry + directions (only leaf selection consumes
    further randomness), so ANY inner/outer U-turn-check or
    merge-termination discrepancy between the recursive C++ and
    iterative XLA formulations breaks equality deterministically,
    rather than statistically.

    Key-split mirror of nuts_transition (tree.py:297,319):
        key, mom_key = split(key);  r0 = sample_momentum(mom_key, ...)
        each doubling: key, dir_key, sub_key, merge_key = split(key, 4)
                       go_right = bernoulli(dir_key)
    """
    from exmc_tpu.nuts.leapfrog import sample_momentum

    d = 2
    eps = 0.45
    max_depth = 6
    q0 = np.array([0.7, -0.4])
    inv_mass = np.ones(d)
    metric = make_metric(jnp.ones(d, jnp.float32))

    def vag(q):
        return -0.5 * jnp.sum(q * q), -q

    @jax.jit
    def kernel(key):
        logp, grad = vag(jnp.asarray(q0, jnp.float32))
        _, _, _, stats = nuts_transition(
            vag, metric, eps, jnp.asarray(q0, jnp.float32), logp, grad,
            key, max_depth,
        )
        return stats

    n_trials = 300
    depths_seen = set()
    for t in range(n_trials):
        key = jax.random.fold_in(jax.random.PRNGKey(42), t)
        # host mirror of the kernel's split discipline
        key, mom_key = jax.random.split(key)
        r0 = np.asarray(sample_momentum(mom_key, metric, d), np.float64)
        k, dirs = key, []
        for _ in range(max_depth):
            k, dir_key, _sub, _merge = jax.random.split(k, 4)
            dirs.append(1 if bool(jax.random.bernoulli(dir_key)) else -1)

        stats = kernel(jax.random.fold_in(jax.random.PRNGKey(42), t))
        fwd, bwd = gaussian_chains(q0, r0, eps, 2**max_depth, inv_mass)
        out = native.build_full_tree(
            q0, r0, -0.5 * float(q0 @ q0), fwd, bwd, inv_mass,
            max_depth=max_depth, seed=t, dirs=dirs,
        )
        assert out["ok"]
        assert out["depth"] == int(stats["depth"]), (
            f"trial {t}: oracle depth {out['depth']} != "
            f"kernel {int(stats['depth'])} (dirs={dirs})")
        assert out["n_leapfrog"] == int(stats["n_steps"]), (
            f"trial {t}: oracle steps {out['n_leapfrog']} != "
            f"kernel {int(stats['n_steps'])}")
        assert out["diverging"] == bool(stats["diverging"])
        assert abs(out["accept_prob"] - float(stats["accept_prob"])) < 5e-4
        depths_seen.add(out["depth"])
    assert len(depths_seen) >= 3  # the trials genuinely vary in shape

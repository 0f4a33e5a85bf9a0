"""Iterative multinomial NUTS transition as one jittable function.

This replaces the reference's entire native-acceleration layer: the
recursive Rust tree builder (reference native/exmc_tree/src/tree.rs),
the speculative leapfrog buffers (tree.ex:307-337,509-690 D39), the
atomics-counter cached dispatch (tree.ex:1216-1279) and the full-tree
NIF (tree.ex:84-141 D48). The recursion is re-formulated as an
*iterative* doubling loop (`lax.while_loop`) with fixed-size checkpoint
stacks, so the whole transition traces into a single XLA program and
vmaps over thousands of chains.

Semantics preserved exactly (the decisions worth 2-3x ESS per
reference DECISIONS D43/D46/D49/D50, guarded by test_tree_properties):

* leaf: divergence iff delta-joint < -1000 or non-finite
  (tree.ex:1040-1048 D26); UNCAPPED multinomial log-weight = delta (D49);
  accept_prob contribution min(1, exp(delta)) (tree.ex:1040-1048).
* within-subtree merge: balanced multinomial — realised progressively:
  each new leaf replaces the subtree proposal w.p.
  exp(lw_leaf - lsw_subtree_new) (tree.ex:1390-1476).
* outer merge: biased progressive — the new subtree's proposal wins
  w.p. min(1, exp(lsw_subtree - lsw_trajectory)) (tree.ex:1479-1568 D50).
* U-turn: generalized rho criterion rho . (M^-1 p_boundary) <= 0
  (uturn.rs:8-30, D43), applied at EVERY merge — inner and outer —
  with the full-trajectory check PLUS Stan's two extended
  half-trajectory checks (tree.ex:1424-1449,1516-1541, D46 — "from
  Stan nuts.hpp, not in the papers").

Checkpoint scheme (per subtree of depth j, leaves indexed 0..2^j-1):
scanning leaves sequentially, the set of power-of-two sub-trajectories
still "open" behaves like a binary counter. An even leaf n opens
sub-trajectories and stores (r_n, rho_through_n, r_{n-1}) at slot
popcount(n); an odd leaf n closes ctz(n+1) sub-trajectories, checked at
slots popcount(n)-1 down to popcount(n)-ctz(n+1). The sub-trajectory
momentum sum from checkpoint leaf s through n is
rho_through_n - rho_through_s + r_s; the closing sub-trajectory's
midpoint is exactly the checkpoint at the next slot, which makes both
extended checks computable (see _iterative_uturn_check). At most
max_depth slots are ever live, so the stacks are fixed-size
(max_depth, d) arrays in the while_loop carry.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from exmc_tpu.config import DIVERGENCE_THRESHOLD
from exmc_tpu.nuts.leapfrog import (
    Metric,
    kinetic_energy,
    leapfrog,
    sample_momentum,
    velocity,
)


def _is_turning(metric, r_minus, r_plus, rho):
    """Generalized U-turn criterion (uturn.rs:8-30, D43): the trajectory
    persists only while rho . v(r) > 0 at BOTH boundaries."""
    turn_minus = jnp.dot(rho, velocity(metric, r_minus)) <= 0.0
    turn_plus = jnp.dot(rho, velocity(metric, r_plus)) <= 0.0
    return turn_minus | turn_plus


def _log_uniform(key):
    """log U, U~Uniform(0,1), as -Exp(1) (numerically exact in the tail)."""
    return -jax.random.exponential(key)


class _Subtree(NamedTuple):
    n: jnp.ndarray            # leaves built so far (i32)
    z: jnp.ndarray            # current end state (the subtree's far boundary)
    r: jnp.ndarray
    g: jnp.ndarray
    r_first: jnp.ndarray      # momentum at the subtree leaf adjacent to the
    #                           old trajectory (for extended check 1, D46)
    z_prop: jnp.ndarray
    logp_prop: jnp.ndarray
    g_prop: jnp.ndarray
    joint_prop: jnp.ndarray
    lsw: jnp.ndarray          # subtree multinomial log-sum-weight
    rho: jnp.ndarray          # subtree momentum sum
    sum_accept: jnp.ndarray
    turning: jnp.ndarray
    diverging: jnp.ndarray
    ckpt: jnp.ndarray         # (max_depth + 1, 3, d) checkpoint stacks:
    #                           [:, 0] momenta, [:, 1] rho-through,
    #                           [:, 2] momentum of the leaf BEFORE each
    #                           checkpoint leaf (extended check c). ONE
    #                           array, ONE dynamic-update-slice per leaf
    #                           (round-5 profiler finding: three masked
    #                           DUS + full-array selects cost as much as
    #                           the compute fusions); odd leaves write
    #                           row max_depth — a scratch row the U-turn
    #                           checks never read — instead of masking.
    key: jnp.ndarray


def _popcount(n):
    return jax.lax.population_count(n)


def _ctz(n):
    """count trailing zeros of n (n > 0): popcount((n & -n) - 1)."""
    return jax.lax.population_count((n & -n) - 1)


def _iterative_uturn_check(metric, r_new, rho_through, ckpt_r, ckpt_rho,
                           ckpt_prev_r, idx_min, idx_max, max_depth):
    """Check U-turn for every power-of-two sub-trajectory ending at the
    current (odd) leaf, walking checkpoint slots idx_max..idx_min.

    For the sub-trajectory closing at slot i (leaves [s..n], size 2^k,
    k = idx_max - i + 1), its midpoint mid = s + 2^{k-1} is exactly the
    checkpoint leaf at slot i+1 (binary-counter property), so Stan's two
    extended half-trajectory checks (reference tree.ex:1424-1449, D46)
    are available in the iterative formulation:
      (a) full:  rho[s..n],        boundaries (r_s, r_n)
      (b) left:  rho[s..mid-1]+r_mid,   boundaries (r_s, r_mid)
      (c) right: rho[mid..n]+r_{mid-1}, boundaries (r_{mid-1}, r_n)
    with r_{mid-1} read from the prev-momentum stack stored when mid's
    checkpoint was written. At i == idx_max (the leaf pair) all three
    collapse to (a).

    Vectorized: all max_depth slots are checked as one batch of masked
    VPU reductions — a nested while_loop here costs more in control
    overhead than the handful of (max_depth, d) elementwise ops."""

    def vel(r):
        if metric.dense:
            return r @ metric.inv.T
        return metric.inv * r

    def dots(rho, r):  # row-wise <rho_i, v(r_i)>
        return jnp.sum(rho * vel(r), axis=-1)

    slots = jnp.arange(ckpt_r.shape[0])
    active = (slots >= idx_min) & (slots <= idx_max)
    has_mid = active & (slots < idx_max)
    nxt = jnp.minimum(slots + 1, max_depth - 1)

    v_new = vel(r_new)
    # (a) full sub-trajectory [s..n]
    rho_sub = rho_through[None, :] - ckpt_rho + ckpt_r
    turn_a = (dots(rho_sub, ckpt_r) <= 0.0) | (rho_sub @ v_new <= 0.0)
    # (b) left half + its far boundary momentum (midpoint checkpoint)
    rho_left = ckpt_rho[nxt] - ckpt_rho + ckpt_r
    turn_b = (dots(rho_left, ckpt_r) <= 0.0) | (
        dots(rho_left, ckpt_r[nxt]) <= 0.0
    )
    # (c) right half + momentum of the leaf before the midpoint
    rho_right = (
        rho_through[None, :] - ckpt_rho[nxt] + ckpt_r[nxt] + ckpt_prev_r[nxt]
    )
    turn_c = (dots(rho_right, ckpt_prev_r[nxt]) <= 0.0) | (
        rho_right @ v_new <= 0.0
    )
    per_slot = turn_a | (has_mid & (turn_b | turn_c))
    return jnp.any(active & per_slot)


def _build_subtree(vag_fn, metric, eps_signed, depth, z0, r0, g0, joint0, key, max_depth):
    """Build 2^depth leapfrog steps outward from (z0, r0, g0), tracking the
    progressive-multinomial proposal, rho, and within-subtree U-turn checks.
    Terminates early on divergence or internal U-turn."""
    d = z0.shape[0]
    dtype = z0.dtype
    max_steps = jnp.left_shift(jnp.ones((), jnp.int32), depth)

    init = _Subtree(
        n=jnp.zeros((), jnp.int32),
        z=z0,
        r=r0,
        g=g0,
        r_first=jnp.zeros_like(r0),
        z_prop=z0,
        logp_prop=jnp.zeros((), dtype),
        g_prop=g0,
        joint_prop=joint0,
        lsw=jnp.asarray(-jnp.inf, dtype),
        rho=jnp.zeros_like(r0),
        sum_accept=jnp.zeros((), dtype),
        turning=jnp.zeros((), bool),
        diverging=jnp.zeros((), bool),
        ckpt=jnp.zeros((max_depth + 1, 3, d), dtype),
        key=key,
    )

    def cond(st):
        return (st.n < max_steps) & ~st.turning & ~st.diverging

    def body(st):
        key, take_key = jax.random.split(st.key)
        z, r, logp, g = leapfrog(vag_fn, st.z, st.r, st.g, eps_signed, metric)
        joint = logp - kinetic_energy(metric, r)
        delta = joint - joint0
        # NaN-safe: non-finite delta counts as divergent (D26/D56)
        diverging_leaf = ~(delta >= -DIVERGENCE_THRESHOLD)
        lw = jnp.where(diverging_leaf, -jnp.inf, delta)  # uncapped weight, D49
        accept = jnp.where(diverging_leaf, 0.0, jnp.exp(jnp.minimum(delta, 0.0)))

        n = st.n  # 0-based index of this new leaf within the subtree
        rho = st.rho + jnp.where(diverging_leaf, 0.0, r)
        r_first = jnp.where(n == 0, r, st.r_first)

        # progressive multinomial proposal within the subtree (balanced)
        new_lsw = jnp.logaddexp(st.lsw, lw)
        take = (~diverging_leaf) & (_log_uniform(take_key) < lw - new_lsw)
        z_prop = jnp.where(take, z, st.z_prop)
        logp_prop = jnp.where(take, logp, st.logp_prop)
        g_prop = jnp.where(take, g, st.g_prop)
        joint_prop = jnp.where(take, joint, st.joint_prop)

        # checkpoint store at even leaves (slot = popcount(n)); st.r is
        # still the PREVIOUS leaf's momentum here (leaf n-1, or the
        # start boundary for n=0 — never read as a midpoint, see
        # _iterative_uturn_check). Odd leaves write the scratch row
        # (max_depth) unconditionally: one unmasked DUS replaces three
        # masked ones + whole-stack selects (round-5 profiler finding).
        is_even = (n & 1) == 0
        slot = jnp.where(
            is_even, jnp.minimum(_popcount(n), max_depth - 1), max_depth
        )
        ckpt = st.ckpt.at[slot].set(jnp.stack([r, rho, st.r]))

        # U-turn checks at odd leaves over all sub-trajectories ending here
        idx_max = _popcount(n) - 1
        idx_min = idx_max - _ctz(n + 1) + 1
        turning = jnp.where(
            is_even | diverging_leaf,
            jnp.zeros((), bool),
            _iterative_uturn_check(
                metric, r, rho, ckpt[:max_depth, 0], ckpt[:max_depth, 1],
                ckpt[:max_depth, 2], idx_min, idx_max, max_depth,
            ),
        )

        return _Subtree(
            n=n + 1,
            z=z,
            r=r,
            g=g,
            r_first=r_first,
            z_prop=z_prop,
            logp_prop=logp_prop,
            g_prop=g_prop,
            joint_prop=joint_prop,
            lsw=new_lsw,
            rho=rho,
            sum_accept=st.sum_accept + accept,
            turning=turning,
            diverging=diverging_leaf,
            ckpt=ckpt,
            key=key,
        )

    return jax.lax.while_loop(cond, body, init)


class TreeState(NamedTuple):
    z_left: jnp.ndarray
    r_left: jnp.ndarray
    g_left: jnp.ndarray
    z_right: jnp.ndarray
    r_right: jnp.ndarray
    g_right: jnp.ndarray
    z_prop: jnp.ndarray
    logp_prop: jnp.ndarray
    g_prop: jnp.ndarray
    joint_prop: jnp.ndarray
    rho: jnp.ndarray
    lsw: jnp.ndarray
    depth: jnp.ndarray
    turning: jnp.ndarray
    diverging: jnp.ndarray
    sum_accept: jnp.ndarray
    n_leapfrog: jnp.ndarray
    key: jnp.ndarray


def nuts_transition(vag_fn, metric: Metric, eps, q, logp, grad, key, max_depth,
                    max_depth_dyn=None):
    """One full NUTS transition (reference Tree.build, tree.ex:65 — here
    one traced program). ``max_depth`` is static (sizes the checkpoint
    stacks); ``max_depth_dyn`` optionally caps doubling dynamically (the
    reference caps depth at 8 early in warmup, sampler.ex:537-762).

    Returns (q', logp', grad', stats-dict)."""
    d = q.shape[0]
    dtype = q.dtype
    if max_depth_dyn is None:
        max_depth_dyn = jnp.asarray(max_depth, jnp.int32)

    key, mom_key = jax.random.split(key)
    r0 = sample_momentum(mom_key, metric, d)
    joint0 = logp - kinetic_energy(metric, r0)

    init = TreeState(
        z_left=q, r_left=r0, g_left=grad,
        z_right=q, r_right=r0, g_right=grad,
        z_prop=q, logp_prop=logp, g_prop=grad, joint_prop=joint0,
        rho=r0,
        lsw=jnp.zeros((), dtype),  # initial point has weight exp(0)=1
        depth=jnp.zeros((), jnp.int32),
        turning=jnp.zeros((), bool),
        diverging=jnp.zeros((), bool),
        sum_accept=jnp.zeros((), dtype),
        n_leapfrog=jnp.zeros((), jnp.int32),
        key=key,
    )

    def cond(st):
        return (st.depth < max_depth_dyn) & ~st.turning & ~st.diverging

    def body(st):
        key, dir_key, sub_key, merge_key = jax.random.split(st.key, 4)
        go_right = jax.random.bernoulli(dir_key)
        eps_signed = jnp.where(go_right, eps, -eps)

        z0 = jnp.where(go_right, st.z_right, st.z_left)
        r0b = jnp.where(go_right, st.r_right, st.r_left)
        g0 = jnp.where(go_right, st.g_right, st.g_left)

        sub = _build_subtree(
            vag_fn, metric, eps_signed, st.depth, z0, r0b, g0, joint0,
            sub_key, max_depth,
        )
        ok = ~sub.turning & ~sub.diverging

        # biased progressive merge (tree.ex:1479-1568, D50)
        take = ok & (_log_uniform(merge_key) < sub.lsw - st.lsw)
        z_prop = jnp.where(take, sub.z_prop, st.z_prop)
        logp_prop = jnp.where(take, sub.logp_prop, st.logp_prop)
        g_prop = jnp.where(take, sub.g_prop, st.g_prop)
        joint_prop = jnp.where(take, sub.joint_prop, st.joint_prop)
        lsw = jnp.where(ok, jnp.logaddexp(st.lsw, sub.lsw), st.lsw)

        # extend boundaries only when the subtree is valid
        ext_right = ok & go_right
        ext_left = ok & ~go_right
        z_right = jnp.where(ext_right, sub.z, st.z_right)
        r_right = jnp.where(ext_right, sub.r, st.r_right)
        g_right = jnp.where(ext_right, sub.g, st.g_right)
        z_left = jnp.where(ext_left, sub.z, st.z_left)
        r_left = jnp.where(ext_left, sub.r, st.r_left)
        g_left = jnp.where(ext_left, sub.g, st.g_left)
        rho = jnp.where(ok, st.rho + sub.rho, st.rho)

        # U-turn across the merged trajectory + Stan's two extended
        # sub-trajectory checks (D43/D46)
        far_old = jnp.where(go_right, st.r_left, st.r_right)
        adj_old = jnp.where(go_right, st.r_right, st.r_left)
        turn_full = _is_turning(metric, r_left, r_right, rho)
        turn_ext1 = _is_turning(metric, far_old, sub.r_first, st.rho + sub.r_first)
        turn_ext2 = _is_turning(metric, adj_old, sub.r, sub.rho + adj_old)
        turning = sub.turning | (ok & (turn_full | turn_ext1 | turn_ext2))

        return TreeState(
            z_left=z_left, r_left=r_left, g_left=g_left,
            z_right=z_right, r_right=r_right, g_right=g_right,
            z_prop=z_prop, logp_prop=logp_prop, g_prop=g_prop,
            joint_prop=joint_prop,
            rho=rho,
            lsw=lsw,
            depth=st.depth + 1,
            turning=turning,
            diverging=sub.diverging,
            sum_accept=st.sum_accept + sub.sum_accept,
            n_leapfrog=st.n_leapfrog + sub.n,
            key=key,
        )

    final = jax.lax.while_loop(cond, body, init)

    accept_prob = final.sum_accept / jnp.maximum(final.n_leapfrog, 1).astype(dtype)
    stats = {
        "depth": final.depth,
        "n_steps": final.n_leapfrog,
        "diverging": final.diverging,
        "accept_prob": accept_prob,
        "energy": -final.joint_prop,
    }
    return final.z_prop, final.logp_prop, final.g_prop, stats


def build_nuts_kernel(vag_fn, max_depth=10):
    """Bind vag_fn/max_depth into a transition kernel:
    (q, logp, grad, key, eps, metric, max_depth_dyn) -> (q', logp', grad', stats)."""

    def kernel(q, logp, grad, key, eps, metric, max_depth_dyn=None):
        return nuts_transition(
            vag_fn, metric, eps, q, logp, grad, key, max_depth, max_depth_dyn
        )

    return kernel

"""NUTS sampling orchestrator.

Entry points (parity with reference sampler.ex:33,992,1186,69):

    sample(ir, ...)          — single chain
    sample_chains(ir, n, ...) — N chains, vmapped into ONE jitted program
    sample_stream(ir, cb, ...) — chunked draws streamed to a host callback

Where the reference runs chains as BEAM processes or a sequential
vectorized loop with shared warmup (sampler.ex:992-1176, D35), here the
whole pipeline — init-point search, find_reasonable_epsilon, 3-phase
warmup with per-chain adaptation, and the sampling scan — is one
``jit(vmap(...))``: 1024 chains cost one XLA dispatch total.

Warm-start (D71): pass ``warm_start=stats`` from a previous run and
warmup shrinks to a 50-iteration step-size fine-tune on the previous
``inv_mass``/``step_size`` (sampler.ex:176-198, 5.8x on refresh cycles).
"""

import hashlib
import warnings
from collections import OrderedDict
from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from exmc_tpu.compiler import CompiledModel, compile_logp, constrain_flat
from exmc_tpu.config import default_dtype
from exmc_tpu.dists.base import get as get_dist
from exmc_tpu.nuts.leapfrog import make_metric
from exmc_tpu.nuts.mass_matrix import (
    welford_finalize,
    welford_init,
    welford_merge_across,
    welford_update,
)
from exmc_tpu.nuts.step_size import (
    da_finalize,
    da_init,
    da_update,
    find_reasonable_epsilon,
)
from exmc_tpu.nuts.tree import nuts_transition
from exmc_tpu.nuts.warmup import build_schedule

DEFAULT_OPTS = dict(  # reference sampler.ex:16-23
    num_warmup=1000,
    num_samples=1000,
    max_tree_depth=10,
    target_accept=0.8,
    seed=0,
)

# chain i seed offset (reference sampler.ex:1083: base + i*7919)
CHAIN_SEED_STRIDE = 7919

FINE_TUNE_ITERS = 50  # warm-start fine-tune window (D71)


def _warn_if_rescued(rescues):
    """Visible notice when warmup ensemble rescue teleported chains
    (advisor r2: silent rescue can mask genuine minority modes)."""
    total = int(np.sum(rescues))
    if total > 0:
        warnings.warn(
            f"warmup ensemble rescue teleported chains {total} time(s) "
            "(stats['rescues'] has per-chain counts). If you are probing "
            "for multimodality, rerun with ensemble_rescue=False — "
            "rescue collapses far-separated minority modes during warmup.",
            stacklevel=3,
        )


def _init_position(key, d, dtype, radius=2.0):
    """Stan-style random init: z ~ Uniform(-r, r)^d in unconstrained space."""
    return jax.random.uniform(key, (d,), dtype, minval=-radius, maxval=radius)


def _find_valid_init(vag_fn, key, d, dtype, init_flat=None, max_tries=100):
    """Redraw the init point until logp is finite (bounded while_loop).

    The redraw radius SHRINKS geometrically (2.0 * 0.8^i, floored at
    1e-3): for long-T latent models the full Uniform(-2,2)^d box can be
    entirely non-finite in f32 (e.g. an NCP'd GRW path cumsums 5000
    uniform draws to |s| ~ 200, so exp(s) overflows for EVERY draw at
    the Stan radius), while small-radius points near the origin are
    always finite. Stan retries at a fixed radius and would spin here."""
    if init_flat is not None:
        q0 = jnp.asarray(init_flat, dtype)
    else:
        key, sub = jax.random.split(key)
        q0 = _init_position(sub, d, dtype)
    logp0, grad0 = vag_fn(q0)

    def cond(carry):
        q, logp, grad, key, i = carry
        bad = ~(jnp.isfinite(logp) & jnp.all(jnp.isfinite(grad)))
        return bad & (i < max_tries)

    def body(carry):
        q, logp, grad, key, i = carry
        key, sub = jax.random.split(key)
        radius = jnp.maximum(2.0 * 0.8 ** i.astype(dtype), 1e-3)
        q = _init_position(sub, d, dtype, radius)
        logp, grad = vag_fn(q)
        return q, logp, grad, key, i + 1

    q0, logp0, grad0, key, _ = jax.lax.while_loop(
        cond, body, (q0, logp0, grad0, key, jnp.zeros((), jnp.int32))
    )
    return q0, logp0, grad0, key


def _run_warmup(vag_fn, schedule, q0, logp0, grad0, key, metric0, target_accept,
                max_depth, eps0=None, adapt_mass=True):
    """Jitted (traceable) warmup for ONE chain; vmapped by the caller.

    Returns (q, logp, grad, key, eps_final, metric)."""
    dtype = q0.dtype
    d = q0.shape[0]
    dense = metric0.inv.ndim == 2

    key, eps_key = jax.random.split(key)
    if eps0 is None and schedule.num_warmup == 0:
        # degenerate: no warmup iterations to host the in-scan search
        eps0 = find_reasonable_epsilon(vag_fn, q0, logp0, grad0, eps_key, metric0)
    da0 = da_init(jnp.asarray(1.0 if eps0 is None else eps0, dtype))
    wf0 = welford_init(d, dense=dense, dtype=dtype)

    xs = (
        jnp.asarray(schedule.update_mass),
        jnp.asarray(schedule.window_end),
        jnp.asarray(schedule.depth_cap),
        jnp.asarray(_search_flags(schedule, eps0 is None)),
    )

    def step(carry, x):
        q, logp, grad, key, da, wf, metric = carry
        upd_mass, win_end, cap, search = x
        key, tkey, ekey = jax.random.split(key, 3)
        # epsilon (re-)search fires at iteration 0 and the iteration
        # after each mass window; ONE traced instance for the whole
        # pipeline (TODO r2: the init-time and window-end copies used to
        # trace find_reasonable_epsilon twice)
        da = jax.lax.cond(
            search,
            lambda _: da_init(find_reasonable_epsilon(
                vag_fn, q, logp, grad, ekey, metric)),
            lambda d_: d_,
            da,
        )
        eps = jnp.exp(da.log_eps)
        q, logp, grad, stats = nuts_transition(
            vag_fn, metric, eps, q, logp, grad, tkey, max_depth, cap
        )
        da = da_update(da, stats["accept_prob"], target_accept)
        if adapt_mass:
            # divergent draws excluded from Welford (D44)
            wf = welford_update(wf, q, enabled=upd_mass & ~stats["diverging"])

            def on_window_end(args):
                da, wf, metric = args
                inv = welford_finalize(wf, metric.inv)
                new_metric = make_metric(inv)
                # epsilon re-search happens at the START of the next
                # iteration (search flag), under this new metric
                return da, welford_init(d, dense=dense, dtype=dtype), new_metric

            da, wf, metric = jax.lax.cond(
                win_end, on_window_end, lambda a: a, (da, wf, metric)
            )
        return (q, logp, grad, key, da, wf, metric), None

    (q, logp, grad, key, da, wf, metric), _ = jax.lax.scan(
        step, (q0, logp0, grad0, key, da0, wf0, metric0), xs
    )
    eps_final = da_finalize(da)
    return q, logp, grad, key, eps_final, metric


def _search_flags(schedule, initial_search):
    """bool[num_warmup]: fire find_reasonable_epsilon at the START of an
    iteration — iteration 0 (unless warm-started) and the iteration
    after each mass-window end (the new metric is in place by then).
    Searching at next-iteration-start instead of window-end keeps ONE
    traced instance of the search loop in the whole pipeline."""
    n = schedule.num_warmup
    search = np.zeros(n, dtype=bool)
    if n == 0:
        return search
    search[1:] = schedule.window_end[:-1]
    search[0] = bool(initial_search)
    return search


def _pipeline_xs(schedule, num_samples, max_depth, initial_search=True,
                 emit_every=0):
    """Per-iteration control arrays for the unified warmup+sampling scan
    (host numpy; sliced into segments for chunked execution).

    ``emit_every=k`` flags every k-th POST-WARMUP iteration for per-draw
    host streaming (reference sample_stream emits after every draw,
    sampler.ex:1186-1276; k=1 matches it exactly). The flags are scan
    operands either way — with no emit_fn attached they are dead code
    XLA eliminates."""
    num_warmup = schedule.num_warmup
    pad = np.zeros(num_samples, dtype=bool)
    emit = np.zeros(num_warmup + num_samples, dtype=bool)
    if emit_every > 0:
        # flag BLOCK-END iterations (i % k == k-1): the streaming outer
        # scan emits the state after each k-iteration block, so the flag
        # of a block's last iteration decides whether that block's final
        # draw goes to the host (warmup blocks stay silent)
        i = np.arange(num_warmup + num_samples)
        emit = (i % emit_every == emit_every - 1) & (i >= num_warmup)
    draw_idx = np.concatenate(
        [np.zeros(num_warmup, np.int32), np.arange(num_samples, dtype=np.int32)]
    )
    return (
        np.concatenate([schedule.update_mass, pad]),
        np.concatenate([schedule.window_end, pad]),
        np.concatenate(
            [schedule.depth_cap, np.full(num_samples, max_depth, np.int32)]
        ),
        np.concatenate([np.ones(num_warmup, bool), pad]),
        np.concatenate([_search_flags(schedule, initial_search), pad]),
        # ensemble-rescue checkpoints: post-window iterations only (the
        # same shifted-window flags as the eps search, minus iteration 0
        # where cross-chain logp spread is natural init diversity)
        np.concatenate([_search_flags(schedule, False), pad]),
        emit,
        draw_idx,
    )


def _pipeline_init(vag_fn, q0, logp0, grad0, key, metric0, eps0, d, dtype,
                   dense, init_search=False):
    key, eps_key = jax.random.split(key)
    if eps0 is None and init_search:
        # only for schedules with no warmup iterations to host the
        # in-scan search (see _search_flags)
        eps0 = find_reasonable_epsilon(vag_fn, q0, logp0, grad0, eps_key, metric0)
    da0 = da_init(jnp.asarray(1.0 if eps0 is None else eps0, dtype))
    wf0 = welford_init(d, dense=dense, dtype=dtype)
    recoveries0 = jnp.zeros((), jnp.int32)
    rescues0 = jnp.zeros((), jnp.int32)
    return (q0, logp0, grad0, key, da0, wf0, metric0, recoveries0, rescues0)


def _pipeline_segment(vag_fn, carry, xs, target_accept, max_depth,
                      adapt_mass, d, dtype, dense, pool_axis=None,
                      interweave_fn=None, rescue_axis=None,
                      freeze_mask=None, cond_metric_fn=None):
    """Scan a segment of the unified pipeline; carry threads across
    segments so execution can be chunked into bounded device calls.

    ``pool_axis``: a vmap axis name — when set, Welford moments are
    merged across ALL chains at each window end before finalizing
    (pooled adaptation; see welford_merge_across). The window-end
    predicate comes from the shared (unbatched) schedule, so the cond
    fires uniformly across the batch and the collective is safe.

    ``rescue_axis``: a vmap axis name — when set, warmup ENSEMBLE
    RESCUE runs at each post-window checkpoint: chains whose logp sits
    far below the cross-chain median (a robust MAD threshold; modes
    within ~50 nats are left alone) adopt the best chain's position
    (jittered) and its metric, then re-search eps from there. During
    warmup anything goes; this turns the vmap ensemble into a safety
    net against per-chain adaptation traps (e.g. the long-T SV frozen
    low-sigma basin) that no amount of per-chain tuning escapes —
    the TPU-native analogue of the reference's retry-failed-chains
    (distributed.ex:172-180), but for SOFT failures."""

    def step(carry, x):
        q, logp, grad, key, da, wf, metric, recoveries, rescues = carry
        upd_mass, win_end, cap, in_warmup, search, resc, emit, draw_idx = x
        key, tkey, ekey, rkey, rskey = jax.random.split(key, 5)
        if rescue_axis is not None:

            def do_rescue(args):
                q, logp, grad, metric, rescues = args
                logps = jax.lax.all_gather(logp, rescue_axis)
                n_chains = logps.shape[0]
                if n_chains < 5:
                    # too few chains to tell clusters apart: the 75th-
                    # percentile reference degenerates to the max chain,
                    # and a frozen-at-the-mode chain (~d/2 nats ABOVE
                    # the typical set) would capture the healthy ones
                    return args
                # Detector notes (calibrated on the T=5000 SV trap):
                # * reference = 75th-percentile chain, NOT the median —
                #   with half the ensemble trapped, median/MAD sit in
                #   the gap and never flag anything; NOT the max — a
                #   frozen-at-the-mode chain sits ~d/2 nats ABOVE the
                #   typical set and would flag every healthy chain.
                # * threshold scales with sqrt(d): per-draw logp
                #   fluctuates with sd ~sqrt(d/2) in the typical set
                #   (measured 50 nats at d=5002, exactly sqrt(d/2)), so
                #   a fixed 50-nat gap misfires in high dimension; the
                #   T=5000 trap basins sit 140-290 nats below the
                #   healthy cluster, so 1.5*sqrt(d) (~106) separates
                #   them while a false positive merely teleports a
                #   healthy chain onto another healthy chain mid-warmup
                #   (harmless).
                # * never rescue a majority: if more than half the
                #   ensemble sits below the threshold there is no
                #   evidence WHICH cluster is right.
                order = jnp.argsort(logps)
                ref_idx = order[int(np.ceil(0.75 * (n_chains - 1)))]
                ref = logps[ref_idx]
                thresh = ref - jnp.maximum(50.0, 1.5 * np.sqrt(d))
                bad_all = logps < thresh
                frac = jnp.mean(bad_all.astype(q.dtype))
                bad = (logp < thresh) & (frac <= 0.5)
                donor = ref_idx  # a typical healthy chain, not the max
                donor_q = jax.lax.all_gather(q, rescue_axis)[donor]
                q_new = jnp.where(
                    bad,
                    donor_q + 0.01 * jax.random.normal(rskey, q.shape, q.dtype),
                    q,
                )
                logp_new, grad_new = vag_fn(q_new)
                donor_inv = jax.lax.all_gather(metric.inv, rescue_axis)[donor]
                inv_new = jnp.where(bad, donor_inv, metric.inv)
                return (q_new, logp_new, grad_new, make_metric(inv_new),
                        rescues + bad.astype(jnp.int32))

            q, logp, grad, metric, rescues = jax.lax.cond(
                resc, do_rescue, lambda a: a, (q, logp, grad, metric, rescues)
            )
        # gibbs_scales conditional preconditioning: override the
        # frozen-scale group latents' inverse mass with the analytic
        # conditional variance given the CURRENT scale value (constant
        # within the trajectory because the scale is frozen; see
        # interweave.build_conditional_metric)
        metric_t = metric
        if cond_metric_fn is not None:
            metric_t = make_metric(cond_metric_fn(q, metric.inv))
        # epsilon (re-)search at iteration starts flagged by the
        # schedule (iteration 0 + post-window); one traced instance of
        # find_reasonable_epsilon per pipeline (TODO r2 compile latency)
        da = jax.lax.cond(
            search,
            lambda _: da_init(find_reasonable_epsilon(
                vag_fn, q, logp, grad, ekey, metric_t)),
            lambda d_: d_,
            da,
        )
        eps = jnp.where(in_warmup, jnp.exp(da.log_eps), da_finalize(da))
        q, logp, grad, stats = nuts_transition(
            vag_fn, metric_t, eps, q, logp, grad, tkey, max_depth, cap
        )
        # chain-level fault recovery (reference distributed.ex:172-180
        # retries failed chains on the coordinator; here a dead carry —
        # non-finite accepted state, which divergence semantics cannot
        # absorb — re-initializes IN-KERNEL during warmup and is counted).
        # Cost: one extra vag eval per iteration, ~2^-depth of the
        # transition's work.
        dead = ~(jnp.isfinite(logp) & jnp.all(jnp.isfinite(q)))
        # reset near the origin: the unconstrained origin-neighbourhood
        # is finite for every model whose init search succeeded
        q_fresh = _init_position(rkey, q.shape[0], q.dtype, radius=0.1)
        logp_f, grad_f = vag_fn(q_fresh)
        do_reset = dead & in_warmup
        q = jnp.where(do_reset, q_fresh, q)
        logp = jnp.where(do_reset, logp_f, logp)
        grad = jnp.where(do_reset, grad_f, grad)
        recoveries = recoveries + do_reset.astype(jnp.int32)
        # ASIS interweaving (nuts/interweave.py): one centered-
        # parameterization Gibbs update of each eligible NCP scale after
        # every transition; the fiber move keeps the reconstructed
        # latents fixed, so only (z, sigma) coordinates change and one
        # vag re-evaluation refreshes the carry
        iw_acc = None
        if interweave_fn is not None:
            key, iwkey = jax.random.split(key)
            logp_pre_iw = logp
            q, iw_acc = interweave_fn(q, iwkey)
            logp, grad = vag_fn(q)
            # stats["energy"] is kinetic - logp at the accepted point
            # (tree.py: -joint_prop). The recorded draw is
            # POST-interweave, so shift the potential term by the
            # interweave's logp delta: E-BFMI then reads the energy of
            # the state the chain actually continues from, and the
            # invariant energy + logp == kinetic >= 0 holds for the
            # recorded pair (pinned by test_interweave energy test).
            stats = dict(stats, energy=stats["energy"] - (logp - logp_pre_iw))
        # NOTE: the dual-averaging signal stays PER-CHAIN even under
        # pooled mass adaptation — pooling it (pmean of accept_prob) was
        # measured to raise the divergence rate ~27x on eight_schools
        # (0.0003 -> 0.0073): per-chain eps absorbs chain heterogeneity
        # that the pooled mass matrix cannot.
        da_new = da_update(da, stats["accept_prob"], target_accept)
        da = jax.tree.map(
            lambda new, old: jnp.where(in_warmup, new, old), da_new, da
        )
        if adapt_mass:
            # divergent draws excluded from Welford (D44)
            wf = welford_update(wf, q, enabled=upd_mass & ~stats["diverging"])

            def on_window_end(args):
                da, wf, metric = args
                wf_eff = (
                    welford_merge_across(wf, pool_axis) if pool_axis else wf
                )
                inv = welford_finalize(wf_eff, metric.inv)
                if freeze_mask is not None:
                    # gibbs_scales: the frozen scale coordinates DO vary
                    # across draws (the interweave Gibbs legs move them),
                    # so Welford estimates a nonzero variance — re-zero
                    # their inverse mass to keep them out of the dynamics
                    inv = inv * jnp.asarray(freeze_mask, inv.dtype)
                new_metric = make_metric(inv)
                # epsilon re-search fires at the START of the next
                # iteration (search flag) under this new metric
                # (sampler.ex:668-762 semantics, one traced search)
                return (
                    da,
                    welford_init(d, dense=dense, dtype=dtype),
                    new_metric,
                )

            da, wf, metric = jax.lax.cond(
                win_end, on_window_end, lambda a: a, (da, wf, metric)
            )
        out_stats = dict(stats, logp=logp, step_size=eps)
        if iw_acc is not None:
            out_stats["iw_accept"] = iw_acc
        return (q, logp, grad, key, da, wf, metric, recoveries,
                rescues), (q, out_stats)

    return jax.lax.scan(step, carry, xs)


def _run_unified(vag_fn, schedule, num_samples, q0, logp0, grad0, key, metric0,
                 target_accept, max_depth, eps0=None, adapt_mass=True,
                 pool_axis=None, interweave_fn=None, rescue_axis=None,
                 freeze_mask=None, cond_metric_fn=None):
    """Warmup + sampling as ONE scan (one chain; vmapped by the caller).

    The tree kernel is the largest traced subprogram; tracing it once
    for a combined scan instead of once per phase roughly halves XLA
    compile time for the full pipeline. Per-iteration booleans gate the
    adaptation: dual-averaging updates and mass windows only fire while
    ``in_warmup``; afterwards eps freezes at exp(log_eps_bar)
    (= da_finalize) and the metric stays at its last window value.

    Returns (draws[num_samples], stats, eps_final, metric)."""
    dtype = q0.dtype
    d = q0.shape[0]
    dense = metric0.inv.ndim == 2
    num_warmup = schedule.num_warmup

    carry = _pipeline_init(
        vag_fn, q0, logp0, grad0, key, metric0, eps0, d, dtype, dense,
        init_search=(num_warmup == 0),
    )
    xs = jax.tree.map(jnp.asarray, _pipeline_xs(
        schedule, num_samples, max_depth, initial_search=(eps0 is None)
    ))
    carry, (draws, stats) = _pipeline_segment(
        vag_fn, carry, xs, target_accept, max_depth, adapt_mass, d, dtype,
        dense, pool_axis=pool_axis, interweave_fn=interweave_fn,
        rescue_axis=rescue_axis, freeze_mask=freeze_mask,
        cond_metric_fn=cond_metric_fn,
    )
    da, metric, recoveries, rescues = (
        carry[4], carry[6], carry[7], carry[8]
    )
    draws = draws[num_warmup:]
    stats = jax.tree.map(lambda a: a[num_warmup:], stats)
    return draws, stats, da_finalize(da), metric, recoveries, rescues


def _run_sampling(vag_fn, num_samples, q, logp, grad, key, eps, metric, max_depth):
    """Sampling scan for one chain; collects unconstrained draws + stats."""

    def step(carry, _):
        q, logp, grad, key = carry
        key, tkey = jax.random.split(key)
        q, logp, grad, stats = nuts_transition(
            vag_fn, metric, eps, q, logp, grad, tkey, max_depth
        )
        stats = dict(stats, logp=logp)
        return (q, logp, grad, key), (q, stats)

    (q, logp, grad, key), (draws, stats) = jax.lax.scan(
        step, (q, logp, grad, key), None, length=num_samples
    )
    return draws, stats, (q, logp, grad, key)


@dataclass
class NUTSSampler:
    """Compiled, reusable sampler. Construction compiles the model; the
    jitted run function is cached so repeated runs (warm-start refresh
    cycles, streaming chunks) skip retracing."""

    model: CompiledModel
    num_warmup: int = DEFAULT_OPTS["num_warmup"]
    num_samples: int = DEFAULT_OPTS["num_samples"]
    max_tree_depth: int = DEFAULT_OPTS["max_tree_depth"]
    target_accept: float = DEFAULT_OPTS["target_accept"]
    dense_mass: bool = False
    shared_warmup: bool = False
    pooled_adaptation: bool = False  # merge Welford across chains at window
    #                                  ends (TPU-native; see welford_merge_across)
    vag_builder: object = None  # optional data -> vag_fn override; the
    #                             sp-sharded-likelihood hook
    #                             (parallel/sharding.make_data_parallel_vag)
    interweave: bool = False  # ASIS scale updates after each transition
    #                           (nuts/interweave.py; weak-identification
    #                           state-space models)
    gibbs_scales: bool = False  # NUTS-within-Gibbs: FREEZE the
    #                             interweave-eligible scale coordinates in
    #                             the NUTS dynamics (inverse mass 0 — see
    #                             leapfrog.sample_momentum) so the tree
    #                             integrates the conditional given the
    #                             scales, which for hierarchical-Normal
    #                             groups is Gaussian (no funnel, no
    #                             divergences); the scales move ONLY via
    #                             the interweave Gibbs legs. Requires
    #                             interweave=True.
    ensemble_rescue: bool = True  # warmup-only cross-chain rescue of
    #                               adaptation-trapped chains (see
    #                               _pipeline_segment)
    adapt_mass: bool = True  # False: keep the initial metric (identity,
    #                          or the analytic spectral init for GRW
    #                          blocks) and adapt step size only
    stream_cb: object = None  # host callback(draw_idx, point, stats) for
    #                           per-draw streaming (io_callback inside the
    #                           sampling scan; reference sample_stream,
    #                           sampler.ex:1186-1276)
    stream_every: int = 1  # emit every k-th post-warmup draw

    def __post_init__(self):
        if self.shared_warmup and self.pooled_adaptation:
            raise ValueError(
                "shared_warmup and pooled_adaptation are mutually exclusive: "
                "shared warmup adapts on chain 0 only, pooling needs all "
                "chains' warmup to run"
            )
        self._iw_fn = None
        if self.interweave:
            if self.shared_warmup:
                raise ValueError(
                    "interweave requires the per-chain pipeline "
                    "(shared_warmup=False)"
                )
            from exmc_tpu.nuts.interweave import build_interweave

            self._iw_fn = build_interweave(self.model)
            if self._iw_fn is None:
                raise ValueError(
                    "interweave=True but no eligible NCP scale parameters "
                    "were found (need a scalar free-RV scale referenced "
                    "only as the NCP sigma of Normal/GRW latents; did you "
                    "compile with ncp=False?)"
                )
        self._freeze_mask = None
        self._cond_metric_fn = None
        if self.gibbs_scales:
            if not self.interweave:
                raise ValueError(
                    "gibbs_scales=True requires interweave=True: frozen "
                    "scales move only via the interweave Gibbs legs"
                )
            if self.dense_mass:
                raise ValueError(
                    "gibbs_scales is diag-metric only (freezing is an "
                    "inverse-mass zero on the scale coordinate)"
                )
            from exmc_tpu.nuts.interweave import (
                build_conditional_metric,
                eligible_groups,
            )

            mask = np.ones(self.model.size, np.float64)
            frozen = set()
            for g in eligible_groups(self.model):
                kinds = {z[2] for z in g["zs"]}
                # freeze ONLY scales with a sound Gibbs path: an
                # ancillary leg (full ASIS pair) or a pure obs-noise
                # conditional. A sufficient-leg-only group frozen
                # without the conditional metric was measured badly
                # miscalibrated (SBC: tau ECDF p=0.0, 8.7% divergences)
                # — leave such scales in the NUTS dynamics instead.
                if g.get("anc_mode") is None and kinds != {"obs_noise"}:
                    warnings.warn(
                        f"gibbs_scales: scale {g['sigma_id']!r} has no "
                        "ancillary Gibbs leg (observations unavailable "
                        "or non-Normal) — leaving it UNFROZEN; it keeps "
                        "mixing via NUTS + the sufficient interweave "
                        "move", stacklevel=2)
                    continue
                mask[g["offset"]] = 0.0
                frozen.add(g["offset"])
            self._freeze_mask = mask if frozen else None
            self._cond_metric_fn = build_conditional_metric(
                self.model, frozen_offsets=frozen) if frozen else None
        self._schedule = build_schedule(self.num_warmup, self.max_tree_depth)
        self._ft_schedule = build_schedule(
            FINE_TUNE_ITERS, self.max_tree_depth, init_buffer=FINE_TUNE_ITERS,
            term_buffer=0, early_cap_iters=0,
        )
        self._run_jit = jax.jit(
            self._run, static_argnames=("num_chains", "warm_started")
        )

    def _aot_key_parts(self):
        """(ir signature, cache dir or None, options tuple) for the AOT
        executable cache (D-T35). The options come from
        ``_SAMPLER_OPT_KEYS`` — the single list of compile-relevant
        sampler options — so a future option cannot be added to the
        sampler without entering the key. The disk cache is disabled
        when the IR's fingerprint is unstable (components hashed by
        per-process object identity) or for the sp-sharded vag path
        (vag_builder closures are not part of the key)."""
        from exmc_tpu.config import aot_cache_dir, program_tunables

        sig, stable = ir_fingerprint(self.model.ir)
        cdir = (aot_cache_dir()
                if stable and self.vag_builder is None else None)
        opts = tuple((k, getattr(self, k)) for k in _SAMPLER_OPT_KEYS)
        # call-time-resolved globals (e.g. marginal._BLOCK) change the
        # traced program without appearing in IR or options — a fast-key
        # hit never re-lowers, so they must enter the key here
        return sig, cdir, opts + program_tunables()

    # ---- traced pipeline ----

    def _iw_bound(self, data):
        """The interweave step with the runtime data channel bound:
        obs values riding the __obs_data JIT argument (D69) resolve
        inside the Gibbs legs from THIS run's data pytree."""
        if self._iw_fn is None:
            return None
        fn = self._iw_fn
        return lambda q, k: fn(q, k, data)

    def _vag(self, data):
        if self.vag_builder is not None:
            return self.vag_builder(data)
        vag = self.model.value_and_grad

        def fn(q):
            return vag(q, data)

        return fn

    def _init_metric(self, dtype):
        # NOTE (measured negative result, SV T=5000): an ANALYTIC
        # initial inverse-mass for spectral GRW blocks — var(w_k) ~
        # 1/(1 + sigma_hat^2 lambda_k) from the closed-form cumsum-gram
        # eigenvalues and the scale's prior median — was tried and
        # REVERTED. Its constant-curvature premise fails exactly where
        # it matters: an exp(s) volatility link makes the likelihood
        # curvature position-dependent over ~e^6, no constant metric
        # captures it, and the run regressed (nu R-hat 1.7 -> 31).
        # Welford from the identity init, plus interweave + ensemble
        # rescue, is the honest recipe; slow per-draw mixing at d~5000
        # weak identification is paid in draws, not hidden.
        d = self.model.size
        if self.dense_mass:
            return make_metric(jnp.eye(d, dtype=dtype))
        inv = jnp.ones((d,), dtype=dtype)
        if self._freeze_mask is not None:
            inv = inv * jnp.asarray(self._freeze_mask, dtype)
        return make_metric(inv)

    def _resolve_inits(self, init, num_chains, base, d, dtype, data):
        """Per-chain unconstrained init positions: a named dict (all
        chains start there), ``"pathfinder"`` (multi-path ELBO-raced
        mode-finding draws — the defence against spurious posterior
        modes), ``("superchain", K)`` (K superchains x M chains where
        every chain in a superchain SHARES one random init — the
        construction nested R-hat needs to detect non-stationarity in
        the many-short-chains regime, Margossian 2022; consecutive
        grouping matches diagnostics.nested_rhat), or None (Stan-style
        random box, drawn per chain)."""
        if (isinstance(init, tuple) and len(init) == 2
                and init[0] == "superchain"):
            k = int(init[1])
            if num_chains % k != 0:
                raise ValueError(
                    f"superchain init: num_chains ({num_chains}) not "
                    f"divisible by num_superchains ({k})"
                )
            m = num_chains // k
            init_keys = jax.vmap(jax.random.fold_in, (None, 0))(
                jax.random.fold_in(base, 10_000_019), jnp.arange(k)
            )
            qs = jax.vmap(lambda kk: _init_position(kk, d, dtype))(init_keys)
            return jnp.repeat(qs, m, axis=0)
        if isinstance(init, str):
            if init != "pathfinder":
                raise ValueError(f"unknown init mode {init!r} "
                                 "(expected 'pathfinder' or a named dict)")
            from exmc_tpu.pathfinder import pathfinder_init

            q = pathfinder_init(self.model, num_chains,
                                seed=int(jax.random.randint(
                                    base, (), 0, 2**31 - 1)),
                                data=data)
            return jnp.asarray(q, dtype)
        if init is not None:
            if isinstance(init, (np.ndarray, jnp.ndarray)):
                # per-chain UNCONSTRAINED positions, shape (num_chains, d)
                # — for overdispersed warm starts (e.g. draws from an
                # INLA grid or a prior fit) where a single broadcast
                # point would defeat R-hat's init-diversity requirement
                q0 = jnp.asarray(init, dtype)
                if q0.shape != (num_chains, d):
                    raise ValueError(
                        f"array init must have shape (num_chains, d) = "
                        f"({num_chains}, {d}), got {q0.shape}"
                    )
                return q0
            flat0 = self.model.unconstrain(init).astype(dtype)
            return jnp.broadcast_to(flat0, (num_chains, d))
        init_keys = jax.vmap(jax.random.fold_in, (None, 0))(
            jax.random.fold_in(base, 10_000_019), jnp.arange(num_chains)
        )
        return jax.vmap(lambda k: _init_position(k, d, dtype))(init_keys)

    def _emit_fn(self, data):
        """Traced per-draw emitter: constrain the (chains, d) batch ON
        DEVICE, then hand (draw_idx, constrained point, stats) to the
        host via an io_callback. Called OUTSIDE the chain vmap (an IO
        effect under vmap fires once per batch element; the streaming
        runner keeps its outer scan above the vmap instead) — ``ordered``
        so emissions arrive in draw order."""
        if self.stream_cb is None:
            return None
        from jax.experimental import io_callback

        user_cb = self.stream_cb
        model = self.model

        def host_cb(emit, draw_idx, point, stats):
            if not bool(np.asarray(emit).reshape(-1)[0]):
                return  # warmup or padding block — stay silent
            idx = int(np.asarray(draw_idx).reshape(-1)[0])
            user_cb(idx, {k: np.asarray(v) for k, v in point.items()},
                    {k: np.asarray(v) for k, v in stats.items()})

        def emit(emit_flag, draw_idx, q_batch, stats):
            point = jax.vmap(
                lambda q: constrain_flat(model.ir, model.pm, q, data)
            )(q_batch)
            small = {k: stats[k] for k in
                     ("logp", "accept_prob", "diverging", "energy",
                      "tree_depth", "step_size") if k in stats}
            io_callback(host_cb, None, emit_flag, draw_idx, point, small,
                        ordered=True)

        return emit

    def _run_stream(self, data, q_inits, keys, *, num_chains):
        """Streaming runner (reference sample_stream per-draw messages,
        sampler.ex:1186-1276): identical pipeline math to ``_run``, but
        the scan over iterations is SPLIT — an outer ``lax.scan`` over
        blocks of ``stream_every`` iterations sits ABOVE the chain vmap,
        and one io_callback per block ships the block-final batched
        state to the host. Still ONE device call for the whole run."""
        dtype = default_dtype()
        d = self.model.size
        vag_fn = self._vag(data)
        schedule = self._schedule
        k = self.stream_every
        emit_fn = self._emit_fn(data)
        pool_axis = "chains" if self.pooled_adaptation else None
        rescue_axis = "chains" if self.ensemble_rescue else None
        dense = self.dense_mass

        xs_np = _pipeline_xs(schedule, self.num_samples, self.max_tree_depth,
                             emit_every=k)
        total = xs_np[0].shape[0]
        pad_n = (k - total % k) % k
        if pad_n:
            # inert extra transitions: no warmup, no adaptation, never
            # emitted, outputs discarded below
            def _pad(a):
                fill = (np.full(pad_n, self.max_tree_depth, a.dtype)
                        if a.dtype != np.bool_ else np.zeros(pad_n, a.dtype))
                return np.concatenate([a, fill])
            xs_np = tuple(_pad(a) for a in xs_np)
        xs = jax.tree.map(
            lambda a: jnp.asarray(a).reshape(((total + pad_n) // k, k)
                                             + a.shape[1:]),
            tuple(np.asarray(a) for a in xs_np),
        )

        def init_one(qi, key):
            q0, logp0, grad0, key = _find_valid_init(vag_fn, key, d, dtype, qi)
            return _pipeline_init(
                vag_fn, q0, logp0, grad0, key, self._init_metric(dtype), None,
                d, dtype, dense, init_search=(schedule.num_warmup == 0),
            )

        def seg(c, x_blk):
            return _pipeline_segment(
                vag_fn, c, x_blk, self.target_accept, self.max_tree_depth,
                self.adapt_mass, d, dtype, dense, pool_axis=pool_axis,
                interweave_fn=self._iw_bound(data), rescue_axis=rescue_axis,
                freeze_mask=self._freeze_mask,
                cond_metric_fn=self._cond_metric_fn,
            )

        @jax.jit
        def go(q_inits, keys):
            carry = jax.vmap(init_one)(q_inits, keys)

            def outer(carry, x_blk):
                carry, (q_blk, stats_blk) = jax.vmap(
                    seg, in_axes=(0, None), axis_name="chains"
                )(carry, x_blk)
                last_stats = jax.tree.map(lambda a: a[:, -1], stats_blk)
                emit_fn(x_blk[6][-1], x_blk[7][-1], q_blk[:, -1], last_stats)
                return carry, (q_blk, stats_blk)

            carry, (draws, stats) = jax.lax.scan(outer, carry, xs)
            # (blocks, chains, k, ...) -> (chains, blocks*k, ...)
            def _flat(a):
                a = jnp.moveaxis(a, 1, 0)
                return a.reshape((num_chains, -1) + a.shape[3:])
            draws = _flat(draws)[:, schedule.num_warmup:total]
            stats = jax.tree.map(
                lambda a: _flat(a)[:, schedule.num_warmup:total], stats
            )
            da, metric, recov, resc = (
                carry[4], carry[6], carry[7], carry[8]
            )
            tuning = {"step_size": jax.vmap(da_finalize)(da),
                      "inv_mass": metric.inv,
                      "recoveries": recov, "rescues": resc}
            return draws, stats, tuning

        return go(q_inits, keys)

    def _one_chain(self, data, q_init, key, warm_started, ws_eps, ws_inv):
        dtype = default_dtype()
        vag_fn = self._vag(data)
        d = self.model.size
        q0, logp0, grad0, key = _find_valid_init(vag_fn, key, d, dtype, q_init)

        pool_axis = "chains" if self.pooled_adaptation else None
        rescue_axis = "chains" if self.ensemble_rescue else None
        if warm_started:
            if self._freeze_mask is not None:
                # warm tuning may come from a non-gibbs run whose
                # inv_mass has nonzero scale entries — re-freeze them
                # (metric validity requires the frozen coordinates to
                # stay frozen, D-T28)
                ws_inv = ws_inv * jnp.asarray(self._freeze_mask,
                                              ws_inv.dtype)
            metric = make_metric(ws_inv)
            draws, stats, eps, metric, recov, resc = _run_unified(
                vag_fn, self._ft_schedule, self.num_samples, q0, logp0,
                grad0, key, metric, self.target_accept, self.max_tree_depth,
                eps0=ws_eps, adapt_mass=False,
                interweave_fn=self._iw_bound(data),
                freeze_mask=self._freeze_mask,
                cond_metric_fn=self._cond_metric_fn,
            )
        else:
            metric = self._init_metric(dtype)
            draws, stats, eps, metric, recov, resc = _run_unified(
                vag_fn, self._schedule, self.num_samples, q0, logp0, grad0,
                key, metric, self.target_accept, self.max_tree_depth,
                pool_axis=pool_axis, interweave_fn=self._iw_bound(data),
                rescue_axis=rescue_axis, adapt_mass=self.adapt_mass,
                freeze_mask=self._freeze_mask,
                cond_metric_fn=self._cond_metric_fn,
            )

        tuning = {"step_size": eps, "inv_mass": metric.inv,
                  "recoveries": recov, "rescues": resc}
        return draws, stats, tuning

    def _run(self, data, q_inits, keys, ws_eps, ws_inv, *, num_chains, warm_started):
        one = partial(self._one_chain, data)
        if self.shared_warmup and not warm_started:
            # warmup on chain 0 only, broadcast tuning
            # (reference sampler.ex:1020-1135 vectorized shared-warmup path)
            dtype = default_dtype()
            vag_fn = self._vag(data)
            d = self.model.size
            q0, logp0, grad0, k0 = _find_valid_init(
                vag_fn, keys[0], d, dtype, q_inits[0] if q_inits is not None else None
            )
            metric = self._init_metric(dtype)
            _, _, _, _, eps, metric = _run_warmup(
                vag_fn, self._schedule, q0, logp0, grad0, k0,
                metric, self.target_accept, self.max_tree_depth,
            )

            def sample_only(q_init, key):
                # decorrelate from the warmup key stream: chain 0's key
                # was consumed by warmup above, and split-prefix reuse
                # would replay the warmup's transition randomness
                key = jax.random.fold_in(key, 777_000_111)
                q0, logp0, grad0, key = _find_valid_init(vag_fn, key, d, dtype, q_init)
                draws, stats, _ = _run_sampling(
                    vag_fn, self.num_samples, q0, logp0, grad0, key, eps, metric,
                    self.max_tree_depth,
                )
                tuning = {"step_size": eps, "inv_mass": metric.inv,
                          "recoveries": jnp.zeros((), jnp.int32),
                          "rescues": jnp.zeros((), jnp.int32)}
                return draws, stats, tuning

            return jax.vmap(sample_only)(q_inits, keys)
        return jax.vmap(
            lambda qi, k, we, wi: one(qi, k, warm_started, we, wi),
            axis_name="chains",
        )(q_inits, keys, ws_eps, ws_inv)

    # ---- host-side API ----

    def run(self, num_chains=1, seed=0, init=None, warm_start=None, data=None,
            return_unconstrained=False):
        dtype = default_dtype()
        d = self.model.size
        if d == 0:
            # degenerate no-free-params model (reference sampler.ex:141-152)
            return {}, {"note": "model has no free parameters"}
        if data is None:
            data = self.model.data

        base = jax.random.PRNGKey(seed)
        keys = jax.vmap(lambda i: jax.random.fold_in(base, i * CHAIN_SEED_STRIDE))(
            jnp.arange(num_chains)
        )

        q_inits = self._resolve_inits(init, num_chains, base, d, dtype, data)

        warm_started = warm_start is not None
        if warm_started:
            ws_eps = jnp.broadcast_to(
                jnp.asarray(warm_start["step_size"], dtype), (num_chains,)
            )
            inv = jnp.asarray(warm_start["inv_mass"], dtype)
            ws_inv = jnp.broadcast_to(inv, (num_chains,) + inv.shape[-(2 if self.dense_mass else 1):])
        else:
            ws_eps = jnp.ones((num_chains,), dtype)
            ws_inv = (
                jnp.broadcast_to(jnp.eye(d, dtype=dtype), (num_chains, d, d))
                if self.dense_mass
                else jnp.ones((num_chains, d), dtype)
            )

        if self.stream_cb is not None:
            if warm_started:
                raise ValueError(
                    "per-draw streaming does not support warm_start"
                )
            if self.shared_warmup:
                raise ValueError(
                    "per-draw io_callback streaming requires the "
                    "per-chain pipeline (shared_warmup=False)"
                )
            try:
                draws, stats, tuning = self._run_stream(
                    data, q_inits, keys, num_chains=num_chains
                )
            except jax.errors.JaxRuntimeError as e:  # pragma: no cover
                raise RuntimeError(
                    "per-draw streaming failed to compile on this "
                    "backend — remote-compile TPU services may not "
                    "support host callbacks (measured: the axon tunnel "
                    "rejects/hangs on io_callback programs). Use the "
                    "chunked mode instead: sample_stream(..., "
                    "chunk_size=k) without `every`."
                ) from e
        else:
            from exmc_tpu import aot

            args = (data, q_inits, keys, ws_eps, ws_inv)
            static_kw = dict(num_chains=num_chains,
                             warm_started=warm_started)
            sig, cdir, opts = self._aot_key_parts()
            draws, stats, tuning = aot.call(
                self._run_jit, args, static_kw,
                ("nuts_run", sig) + opts, cdir)

        stats = {k: np.asarray(v) for k, v in stats.items()}
        stats["step_size"] = np.asarray(tuning["step_size"])
        stats["inv_mass"] = np.asarray(tuning["inv_mass"])
        stats["recoveries"] = np.asarray(tuning["recoveries"])
        stats["rescues"] = np.asarray(tuning["rescues"])
        stats["divergences"] = stats["diverging"].sum(axis=-1)
        _warn_if_rescued(stats["rescues"])

        if return_unconstrained:
            return np.asarray(draws), stats
        trace = self.constrain_trace(draws, data)
        return trace, stats

    def run_chunked(self, num_chains=1, chunk_iters=200, seed=0, init=None,
                    data=None, return_unconstrained=False, progress=False,
                    callback=None, checkpoint_path=None, resume_from=None):
        """Run the same pipeline as ``run`` but in bounded device calls of
        ``chunk_iters`` iterations, threading the scan carry across calls.

        Use for pathological models where vmap-lockstep trees keep every
        transition at max depth (e.g. the funnel): a single device call
        covering 2000 iterations can run for >10 minutes, which trips
        runtime watchdogs — chunking bounds each call.

        The final chunk is PADDED to ``chunk_iters`` and its outputs
        truncated, so the whole run compiles exactly one segment program
        (padding transitions cost microseconds; a second XLA compile
        costs seconds to minutes).

        ``callback(start_index, trace_chunk, stats_chunk)``: streaming
        hook invoked after each chunk that contains post-warmup draws
        (the TPU-granularity analogue of the reference's per-sample BEAM
        messages, sampler.ex:1186-1276).

        ``checkpoint_path``: save the FULL pipeline state (scan carry
        incl. rng keys + collected draws) after every chunk; a run
        killed mid-way resumes exactly via ``resume_from`` — the
        continuation is bit-identical to the uninterrupted run
        (reference analogue: warm-start D71, sampler.ex:176-198, but
        exact rather than approximate)."""
        dtype = default_dtype()
        d = self.model.size
        dense = self.dense_mass
        if data is None:
            data = self.model.data
        vag_fn = self._vag(data)

        base = jax.random.PRNGKey(seed)
        keys = jax.vmap(lambda i: jax.random.fold_in(base, i * CHAIN_SEED_STRIDE))(
            jnp.arange(num_chains)
        )
        q_inits = self._resolve_inits(init, num_chains, base, d, dtype, data)

        metric0 = self._init_metric(dtype)

        @jax.jit
        def init_fn(q_inits, keys):
            def one(qi, key):
                q0, logp0, grad0, key = _find_valid_init(vag_fn, key, d, dtype, qi)
                return _pipeline_init(
                    vag_fn, q0, logp0, grad0, key, metric0, None, d, dtype,
                    dense, init_search=(self._schedule.num_warmup == 0),
                )
            return jax.vmap(one)(q_inits, keys)

        pool_axis = "chains" if self.pooled_adaptation else None

        # AOT executable cache (D-T35). Unlike run(), the chunked
        # pipeline CLOSES over data (vag_fn bakes the values into the
        # program as constants), so the key must hash data VALUES —
        # shape-only keying would silently reuse an executable compiled
        # against different observations.
        from exmc_tpu import aot

        sig, _aot_dir, opts = self._aot_key_parts()
        _aot_base = (sig, _data_fingerprint(data), chunk_iters) + opts

        def seg(carry, xs):
            return _pipeline_segment(
                vag_fn, carry, xs, self.target_accept, self.max_tree_depth,
                self.adapt_mass, d, dtype, dense, pool_axis=pool_axis,
                interweave_fn=self._iw_bound(data),
                rescue_axis="chains" if self.ensemble_rescue else None,
                freeze_mask=self._freeze_mask,
                cond_metric_fn=self._cond_metric_fn,
            )

        seg_fn = jax.jit(jax.vmap(seg, in_axes=(0, None), axis_name="chains"))

        num_warmup = self._schedule.num_warmup
        xs_full = _pipeline_xs(self._schedule, self.num_samples,
                               self.max_tree_depth)
        total = xs_full[0].shape[0]

        if resume_from is not None:
            carry, done, draws_parts, stats_parts = self._load_chunk_state(
                resume_from, init_fn, q_inits, keys
            )
        else:
            carry = aot.call(init_fn, (q_inits, keys), {},
                             ("nuts_chunk_init",) + _aot_base, _aot_dir)
            draws_parts, stats_parts = [], []
            done = 0
        final_carry = carry

        def _pad(a, n):
            if n == 0:
                return jnp.asarray(a)
            # padded iterations: no adaptation, no warmup, full depth —
            # pure extra transitions whose outputs are discarded
            fill = (
                np.full(n, self.max_tree_depth, a.dtype)
                if a.dtype != np.bool_ else np.zeros(n, a.dtype)
            )
            return jnp.asarray(np.concatenate([a, fill]))

        while done < total:
            end = min(done + chunk_iters, total)
            pad_n = chunk_iters - (end - done)
            xs_chunk = tuple(_pad(a[done:end], pad_n) for a in xs_full)
            new_carry, (draws, stats) = aot.call(
                seg_fn, (carry, xs_chunk), {},
                ("nuts_chunk_seg",) + _aot_base, _aot_dir)
            if pad_n:
                draws = draws[:, : end - done]
                stats = jax.tree.map(lambda a: a[:, : end - done], stats)
            else:
                carry = new_carry
            # NOTE: when the final chunk is padded the PRE-pad carry is
            # kept for checkpointing (the padded transitions are not part
            # of the run); da/metric needed for final stats come from the
            # padded carry, which is identical for those fields
            # (in_warmup=False freezes them).
            final_carry = new_carry
            draws_parts.append(np.asarray(draws))
            stats_parts.append(jax.tree.map(np.asarray, stats))
            if callback is not None and end > num_warmup:
                s0 = max(done, num_warmup)
                off = s0 - done
                cb_draws = draws_parts[-1][:, off:]
                cb_stats = {k: v[:, off:] for k, v in stats_parts[-1].items()}
                if return_unconstrained:
                    callback(s0 - num_warmup, cb_draws, cb_stats)
                else:
                    callback(s0 - num_warmup,
                             self.constrain_trace(cb_draws, data), cb_stats)
            done = end
            if checkpoint_path is not None:
                self._save_chunk_state(
                    checkpoint_path, final_carry, done, draws_parts,
                    stats_parts,
                )
            if progress:
                print(f"  chunk {done}/{total}", flush=True)

        draws = np.concatenate(draws_parts, axis=1)[:, num_warmup:]
        stats = {
            k: np.concatenate([s[k] for s in stats_parts], axis=1)[
                :, num_warmup:
            ]
            for k in stats_parts[0]
        }
        da, metric = final_carry[4], final_carry[6]
        stats["step_size"] = np.asarray(jax.vmap(da_finalize)(da))
        stats["inv_mass"] = np.asarray(metric.inv)
        stats["recoveries"] = np.asarray(final_carry[7])
        stats["rescues"] = np.asarray(final_carry[8])
        stats["divergences"] = stats["diverging"].sum(axis=-1)
        _warn_if_rescued(stats["rescues"])
        if return_unconstrained:
            return draws, stats
        return self.constrain_trace(draws, data), stats

    # ---- mid-run checkpoint plumbing ----

    @staticmethod
    def _save_chunk_state(path, carry, done, draws_parts, stats_parts):
        """Serialize the scan carry (flattened pytree leaves), progress
        index, and collected outputs to one .npz."""
        leaves = jax.tree.leaves(carry)
        payload = {f"carry_{i}": np.asarray(v) for i, v in enumerate(leaves)}
        payload["done"] = np.asarray(done)
        payload["draws"] = np.concatenate(draws_parts, axis=1)
        merged = {
            k: np.concatenate([s[k] for s in stats_parts], axis=1)
            for k in stats_parts[0]
        }
        for k, v in merged.items():
            payload[f"stat_{k}"] = v
        np.savez(path, **payload)

    @staticmethod
    def _load_chunk_state(path, init_fn, q_inits, keys):
        """Restore (carry, done, draws_parts, stats_parts). The carry
        treedef comes from a template produced by ``init_fn`` (cheap,
        already compiled); leaves are replaced by the saved arrays."""
        with np.load(path) as z:
            files = {k: z[k] for k in z.files}
        template = init_fn(q_inits, keys)
        treedef = jax.tree.structure(template)
        tmpl_leaves = jax.tree.leaves(template)
        n = len(tmpl_leaves)
        leaves = [
            jnp.asarray(files[f"carry_{i}"]).astype(tmpl_leaves[i].dtype)
            for i in range(n)
        ]
        carry = jax.tree.unflatten(treedef, leaves)
        done = int(files["done"])
        draws_parts = [files["draws"]]
        stats_parts = [{
            k[len("stat_"):]: v for k, v in files.items()
            if k.startswith("stat_")
        }]
        return carry, done, draws_parts, stats_parts

    def constrain_trace(self, draws, data=None):
        """(chains, samples, d) unconstrained -> named constrained trace,
        vmapped on device (reference sampler.ex:1281-1348 builds this on
        the host per-entry). The jitted constrainer is cached on the
        sampler so streaming chunks don't retrace it."""
        if data is None:
            data = self.model.data
        if not hasattr(self, "_constrain_jit"):
            ir, pm = self.model.ir, self.model.pm
            self._constrain_jit = jax.jit(
                jax.vmap(jax.vmap(
                    lambda flat, data: constrain_flat(ir, pm, flat, data),
                    in_axes=(0, None)), in_axes=(0, None))
            )
        out = self._constrain_jit(jnp.asarray(draws), data)
        return {k: np.asarray(v) for k, v in out.items()}


# ---------------------------------------------------------------------------
# Pipeline cache: repeated sample() calls on a structurally identical model
# reuse the compiled NUTSSampler (and thereby its jitted pipelines) instead
# of rebuilding + retracing. This is the TPU analogue of the reference's
# dispatch-amortization lesson (DECISIONS D39/D40): XLA compiles are the
# per-call overhead to kill.
# ---------------------------------------------------------------------------

_SAMPLER_CACHE = OrderedDict()
_SAMPLER_CACHE_MAX = 8


def clear_sampler_cache():
    _SAMPLER_CACHE.clear()


def _hash_obj(h, x, state=None):
    """Feed one IR op component into the hash: array constants hash by
    value (they are baked into the traced program), registered dists by
    name, Custom dists and raw callables by their CODE plus closure
    VALUES — both determine the traced program, and the hash feeds the
    persistent AOT executable-cache key, so per-process object identity
    must not leak in. Anything that can only be identified by id()
    marks ``state["stable"] = False`` so callers skip the disk cache
    for that model."""
    import types

    from exmc_tpu.dists.base import Distribution
    from exmc_tpu.transforms import Transform

    def _unstable():
        if state is not None:
            state["stable"] = False

    if isinstance(x, np.ndarray):
        h.update(b"a")
        h.update(str((x.shape, str(x.dtype))).encode())
        h.update(np.ascontiguousarray(x).tobytes())
    elif isinstance(x, jnp.ndarray):
        _hash_obj(h, np.asarray(x), state)
    elif isinstance(x, (list, tuple)):
        h.update(b"l")
        for e in x:
            _hash_obj(h, e, state)
    elif isinstance(x, dict):
        h.update(b"d")
        for k in sorted(x, key=repr):
            _hash_obj(h, k, state)
            _hash_obj(h, x[k], state)
    elif isinstance(x, Distribution):
        if hasattr(x, "logpdf_fn"):
            # Custom: the logpdf code + closure ARE the program
            h.update(b"custom")
            for part in (x.logpdf_fn, getattr(x, "support", None),
                         getattr(x, "transform", None),
                         getattr(x, "sample_fn", None)):
                _hash_obj(h, part, state)
        else:
            h.update(f"dist:{x.name}".encode())
    elif isinstance(x, Transform):
        h.update(f"tf:{x.name}".encode())
        _hash_obj(h, {k: v for k, v in vars(x).items()}, state)
    elif isinstance(x, types.CodeType):
        h.update(b"co")
        h.update(x.co_code)
        h.update(repr(x.co_names).encode())
        _hash_obj(h, x.co_consts, state)
    elif isinstance(x, partial):
        h.update(b"pa")
        _hash_obj(h, (x.func, x.args, x.keywords), state)
    elif callable(x):
        code = getattr(x, "__code__", None)
        if code is None:  # builtin / C callable: identity is all we have
            h.update(f"fn{id(x)}".encode())
            _unstable()
        else:
            _hash_obj(h, code, state)
            _hash_obj(h, getattr(x, "__defaults__", None), state)
            for cell in (getattr(x, "__closure__", None) or ()):
                try:
                    contents = cell.cell_contents
                except ValueError:
                    contents = "<empty-cell>"
                _hash_obj(h, contents, state)
    else:
        r = repr(x)
        if " at 0x" in r:  # default object repr: address = identity
            _unstable()
        h.update(r.encode())


def _data_fingerprint(data) -> str:
    """sha256 over the data pytree's VALUES (not just shapes): the
    chunked pipeline closes over data, baking it into the compiled
    program as constants, so the AOT executable-cache key must change
    whenever observations do."""
    if data is None:
        return "none"
    h = hashlib.sha256()
    for leaf in jax.tree.leaves(data):
        arr = np.asarray(leaf)
        h.update(str(arr.shape).encode())
        h.update(str(arr.dtype).encode())
        h.update(arr.tobytes())
    return h.hexdigest()


def ir_fingerprint(ir):
    """(signature, stable): structural + constant signature of an IR.
    Two IRs with the same signature compile to the same XLA program:
    node structure, dist names, constant params, inline obs values, and
    Custom/callable CODE + closures hash by value; ``Builder.data``
    tensors hash by shape/dtype only (their values are JIT arguments,
    D69). ``stable`` is False when any component could only be hashed
    by per-process object identity — such signatures must not feed
    persistent (cross-process) cache keys."""
    h = hashlib.sha256()
    state = {"stable": True}
    for nid in sorted(ir.nodes):
        node = ir.nodes[nid]
        h.update(nid.encode())
        _hash_obj(h, node.op, state)
        _hash_obj(h, node.deps, state)
        _hash_obj(h, node.shape, state)
    if ir.data is not None:
        for leaf in jax.tree.leaves(ir.data):
            arr = np.asarray(leaf)
            h.update(f"data{arr.shape}{arr.dtype}".encode())
    return h.hexdigest(), state["stable"]


def ir_signature(ir) -> str:
    """The signature half of :func:`ir_fingerprint`."""
    return ir_fingerprint(ir)[0]


_SAMPLER_OPT_KEYS = (
    "num_warmup",
    "num_samples",
    "max_tree_depth",
    "target_accept",
    "dense_mass",
    "shared_warmup",
    "pooled_adaptation",
    "interweave",
    "gibbs_scales",
    "ensemble_rescue",
    "adapt_mass",
)


def _make_sampler(ir_or_model, ncp=True, **opts) -> NUTSSampler:
    known_keys = _SAMPLER_OPT_KEYS
    unknown = set(opts) - set(known_keys)
    if unknown:
        raise TypeError(f"unknown sampler options: {sorted(unknown)}")
    kw = {k: opts[k] for k in known_keys if k in opts}
    if isinstance(ir_or_model, CompiledModel):
        return NUTSSampler(model=ir_or_model, **kw)
    key = (ir_signature(ir_or_model), bool(ncp), tuple(sorted(kw.items())))
    hit = _SAMPLER_CACHE.get(key)
    if hit is not None:
        _SAMPLER_CACHE.move_to_end(key)
        return hit
    sampler = NUTSSampler(model=compile_logp(ir_or_model, ncp=ncp), **kw)
    _SAMPLER_CACHE[key] = sampler
    while len(_SAMPLER_CACHE) > _SAMPLER_CACHE_MAX:
        _SAMPLER_CACHE.popitem(last=False)
    return sampler


def sample(ir, *, num_chains=1, seed=0, init=None, warm_start=None, data=None,
           ncp=True, return_unconstrained=False, engine="nuts", **opts):
    """Single-/multi-chain NUTS (reference Sampler.sample, sampler.ex:33).

    ``engine`` dispatches to the other MCMC transitions behind the
    same entry point: "nuts" (default, this function), "chees" /
    "snaper" (lockstep many-chain HMC, D-T29/D-T31 — remaining kwargs
    forward to :func:`exmc_tpu.sample_chees`), or "meads" (self-tuning
    GHMC, D-T30 — forwards to :func:`exmc_tpu.sample_meads`). The
    ensemble engines choose their own chain-count defaults when
    ``num_chains`` is left at 1.

    Returns (trace, stats); trace arrays are (chains, samples, *shape)
    constrained values (chain axis kept even for num_chains=1).

    NOTE on ``ensemble_rescue`` (default True, >= 5 chains): during
    WARMUP, chains whose logp sits >= max(50, 1.5*sqrt(d)) nats below
    the 75th-percentile chain are teleported onto it at window ends
    (see _pipeline_segment). This revives adaptation-trapped chains,
    but it also means a genuine minority mode that far below the
    dominant one (posterior mass < e^-50) is collapsed during warmup
    rather than flagged by R-hat afterwards — pass
    ``ensemble_rescue=False`` when hunting multimodality; rescues are
    counted per chain in ``stats['rescues']`` and warned about when
    nonzero.

    NOTE on ``interweave=True`` stats: the recorded draw,
    ``stats['logp']`` and ``stats['energy']`` are all POST-interweave
    (the energy's potential term is shifted by the interweave's logp
    delta, so ``energy + logp == kinetic >= 0`` holds and E-BFMI reads
    the state the chain actually continues from; VERDICT r3 item 8).
    ``stats['accept_prob']`` still describes the preceding NUTS
    transition — that is its honest meaning for step-size adaptation.

    NOTE on ``gibbs_scales=True`` (requires ``interweave=True``):
    NUTS-within-Gibbs — eligible hierarchical scales AND sampled
    observation noises are FROZEN in the trajectory (inverse-mass 0)
    and move only via the interweave Gibbs legs, while their group
    latents get the analytic conditional metric. Centered
    hierarchical-Normal models sample divergence-free this way
    (D-T28); posteriors are identical (exact MCMC on the same
    target)."""
    if engine in ("chees", "snaper"):
        from exmc_tpu.chees import sample_chees

        if init is not None and not isinstance(init, dict):
            raise ValueError(
                f"engine={engine!r} supports only dict inits")
        if warm_start is not None:
            raise ValueError(f"engine={engine!r} has no warm_start")
        return sample_chees(
            ir, num_chains=(64 if num_chains == 1 else num_chains),
            seed=seed, init=init, data=data, ncp=ncp,
            return_unconstrained=return_unconstrained,
            criterion=engine, **opts)
    if engine == "meads":
        from exmc_tpu.meads import sample_meads

        if warm_start is not None:
            raise ValueError("engine='meads' has no warm_start")
        return sample_meads(
            ir, num_chains=(128 if num_chains == 1 else num_chains),
            seed=seed, data=data, ncp=ncp,
            return_unconstrained=return_unconstrained,
            **({"init": init} if init is not None else {}), **opts)
    if engine != "nuts":
        raise ValueError(
            f"unknown engine {engine!r} (nuts|chees|snaper|meads)")
    sampler = _make_sampler(ir, ncp=ncp, **opts)
    if data is None and not isinstance(ir, CompiledModel):
        # a cache-hit sampler may have been compiled from a different IR
        # instance with the same structure but different Builder.data
        # values; the data tensor is a JIT argument, so pass THIS ir's
        data = ir.data
    return sampler.run(
        num_chains=num_chains, seed=seed, init=init, warm_start=warm_start,
        data=data, return_unconstrained=return_unconstrained,
    )


def sample_chains(ir, num_chains=4, **kwargs):
    """Multi-chain NUTS (reference Sampler.sample_chains, sampler.ex:992)."""
    return sample(ir, num_chains=num_chains, **kwargs)


def sample_stream(ir, callback, *, num_chains=1, chunk_size=100, seed=0,
                  init=None, data=None, ncp=True, every=None,
                  mechanism="chunked", **opts):
    """Streaming sampling (reference sample_stream, sampler.ex:1186-1276).

    Granularities:

    * default (``every=None``): after each chunk of draws the host
      ``callback(start_index, constrained_chunk, stats_chunk)`` is
      invoked — delegates to ``run_chunked`` so the WHOLE pipeline is
      one traced segment program shared with ``run_chunked`` users and
      the sampler cache (VERDICT r1 weakness 5). Chunks span warmup
      too; the callback fires once a chunk contains post-warmup draws.

    * ``every=k`` (k=1 matches the reference's after-EVERY-draw BEAM
      message): ``callback(draw_index, constrained_point, stats)``
      fires for every k-th post-warmup draw, with the full
      (num_chains, ...) batch for that draw. Two mechanisms, both
      measured (64 chains, eight_schools 500+500, 8-device CPU mesh;
      plain run 3.0 s):

      - ``mechanism="chunked"`` (default): bounded device calls of k
        iterations via ``run_chunked``, emitting each block's last
        draw. ~10.6 s at k=10 — and works on EVERY backend (no host
        callbacks inside the program).
      - ``mechanism="io_callback"``: the whole run stays ONE device
        call; an outer scan above the chain vmap fires one ordered
        ``io_callback`` per k-iteration block. ~29 s at k=10 / ~32 s at
        k=1 — each callback point effectively splits the program into
        per-block dispatches, so it is SLOWER than chunked except near
        k=1, and the axon-tunneled TPU backend rejects/hangs on
        host-callback programs entirely. Kept for low-latency k=1
        live-viz on local backends; bypasses the sampler cache.

    Fine-grained streaming of ANY mechanism is dispatch-bound:
    emission granularity k costs roughly one program dispatch per k
    draws. Use the coarsest k the consumer can tolerate.

    Returns the full (trace, stats) like ``sample``."""
    if data is None and not isinstance(ir, CompiledModel):
        data = ir.data
    if every is not None:
        if not (isinstance(every, int) and every >= 1):
            raise ValueError(f"every must be a positive int, got {every!r}")
        if mechanism == "io_callback":
            known = set(_SAMPLER_OPT_KEYS)
            unknown = set(opts) - known
            if unknown:
                raise TypeError(f"unknown sampler options: {sorted(unknown)}")
            model = (ir if isinstance(ir, CompiledModel)
                     else compile_logp(ir, ncp=ncp))
            sampler = NUTSSampler(model=model, stream_cb=callback,
                                  stream_every=every, **opts)
            return sampler.run(num_chains=num_chains, seed=seed, init=init,
                               data=data)
        if mechanism != "chunked":
            raise ValueError(
                f"mechanism must be 'chunked' or 'io_callback', "
                f"got {mechanism!r}")
        k = every

        def chunk_cb(start, trace_chunk, stats_chunk):
            first = next(iter(trace_chunk.values()))
            n = first.shape[1]
            for j in range(n):
                if (start + j + 1) % k == 0:
                    point = {name: arr[:, j]
                             for name, arr in trace_chunk.items()}
                    st = {name: arr[:, j]
                          for name, arr in stats_chunk.items()}
                    callback(start + j, point, st)

        sampler = _make_sampler(ir, ncp=ncp, **opts)
        return sampler.run_chunked(
            num_chains=num_chains, chunk_iters=max(k, 25), seed=seed,
            init=init, data=data, callback=chunk_cb,
        )
    sampler = _make_sampler(ir, ncp=ncp, **opts)
    return sampler.run_chunked(
        num_chains=num_chains, chunk_iters=chunk_size, seed=seed, init=init,
        data=data, callback=callback,
    )

"""Simulation-based calibration (SBC) — beyond the reference.

Validates the WHOLE pipeline (IR -> rewrites -> transforms -> NUTS ->
constrain) end-to-end: if software and sampler are correct, the rank of
each true parameter among L thinned posterior draws, across R
replications of {draw theta ~ prior, simulate y | theta, sample the
posterior given y}, is uniform on {0..L} (Talts et al. 2018,
arXiv:1804.06788; Modrak et al. 2022 for the ECDF view). Miscalibrated
transforms, a biased tree, wrong Jacobians — all surface as rank
non-uniformity that posterior-recovery tolerances can miss.

The reference has no SBC harness (its correctness north star is the
posteriordb battery, benchmark/posteriordb/validation_results.md); this
module is a TPU-native addition: all R replications run as ONE jitted,
vmapped device call — the per-replication synthetic dataset rides the
``data``-as-JIT-argument channel (reference builder.ex:19-21, D69), so
R posteriors over R different datasets share a single compiled program.

Rank invariance note: with automatic NCP active the sampler's flat
space is z = (x - mu)/sigma with mu, sigma varying per draw, so ranks
are computed in CONSTRAINED user space (per-replication
``constrain_flat``), never on the raw flat draws.
"""

from dataclasses import replace

import numpy as np
import jax
import jax.numpy as jnp

from exmc_tpu.compiler import OBS_DATA_KEY, compile_logp, constrain_flat
from exmc_tpu.config import default_dtype
from exmc_tpu.predictive import posterior_predictive, prior_samples


def _obs_nodes(ir):
    """All observation nodes (obs AND meas_obs — the generator applies
    the measurable transform forward, posterior_predictive handles it).
    Interval-censored obs ({"lower","upper"} dict values) cannot ride
    the replication channel: the simulated quantity is the latent y,
    not a censoring interval."""
    nodes = [(nid, n) for nid, n in sorted(ir.nodes.items())
             if n.op[0] in ("obs", "meas_obs")]
    if not nodes:
        raise ValueError("sbc: model has no observation nodes")
    for nid, n in nodes:
        if isinstance(n.op[2], dict):
            raise ValueError(
                f"sbc: obs node {nid!r} is interval-censored — the "
                "synthetic-data channel carries simulated values, not "
                "censoring intervals"
            )
    return nodes


def _data_arg_ir(ir, obs_nodes):
    """Rewrite every obs node's inline value to a KEYED ``__obs_data``
    ref so ONE compiled sampler serves every synthetic dataset; the
    data argument becomes a dict {obs_id: value} (plus the model's
    original ``Builder.data`` under the reserved "__base" key, which
    plain "__obs_data" refs keep resolving — compiler._base_data)."""
    ir2 = ir
    data = {}
    for obs_id, node in obs_nodes:
        value = node.op[2]
        if isinstance(value, str) and value == OBS_DATA_KEY:
            if ir.data is None:
                raise ValueError(
                    f"sbc: obs node {obs_id!r} references __obs_data but "
                    "the IR carries no data"
                )
            data[obs_id] = np.asarray(ir.data)
        else:
            data[obs_id] = np.asarray(value)
        new_node = replace(
            node, op=node.op[:2] + ((OBS_DATA_KEY, obs_id),) + node.op[3:]
        )
        ir2 = ir2.replace_node(new_node)
    if ir.data is not None:
        data["__base"] = ir.data
    return replace(ir2, data=data)


def _chi2_sf(stat, dof):
    """Survival function of chi^2_dof via the regularized upper
    incomplete gamma (jax.scipy.special.gammaincc)."""
    return float(jax.scipy.special.gammaincc(dof / 2.0, stat / 2.0))


def rank_uniformity(ranks, L, num_bins=20):
    """Chi-squared uniformity test of SBC ranks on {0..L}.

    Returns (statistic, p_value). ``num_bins`` bins over the L+1
    possible ranks (Talts et al. recommend ~20 with R >= 5 per bin).

    The expected count per bin is R * (#support points in the bin) /
    (L + 1), NOT R / B: ranks are integers, and when B does not divide
    L + 1 the equal-width bins hold unequal numbers of support points
    (e.g. L + 1 = 31 with B = 20 mixes 1- and 2-integer bins, a 2:1
    null-probability ratio). The uniform-expected version spuriously
    drove p -> 0 as R grew on a perfectly calibrated pipeline —
    caught by the round-4 GP SBC exercise, where thin=50 of 1500
    draws gives L + 1 = 31; the standard battery never saw it because
    its L + 1 = 100 divides into 20 bins exactly."""
    ranks = np.asarray(ranks)
    R = ranks.shape[0]
    # cap bins so the chi^2 approximation holds (>= ~5 expected per bin)
    B = int(max(2, min(num_bins, L + 1, R // 5)))
    # equal-width bins over [0, L+1); expected follows the DISCRETE
    # support, not the bin width
    edges = np.linspace(0, L + 1, B + 1)
    counts, _ = np.histogram(ranks, bins=edges)
    sup_counts, _ = np.histogram(np.arange(L + 1), bins=edges)
    expected = R * sup_counts / (L + 1.0)
    stat = float(((counts - expected) ** 2 / expected).sum())
    return stat, _chi2_sf(stat, B - 1)


def ecdf_ks(ranks, L, num_sims=2000, seed=0):
    """Kolmogorov-style uniformity test on SBC ranks with the EXACT
    discrete null simulated (the ECDF-difference view of Säilynoja et
    al. 2021: chi-squared binning hides shape; the max ECDF deviation
    catches U/∩/shifted rank histograms directly, and simulating the
    discrete-uniform null avoids the continuous-KS conservativeness at
    small L).

    Returns (statistic, p_value): statistic = max_t |ECDF(t) - t/(L+1)|
    over t in {0..L}; p = P(null statistic >= observed) over
    ``num_sims`` simulated rank sets of the same size."""
    ranks = np.asarray(ranks)
    R = ranks.shape[0]
    grid = np.arange(L + 1)
    uniform_cdf = (grid + 1) / (L + 1)

    def stat(r):
        ecdf = np.searchsorted(np.sort(r), grid, side="right") / R
        return np.abs(ecdf - uniform_cdf).max()

    observed = stat(ranks)
    rng = np.random.default_rng(seed)
    sims = rng.integers(0, L + 1, size=(num_sims, R))
    null = np.array([stat(s) for s in sims])
    return float(observed), float((null >= observed).mean())


def _batched_vmap(fn, num_replications, rep_batch, *args):
    """jit(vmap(fn)) over the replication axis, in bounded device calls
    of ``rep_batch`` replications. One huge vmapped call at R >= 512
    ran for minutes and kernel-faulted the axon TPU worker (measured,
    eight_schools_centered_gibbs); batching bounds each call while the
    padded batch shape keeps a single compiled program. ``args`` are
    pytrees with leading axis R; short final batches pad by wrapping
    indices and truncate the outputs."""
    jfn = jax.jit(jax.vmap(fn))
    if not rep_batch or rep_batch >= num_replications:
        return jfn(*args)
    outs = []
    for s in range(0, num_replications, rep_batch):
        e = min(s + rep_batch, num_replications)
        idx = np.arange(rep_batch) % (e - s)
        sl = jax.tree.map(lambda a: jnp.asarray(a)[s:e][idx], args)
        out = jfn(*sl)
        if e - s < rep_batch:
            out = jax.tree.map(lambda a: a[: e - s], out)
        outs.append(out)
    return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *outs)


def sbc(ir, *, num_replications=200, num_warmup=500, num_samples=1000,
        thin=10, seed=0, ncp=True, num_bins=20, engine="nuts",
        chees_chains=8, rep_batch=None, **sampler_opts):
    """Run SBC for ``ir`` (any number of obs/meas_obs nodes; the
    replication axis rides a dict-valued ``__obs_data`` JIT argument,
    one entry per obs node — VERDICT r3 item 4a extended the original
    single-obs harness).

    Protocol per replication r (all R in one vmapped device call):
      theta_r ~ prior;  y_r ~ likelihood(theta_r);
      one NUTS chain on data=y_r;  rank_r = #{thinned draws < theta_r}.

    Returns a dict:
      ``ranks``    {param_component: (R,) int ranks in [0, L]}
      ``L``        thinned draws per replication (rank support is L+1)
      ``chi2``     {param_component: (statistic, p_value)}
      ``min_p``    smallest p-value across components (pre-correction)
      ``divergence_rate``  pooled across replications

    A healthy pipeline gives min_p comfortably above a Bonferroni-style
    threshold; systematic bias shows as U/∩-shaped or shifted rank
    histograms (Talts et al. 2018 fig. 2).

    ``engine="chees"`` calibrates the ChEES-HMC kernel (D-T29) instead:
    each replication runs its own ``chees_chains``-chain batch (the
    cross-chain adaptation needs >= 2 chains), vmapped over
    replications; ranks pool the thinned draws across the batch, so
    L = chees_chains * num_samples/thin.

    ``engine="snaper"`` calibrates the SNAPER-HMC variant (same
    kernel, principal-component trajectory criterion).

    ``rep_batch=B`` splits the R replications into bounded device
    calls of B (padded; one compiled program) — use on remote-compile
    TPU backends whose watchdogs kill multi-minute kernels.

    ``engine="meads"`` calibrates the MEADS GHMC kernel (D-T30):
    ``ensemble_chains`` chains in ``ensemble_folds`` folds per
    replication, the ensemble initialized at the replication's TRUE
    theta (+ jitter) — a posterior-typical point, so the self-tuning
    transient starts in-regime (init never affects invariance)."""
    from exmc_tpu.nuts.sampler import _init_position, _make_sampler

    ensemble_chains = chees_chains  # shared knob for chees/meads
    ensemble_folds = 4

    # cheap argument validation BEFORE the prior-simulation pipeline
    if engine not in ("nuts", "chees", "snaper", "meads"):
        raise ValueError(
            f"unknown engine {engine!r} (nuts|chees|snaper|meads)")
    if engine in ("chees", "snaper", "meads"):
        if sampler_opts:
            raise TypeError(
                f"engine={engine!r} takes no sampler options, got "
                f"{sorted(sampler_opts)}")
        if chees_chains < 2:
            raise ValueError(
                "chees_chains must be >= 2 (the ChEES criterion is "
                "cross-chain; 1 chain degenerates to fixed-T HMC)")
    if engine == "meads" and (chees_chains % ensemble_folds != 0
                              or chees_chains // ensemble_folds < 2):
        raise ValueError(
            f"engine='meads' needs chees_chains divisible by "
            f"{ensemble_folds} folds with >= 2 chains per fold "
            f"(got {chees_chains})")

    obs_nodes = _obs_nodes(ir)
    model0 = compile_logp(ir, ncp=ncp)
    names = [e.id for e in model0.pm.entries]

    # 1) theta ~ prior (constrained space), R replications in one pass
    prior = prior_samples(ir, num_draws=num_replications, seed=seed)
    theta_true = {k: jnp.asarray(prior[k]) for k in names}

    # 2) y | theta via the posterior-predictive machinery fed a
    #    prior "trace" of shape (1, R, ...) — one simulated dataset
    #    per obs node (meas_obs values get the forward transform)
    prior_trace = {k: np.asarray(prior[k])[None] for k in names}
    y = posterior_predictive(ir, prior_trace, seed=seed + 1, ncp=ncp)
    y_batch = {obs_id: jnp.asarray(y[obs_id][0])  # (R, *obs_shape)
               for obs_id, _ in obs_nodes}

    # 3) one compiled sampler over the data-as-argument IR
    ir2 = _data_arg_ir(ir, obs_nodes)
    if "__base" in (ir2.data or {}):
        # the base data is replication-invariant: broadcast it so the
        # vmap below maps every leaf on axis 0
        y_batch["__base"] = jax.tree.map(
            lambda a: jnp.broadcast_to(
                jnp.asarray(a), (num_replications,) + np.asarray(a).shape),
            ir2.data["__base"])
    thinned = slice(thin - 1, None, thin)
    draws_per_rep = num_samples

    if engine == "nuts":
        sampler = _make_sampler(
            ir2, ncp=ncp, num_warmup=num_warmup, num_samples=num_samples,
            ensemble_rescue=False, pooled_adaptation=False, **sampler_opts)
        rw_ir, pm = sampler.model.ir, sampler.model.pm
        d = sampler.model.size
        dtype = default_dtype()

        base = jax.random.PRNGKey(seed + 2)
        keys = jax.random.split(base, num_replications)
        q_inits = jax.vmap(lambda k: _init_position(k, d, dtype))(keys)
        keys = jax.vmap(lambda k: jax.random.fold_in(k, 7919))(keys)

        ws_eps = jnp.ones((), dtype)
        ws_inv = jnp.ones((d,), dtype)

        def one(data_r, qi, key):
            draws, stats, _ = sampler._one_chain(
                data_r, qi, key, False, ws_eps, ws_inv)
            sub = draws[thinned]  # (L, d)
            named = jax.vmap(
                lambda f: constrain_flat(rw_ir, pm, f, data_r))(sub)
            return named, stats["diverging"].sum()

        named, div = _batched_vmap(one, num_replications, rep_batch,
                                   y_batch, q_inits, keys)
    elif engine in ("chees", "snaper"):
        from exmc_tpu.chees import _build_kernel

        model2 = compile_logp(ir2, ncp=ncp)
        kernel = _build_kernel(
            model2, chees_chains, num_warmup, num_samples,
            target_accept=0.651, max_num_steps=1024, criterion=engine)
        rw_ir, pm = model2.ir, model2.pm
        d = model2.size
        draws_per_rep = num_samples * chees_chains

        base = jax.random.PRNGKey(seed + 2)
        rep_keys = jax.random.split(base, num_replications)
        init_keys = jax.vmap(
            lambda k: jax.random.split(k, chees_chains))(rep_keys)
        eps_keys = jax.vmap(
            lambda k: jax.random.fold_in(k, 424_243))(rep_keys)

        def one(data_r, ik, ek):
            outs, _ = kernel(None, ik, data_r, ek)  # post-warmup only
            sub = outs["q"][thinned]  # (L/M, M, d)
            named = jax.vmap(
                lambda f: constrain_flat(rw_ir, pm, f, data_r)
            )(sub.reshape(-1, d))
            return named, outs["diverging"].sum()

        named, div = _batched_vmap(one, num_replications, rep_batch,
                                   y_batch, init_keys, eps_keys)
    elif engine == "meads":
        from exmc_tpu.meads import _build_kernel as _meads_kernel

        model2 = compile_logp(ir2, ncp=ncp)
        kernel = _meads_kernel(
            model2, ensemble_chains, ensemble_folds, num_warmup,
            num_samples, step_size_scale=1.0, max_step_size=None)
        rw_ir, pm = model2.ir, model2.pm
        d = model2.size
        dtype = default_dtype()
        draws_per_rep = num_samples * ensemble_chains

        base = jax.random.PRNGKey(seed + 2)
        rep_keys = jax.random.split(base, num_replications)
        init_keys = jax.vmap(
            lambda k: jax.random.split(k, ensemble_chains))(rep_keys)
        noise_keys = jax.vmap(
            lambda k: jax.random.fold_in(k, 77_377))(rep_keys)

        def one(data_r, theta_r, ik, nk):
            # init the ensemble at the replication's generating theta —
            # posterior-typical by construction, so the MEADS transient
            # starts in-regime (module docstring of exmc_tpu.meads)
            flat0 = model2.unconstrain(theta_r).astype(dtype)
            jit_n = jax.random.normal(
                jax.random.fold_in(nk, 5), (ensemble_chains, d), dtype)
            qi = flat0[None, :] + 0.01 * jit_n
            outs, _ = kernel(qi, ik, data_r, nk)  # post-burn-in only
            sub = outs["q"][thinned]  # (L/M, M, d)
            named = jax.vmap(
                lambda f: constrain_flat(rw_ir, pm, f, data_r)
            )(sub.reshape(-1, d))
            return named, outs["diverging"].sum()

        named, div = _batched_vmap(one, num_replications, rep_batch,
                                   y_batch, theta_true, init_keys,
                                   noise_keys)
    L = int(np.asarray(named[names[0]]).shape[1])

    ranks, chi2, ecdf = {}, {}, {}
    for k in names:
        draws_k = np.asarray(named[k]).reshape(
            num_replications, L, -1)           # (R, L, C)
        true_k = np.asarray(theta_true[k]).reshape(num_replications, -1)
        C = draws_k.shape[-1]
        r_k = (draws_k < true_k[:, None, :]).sum(axis=1)  # (R, C)
        for c in range(C):
            if np.ptp(draws_k[:, :, c]) == 0 and np.ptp(true_k[:, c]) == 0:
                # structurally constant component (e.g. a Cholesky
                # factor's fixed upper-triangle zeros): rank is
                # degenerate by construction, not a calibration signal
                continue
            name = k if C == 1 else f"{k}[{c}]"
            ranks[name] = r_k[:, c]
            chi2[name] = rank_uniformity(r_k[:, c], L, num_bins)
            ecdf[name] = ecdf_ks(r_k[:, c], L, seed=seed + 3)

    return {
        "ranks": ranks,
        "L": L,
        "num_replications": num_replications,
        "chi2": chi2,
        "ecdf": ecdf,
        "min_p": min(p for _, p in chi2.values()),
        "min_ecdf_p": min(p for _, p in ecdf.values()),
        "divergence_rate": float(np.asarray(div).sum())
        / (num_replications * draws_per_rep),
    }

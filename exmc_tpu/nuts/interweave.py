"""ASIS / interweaving Gibbs step for NCP'd scale parameters.

Yu & Meng 2011 ("to center or not to center"): the non-centered
(ancillary) parameterization the rewrite pipeline applies removes the
funnel, but at weak per-observation identification it couples the scale
sigma to EVERY z coordinate — the posterior over (sigma, z) develops a
ridge NUTS crawls along (the T=5000 stochastic-volatility mixing
failure, TODO r2 #2). Interweaving alternates the two
parameterizations: after each NUTS transition in NCP coordinates, one
Gibbs-style update of sigma in the CENTERED (sufficient)
parameterization, where sigma's conditional given the reconstructed
path s (held fixed) does not involve y at all:

    p(sigma | s) ∝ sigma^{-n} exp(-SSE_s / (2 sigma^2)) p(sigma),
    SSE_s = sum(increments^2) = sigma^2 |z|^2  (invariant on the fiber)

The move proposes v' = sigma'^2 from the scaled-inv-chi^2 dominant
factor (an independence proposal: v' = SSE_s / chi2_n), rescales the
ancillary coordinates deterministically z' = z * sigma/sigma', and
MH-corrects for the prior. Full acceptance ratio in (z, v) coordinates
(N(z) ratio x proposal ratio x fiber-map Jacobian (sigma/sigma')^n all
collapse):

    log alpha = [log p_v(v') - log p_v(v)] + [log v' - log v],
    p_v(v) = p_sigma(sqrt(v)) / (2 sqrt(v))

One accepted draw jumps sigma ACROSS the ridge instead of crawling —
this is what breaks the low-sigma trap mode seen on 2/5 SV seeds.

Applies to any scale that (a) is a scalar free RV with constant prior
params, and (b) is referenced ONLY as the NCP sigma of Normal/GRW
latents (both give s - mu = sigma * z, so SSE_s = sigma^2 |z|^2 in all
cases; a Normal-NCP mu may be a ref — it is held fixed by the move).
Beyond the reference repo (its ASIS entry is an open candidate,
TODO r2 #2); enabled via ``sample(..., interweave=True)``.

CENTERED GRW latents are also supported (``ncp=False``): there the
path IS the sampler's coordinate, so the sigma update is a plain Gibbs
move — same conditional, same proposal, same acceptance, but no
ancillary rescale (SSE from the path's first differences). This is the
long-T recipe: the centered path is far better conditioned than the
increments (see compiler._grw_spectral_basis notes), and the sigma-
amplitude funnel that motivated auto-NCP is exactly what this Gibbs
move removes.
"""

import jax
import jax.numpy as jnp
import numpy as np

from exmc_tpu.compiler import OBS_DATA_KEY
from exmc_tpu.dists.base import get as get_dist
from exmc_tpu.transforms import get as get_transform


def _plain_obs_meta(meta):
    """True when obs metadata is the normalized PLAIN form the Gaussian
    conditionals assume: unit weight, default likelihood, no mask, no
    censoring, and reduce None/"sum" (reduce="mean"/"logsumexp"
    reweight or transform the terms, so the inv-chi^2 / regression
    conditionals would be wrong — code-review r4). One shared predicate
    for both the ancillary-leg and obs-noise eligibility paths (the two
    hand-copied versions had already drifted)."""
    w = meta.get("weight")
    if not (w is None or (np.isscalar(w) and float(w) == 1.0)):
        return False
    if meta.get("likelihood") not in (None, True):
        return False
    if meta.get("mask") is not None or meta.get("censored") is not None:
        return False
    return meta.get("reduce") in (None, "sum")


def _obs_index(ir):
    """{rv_id: [obs nodes]} built once per eligibility scan."""
    out = {}
    for n in ir.nodes.values():
        if n.op[0] == "obs":
            out.setdefault(n.op[1], []).append(n)
    return out


def _obs_value_spec(ir, value):
    """Classify an obs value for the Gibbs legs: ("const", array) for
    inline values, ("data", key, template) for the runtime data channel
    (plain "__obs_data" -> key None; keyed ("__obs_data", k) -> k) —
    shapes are static per D69 so the build-time template array from
    ``ir.data`` carries them. None when unusable (interval censoring
    or unresolvable refs)."""
    if isinstance(value, str):
        if value != OBS_DATA_KEY or ir.data is None:
            return None
        base = ir.data
        if isinstance(base, dict):
            base = base.get("__base")
        if base is None:
            return None
        return ("data", None, np.asarray(base, np.float64))
    if isinstance(value, tuple):
        if (len(value) == 2 and value[0] == OBS_DATA_KEY
                and isinstance(ir.data, dict) and value[1] in ir.data):
            return ("data", value[1], np.asarray(ir.data[value[1]],
                                                 np.float64))
        return None
    if isinstance(value, dict):
        return None
    return ("const", np.asarray(value, np.float64))


def _y_runtime(y_spec, data, dtype):
    """Resolve a y spec to its runtime (broadcast) array inside the
    traced move."""
    kind = y_spec[0]
    if kind == "const":
        return jnp.asarray(y_spec[1], dtype)
    _, key, bshape = y_spec
    raw = data if key is None else data[key]
    return jnp.broadcast_to(jnp.asarray(raw, dtype), bshape)


def _obs_term_shape(node, value, extra=()):
    """Broadcast shape of the obs LIKELIHOOD terms: the observed rv's
    declared shape broadcast with the obs value (a scalar value against
    a vector rv still contributes one term PER ELEMENT — code-review r4:
    the term count feeds the inv-chi^2 degrees of freedom and the
    regression precision, so undercounting biases sigma)."""
    from exmc_tpu.point_map import _infer_shape

    rv_shape = tuple(_infer_shape(node) or ())
    return np.broadcast_shapes(np.asarray(value).shape, rv_shape, *extra)


def _anc_obs_info(ir, entries, ncp, obs_by_rv, latent_id, latent_len):
    """Ancillary-leg (Yu & Meng's second ASIS sweep) eligibility for one
    centered-Normal latent theta: every reference to theta (besides its
    own node) must be an OBSERVED Normal rv y ~ N(theta, s) with plain
    obs metadata, and y referenced nowhere else. The observation scale
    s may be a CONSTANT or a scalar FREE RV (unknown noise — the
    medium/stress/radon multilevel-regression shape); a sampled s is
    simply conditioned on by the move. Returns a list of
    (y_values, s_spec) pairs where s_spec is ("const", array) or
    ("coord", offset, transform); empty-obs latents contribute no
    likelihood term. None when theta has other uses (the Gaussian
    conditional would be wrong)."""
    out = []
    for nid, n in ir.nodes.items():
        if nid == latent_id or latent_id not in n.deps:
            continue
        if n.op[0] == "obs":
            return None  # theta observed directly: not a latent to move
        if n.op[0] != "rv" or get_dist(n.op[1]).name != "normal":
            return None
        params = n.op[2]
        if params.get("mu") != latent_id:
            return None
        sig = params.get("sigma")
        if isinstance(sig, str):
            e_s = entries.get(sig)
            s_node = ir.nodes.get(sig)
            if (e_s is None or e_s.length != 1 or sig in ncp
                    or s_node is None or s_node.op[0] != "rv"):
                return None
            s_spec = ("coord", e_s.offset, get_transform(e_s.transform))
            s_shape = ()
        else:
            s_arr = np.asarray(sig, np.float64)
            s_spec = ("const", s_arr)
            s_shape = s_arr.shape
        obs = obs_by_rv.get(nid, [])
        if len(obs) != 1:
            return None
        if not _plain_obs_meta(obs[0].op[3]):
            return None
        y_spec = _obs_value_spec(ir, obs[0].op[2])
        if y_spec is None:
            return None
        # y must feed nothing but its obs node
        if any(nid in m.deps for mid, m in ir.nodes.items()
               if mid != obs[0].id and m.op[0] != "obs"):
            return None
        try:
            y_tmpl = y_spec[-1]
            # broadcast against the OBS RV's declared shape too: a
            # scalar value on a vector rv is one term per element
            bshape = _obs_term_shape(n, y_tmpl, (s_shape, (latent_len,)))
        except ValueError:
            return None
        if latent_len > 1 and bshape[-1] != latent_len:
            return None  # theta must broadcast along the trailing axis
        if s_spec[0] == "const":
            s_spec = ("const", np.broadcast_to(s_spec[1], bshape).copy())
        if y_spec[0] == "const":
            y_spec = ("const", np.broadcast_to(y_tmpl, bshape).copy())
        else:
            y_spec = ("data", y_spec[1], bshape)
        out.append((y_spec, s_spec))
    return out


class _ExpChainTransform:
    """sigma = exp(c * y) viewed as the 'constraint transform' of the
    underlying unconstrained coordinate y (the Neal-funnel chain
    x ~ N(0, exp(y/2)): c = 1/2)."""

    def __init__(self, c):
        self.c = c

    def forward(self, u):
        return jnp.exp(self.c * u)

    def inverse(self, s):
        return jnp.log(s) / self.c


class _ExpChainScaleDist:
    """Pushforward density of sigma = exp(c*y), y ~ base(params):
    p_s(s) = p_y(log(s)/c) / (c*s)."""

    def __init__(self, base, c):
        self.base, self.c = base, c

    def logpdf(self, s, params):
        yv = jnp.log(s) / self.c
        return self.base.logpdf(yv, params) - jnp.log(self.c) - jnp.log(s)

    def sample(self, key, params, shape=()):
        return jnp.exp(self.c * self.base.sample(key, params, shape))


def _resolve_exp_chain(ir, entries, ncp, sig):
    """``sig`` names a det node computing exp(c*y) of a SCALAR free RV y
    (identity transform, not NCP'd, c > 0): returns (y_id, c, chain)
    where chain = (exp_id,) or (exp_id, mul_id), else None. Recognized:
    exp(y), exp(mul(y, c)), exp(mul(c, y)) — the heteroscedastic-scale
    idiom (Neal's funnel)."""
    node = ir.nodes.get(sig)
    if node is None or node.op[0] != "det" or node.op[1] != "exp":
        return None
    args = node.op[2]
    if len(args) != 1 or not isinstance(args[0], str):
        return None
    inner = args[0]
    chain = (sig,)
    c = 1.0
    nd = ir.nodes.get(inner)
    if nd is not None and nd.op[0] == "det" and nd.op[1] == "mul":
        margs = nd.op[2]
        if len(margs) != 2:
            return None
        refs = [a for a in margs if isinstance(a, str)]
        consts = [a for a in margs if not isinstance(a, str)]
        if len(refs) != 1 or len(consts) != 1 or np.ndim(consts[0]) != 0:
            return None
        c = float(consts[0])
        chain = (sig, inner)
        inner = refs[0]
        nd = ir.nodes.get(inner)
    if c <= 0:
        return None
    e = entries.get(inner)
    if (e is None or e.length != 1 or inner in ncp or nd is None
            or nd.op[0] != "rv" or e.transform not in (None, "identity")):
        return None
    return inner, c, chain


def _referencing_ids(ir, ncp, target):
    """Node ids referencing ``target`` in the rewritten IR: the builder
    already records param/arg refs in Node.deps, and NCP reconstruction
    refs live in ncp_info (the rewritten z node's own op no longer
    mentions its mu/sigma)."""
    out = {nid for nid, n in ir.nodes.items()
           if nid != target and target in n.deps}
    for nid, info in ncp.items():
        if info.get("mu") == target or info.get("sigma") == target:
            out.add(nid)
    return out


def eligible_groups(model):
    """Find interweavable scales: {sigma_id: [(z_offset, z_len), ...]}.

    Eligibility: sigma is a scalar free RV with constant prior params,
    and every reference to it (outside its own node) is as the NCP
    "sigma" of a Normal/GRW latent whose point-map entry exists.
    """
    ir, pm, ncp = model.ir, model.pm, model.ncp_info
    entries = {e.id: e for e in pm.entries}

    by_sigma = {}
    for nid, info in ncp.items():
        sig = info.get("sigma")
        if info.get("kind") == "affine":
            # Stan <offset=, multiplier=> lowering: the z node carries a
            # Flat prior with the density in a factor node, so the
            # ancillary-rescale move's N(0,1) bookkeeping does not apply
            continue
        if isinstance(sig, str):
            by_sigma.setdefault(sig, []).append((nid, "ncp", None))
    # centered GRW/Normal latents: the latent itself is a free RV whose
    # op still references sigma; the sigma update becomes a plain Gibbs
    # move (no ancillary rescale). For centered Normals the mean may be
    # a constant or another free RV with identity transform (read
    # straight from the flat vector; it is held fixed by the move).
    for nid, node in ir.nodes.items():
        if node.op[0] != "rv" or nid not in entries or nid in ncp:
            continue
        name = get_dist(node.op[1]).name
        if name == "gaussian_random_walk":
            sig = node.op[2].get("sigma")
            if isinstance(sig, str):
                by_sigma.setdefault(sig, []).append((nid, "centered", None))
        elif name == "normal" and len(node.op) == 3:
            sig = node.op[2].get("sigma")
            mu = node.op[2].get("mu")
            if not isinstance(sig, str):
                continue
            if isinstance(mu, str):
                e_mu = entries.get(mu)
                mu_node = ir.nodes.get(mu)
                if (e_mu is None or e_mu.transform not in (None, "identity")
                        or mu in ncp or mu_node is None
                        or mu_node.op[0] != "rv"):
                    continue
                mu_spec = ("coord", e_mu.offset, e_mu.length)
            elif np.isscalar(mu) or np.asarray(mu).ndim == 0:
                mu_spec = ("const", float(mu))
            else:
                continue
            by_sigma.setdefault(sig, []).append(
                (nid, "centered_normal", mu_spec))

    # OBSERVATION-NOISE scales: a scalar free RV referenced only as the
    # sigma of OBSERVED Normal rvs whose mean is a constant or a direct
    # identity-coordinate ref. sigma_y | mean, y is the same
    # scaled-inv-chi^2 conditional as the sufficient leg (SSE from the
    # observed residuals), a pure Gibbs move. Needed for gibbs_scales
    # correctness with sampled noise: the analytic conditional metric
    # reads sigma_y, so sigma_y must be FROZEN in the trajectory too
    # (a metric depending on a moving coordinate would break
    # reversibility); with this group it is, and it mixes by Gibbs.
    obs_by_rv = _obs_index(ir)
    for nid, node in ir.nodes.items():
        if (node.op[0] != "rv" or nid in entries or nid in ncp
                or nid not in obs_by_rv):
            continue
        if get_dist(node.op[1]).name != "normal":
            continue
        sig = node.op[2].get("sigma")
        if not isinstance(sig, str):
            continue
        obs = obs_by_rv[nid]
        if len(obs) != 1:
            continue
        if not _plain_obs_meta(obs[0].op[3]):
            continue
        y_spec = _obs_value_spec(ir, obs[0].op[2])
        if y_spec is None:
            continue
        mu = node.op[2].get("mu")
        if isinstance(mu, str):
            e_mu = entries.get(mu)
            mu_node = ir.nodes.get(mu)
            if (e_mu is None or e_mu.transform not in (None, "identity")
                    or mu in ncp or mu_node is None
                    or mu_node.op[0] != "rv"):
                continue
            mu_spec = ("coord", e_mu.offset, e_mu.length)
        elif np.isscalar(mu) or np.asarray(mu).ndim == 0:
            mu_spec = ("const", float(mu))
        else:
            continue
        try:
            # term count = broadcast of the rv shape, the value, and
            # the mean — a scalar value on a vector rv is N terms
            mu_len = (mu_spec[2],) if mu_spec[0] == "coord" else ()
            bshape = _obs_term_shape(node, y_spec[-1], (mu_len,))
        except ValueError:
            continue
        if y_spec[0] == "const":
            y_spec = ("const", np.broadcast_to(y_spec[1], bshape).copy())
        else:
            y_spec = ("data", y_spec[1], bshape)
        by_sigma.setdefault(sig, []).append(
            (nid, "obs_noise", (mu_spec, y_spec)))

    groups = []
    for sig, latents in by_sigma.items():
        kinds = {k for _, k, _ in latents}
        if "obs_noise" in kinds and kinds != {"obs_noise"}:
            # a scale that is BOTH a latent prior scale and an obs
            # noise: the combined conditional is not the inv-chi^2 form
            continue
        e_sig = entries.get(sig)
        chain = None
        if e_sig is None:
            # sigma may be a det exp-chain over a scalar free RV (the
            # Neal-funnel scale x ~ N(0, exp(y/2))): the move operates
            # on y through the pushforward transform/density wrappers
            resolved = _resolve_exp_chain(ir, entries, ncp, sig)
            if resolved is None:
                continue
            scale_rv, c_exp, chain = resolved
            e_sig = entries[scale_rv]
            node = ir.nodes[scale_rv]
            # y and each chain link must feed only the next link
            # (otherwise moving y shifts terms the MH ratio lacks)
            if _referencing_ids(ir, ncp, scale_rv) != {chain[-1]}:
                continue
            if (len(chain) == 2
                    and _referencing_ids(ir, ncp, chain[1]) != {chain[0]}):
                continue
        else:
            if e_sig.length != 1:
                continue
            node = ir.nodes.get(sig)
            if node is None or node.op[0] != "rv":
                continue
            if sig in ncp:
                # an NCP'd scale's flat coordinate is z_sigma, not
                # sigma — the transform/prior bookkeeping would be wrong
                continue
        prior_params = node.op[2]
        if any(isinstance(v, str) for v in prior_params.values()):
            continue  # prior depends on other coordinates
        # a mean that is (or resolves through) sigma breaks the move
        if any(kind == "ncp" and ncp[nid].get("mu") == sig
               for nid, kind, _ in latents):
            continue
        if any(kind == "centered_normal"
               and ir.nodes[nid].op[2].get("mu") == sig
               for nid, kind, _ in latents):
            continue
        # all OTHER references — Node.deps AND ncp_info reconstruction
        # refs (e.g. another latent whose NCP mu is this scale: its
        # likelihood would shift without an MH correction) — must come
        # from the grouped latents themselves
        grouped = {nid for nid, _, _ in latents}
        if _referencing_ids(ir, ncp, sig) - grouped:
            continue
        zs = []
        ok = True
        for nid, kind, mu_spec in latents:
            if kind == "obs_noise":
                mu_s, y_spec = mu_spec
                # the broadcast over (rv shape, value, mean) IS the
                # likelihood term count (the inv-chi^2 dof)
                n_terms = (y_spec[1].size if y_spec[0] == "const"
                           else int(np.prod(y_spec[2], dtype=int)))
                zs.append((0, n_terms, kind, (mu_s, y_spec)))
                continue
            e = entries.get(nid)
            if e is None:
                ok = False
                break
            if (mu_spec is not None and mu_spec[0] == "coord"
                    and mu_spec[2] not in (1, e.length)):
                ok = False  # mean must broadcast against the latent
                break
            zs.append((e.offset, e.length, kind, mu_spec))
        if not ok or not zs:
            continue
        # ancillary leg (the full Yu & Meng interweave for CENTERED
        # hierarchical-Normal groups): with z = (theta - mu)/sigma held
        # fixed, y = mu + sigma z + eps is LINEAR in sigma, so
        # sigma | z, mu, y is a (truncated-)Gaussian regression draw.
        # Available only when every latent is centered_normal and each
        # one's only downstream use is a plain observed Normal.
        anc = None
        if all(kind == "centered_normal" for _, kind, _ in latents):
            anc = []
            for nid, _, mu_spec in latents:
                e = entries[nid]
                info = _anc_obs_info(ir, entries, ncp, obs_by_rv,
                                     nid, e.length)
                if info is None:
                    anc = None
                    break
                anc.append((e.offset, e.length, mu_spec, tuple(info)))
        anc_mode = None
        if anc is not None:
            # with observations: truncated-Gaussian regression draw;
            # without any: the ancillary conditional of the scale given
            # z IS its prior (nothing else depends on it on the fiber)
            # — an exact always-accept prior refresh (this is what
            # makes Neal's funnel mix iid-fast under gibbs_scales)
            anc_mode = ("regression"
                        if any(info for *_, info in anc) else "prior")
        groups.append({
            "sigma_id": sig,
            "offset": e_sig.offset,
            "transform": (_ExpChainTransform(c_exp) if chain
                          else get_transform(e_sig.transform)),
            "dist": (_ExpChainScaleDist(get_dist(node.op[1]), c_exp)
                     if chain else get_dist(node.op[1])),
            # keep f64 numpy; jnp casts per the active precision mode
            # (EXMC_TPU_X64 golden paths stay full-precision)
            "params": {k: np.asarray(v, np.float64)
                       if not np.isscalar(v) else v
                       for k, v in prior_params.items()},
            "zs": tuple(zs),
            "n": int(sum(ln for _, ln, _, _ in zs)),
            "anc": tuple(anc) if anc is not None else None,
            "anc_mode": anc_mode,
        })
    return groups


def build_conditional_metric(model, frozen_offsets=None):
    """For ``gibbs_scales`` (NUTS-within-Gibbs): a function
    ``fn(q, inv) -> inv'`` overriding the inverse-mass entries of each
    group's centered-Normal latents with their ANALYTIC conditional
    variance given the current (frozen) scale:

        prec(theta_e | mu, tau, y) = 1/tau^2 + sum_obs 1/s_e^2

    Valid as a NUTS metric because tau is frozen for the whole
    trajectory (the metric is constant within each transition; it only
    re-conditions across transitions, which is ordinary Gibbs
    preconditioning). This is what keeps the conditional integrator
    stable when the Gibbs legs drop tau into the funnel neck — the
    adapted marginal variance over-estimates the conditional one by
    orders of magnitude there. Returns None when no group carries the
    ancillary obs info this needs.

    ``frozen_offsets``: the flat offsets gibbs_scales actually freezes.
    A SAMPLED obs-noise coordinate may appear in a group's ancillary
    info without itself being freezable (e.g. its prior has sampled
    hyperparameters, so it forms no obs-noise Gibbs group) — a metric
    reading an UNFROZEN coordinate would be position-dependent and
    break reversibility (code-review r4 finding 1), so any latent
    whose conditional precision needs an unfrozen scale keeps its
    Welford metric instead (correct, merely less preconditioned) and a
    warning names the coordinate."""
    groups = [g for g in eligible_groups(model) if g.get("anc")]
    if frozen_offsets is None:
        frozen_offsets = {g["offset"] for g in groups}
    # the latent/mu overrides read the group's OWN scale too — only
    # groups whose scale is actually frozen may contribute
    groups = [g for g in groups if g["offset"] in frozen_offsets]
    if not groups:
        return None
    ir, ncp = model.ir, model.ncp_info
    # latent overrides: (sig_off, tf, zoff, zlen, w_const, coord_obs)
    #   w_const: precomputed sum of 1/s^2 over constant-noise obs, (L,)
    #   coord_obs: [(s_off, s_tf, n_per_elem (L,))] for SAMPLED noise —
    #   contribution n/s^2 resolved from the current point each step
    specs = []
    mu_specs = {}  # mu overrides: (mu_off, mu_len) -> [prec0, [(sig_off, tf, count)]]
    for g in groups:
        for zoff, zlen, mu_spec, obs_info in g["anc"]:
            w_const = np.zeros(zlen, np.float64)
            coord_obs = []
            for y_spec, s_spec in obs_info:
                # only SHAPES matter here (term counts per latent
                # element) — data-channel y specs carry them statically
                y_shape = (y_spec[1].shape if y_spec[0] == "const"
                           else y_spec[2])
                if s_spec[0] == "const":
                    w = 1.0 / np.square(s_spec[1])
                    w_const += np.broadcast_to(w, y_shape).reshape(
                        -1, zlen).sum(axis=0)
                else:
                    n_per = np.ones(y_shape).reshape(-1, zlen).sum(axis=0)
                    coord_obs.append((s_spec[1], s_spec[2], n_per))
            if any(off not in frozen_offsets for off, _, _ in coord_obs):
                import warnings

                warnings.warn(
                    "gibbs_scales: an observation scale feeding "
                    f"group {g['sigma_id']!r}'s conditional metric is "
                    "not itself freezable (no obs-noise Gibbs group) — "
                    "its latents keep the adapted metric; expect some "
                    "divergences at small scales", stacklevel=3)
                continue
            specs.append((g["offset"], g["transform"], zoff, zlen,
                          w_const, tuple(coord_obs)))
            if mu_spec is not None and mu_spec[0] == "coord":
                mkey = (mu_spec[1], mu_spec[2])
                if mkey not in mu_specs:
                    # prior precision of mu, when its prior is a plain
                    # constant-parameter Normal (0 otherwise — slightly
                    # under-preconditioned, conservative)
                    prec0 = 0.0
                    for nid, n in ir.nodes.items():
                        e = next((e for e in model.pm.entries
                                  if e.id == nid), None)
                        if (e is not None and e.offset == mu_spec[1]
                                and n.op[0] == "rv" and nid not in ncp
                                and get_dist(n.op[1]).name == "normal"):
                            s0 = n.op[2].get("sigma")
                            if not isinstance(s0, str):
                                prec0 = float(1.0 / np.square(
                                    np.asarray(s0, np.float64)).min())
                            break
                    mu_specs[mkey] = [prec0, []]
                # each latent element couples 1/tau^2 into its mu
                # element; a scalar mu broadcast over zlen latents gets
                # zlen such contributions, a vector mu gets one each
                count = zlen if mu_spec[2] == 1 else 1
                mu_specs[mkey][1].append((g["offset"], g["transform"], count))
    if not specs:
        return None

    def fn(q, inv):
        for off, tf, zoff, zlen, w_const, coord_obs in specs:
            tau = tf.forward(q[off])
            prec = 1.0 / jnp.maximum(tau * tau, 1e-20) + jnp.asarray(
                w_const, q.dtype)
            for s_off, s_tf, n_per in coord_obs:
                s_val = s_tf.forward(q[s_off])
                prec = prec + (jnp.asarray(n_per, q.dtype)
                               / jnp.maximum(s_val * s_val, 1e-20))
            inv = jax.lax.dynamic_update_slice(
                inv, (1.0 / prec).astype(inv.dtype), (zoff,))
        for (moff, mlen), (prec0, taus) in mu_specs.items():
            prec = jnp.asarray(prec0, q.dtype)
            for soff, stf, count in taus:
                tau = stf.forward(q[soff])
                prec = prec + count / jnp.maximum(tau * tau, 1e-20)
            inv = jax.lax.dynamic_update_slice(
                inv, jnp.full((mlen,), 1.0, q.dtype) / prec, (moff,))
        return inv

    return fn


def build_interweave(model):
    """Return ``fn(q, key) -> (q', accept_frac)`` applying one ASIS scale
    update per eligible group, or None when nothing is eligible."""
    groups = eligible_groups(model)
    if not groups:
        return None

    def step(q, key, data=None):
        accepts = []
        for g in groups:
            key, kchi, kacc = jax.random.split(key, 3)
            off, tf, n = g["offset"], g["transform"], g["n"]
            u = q[off]
            sigma = tf.forward(u)
            v = sigma * sigma
            sse = jnp.zeros((), q.dtype)
            for zoff, zlen, kind, mu_spec in g["zs"]:
                if kind == "obs_noise":
                    # sigma is an OBSERVATION noise: SSE from the
                    # observed residuals y - mean(q); pure Gibbs (the
                    # y values are data — inline or the runtime data
                    # channel — nothing rescales; zoff/zlen describe
                    # the DATA, not a q segment)
                    mu_s, y_spec = mu_spec
                    if mu_s[0] == "const":
                        mu_v = mu_s[1]
                    else:
                        mu_v = jax.lax.dynamic_slice(
                            q, (mu_s[1],), (mu_s[2],))
                    resid = _y_runtime(y_spec, data, q.dtype) - mu_v
                    sse = sse + jnp.sum(resid * resid)
                    continue
                zseg = jax.lax.dynamic_slice(q, (zoff,), (zlen,))
                if kind == "ncp":
                    # SSE contribution sigma^2 |z|^2 (|w| = |z| under
                    # the spectral rotation, so this stays exact)
                    sse = sse + v * jnp.sum(zseg * zseg)
                elif kind == "centered":
                    # centered GRW path: SSE from first differences
                    inc = jnp.concatenate([zseg[:1], jnp.diff(zseg)])
                    sse = sse + jnp.sum(inc * inc)
                else:
                    # centered Normal: SSE = |x - mu|^2, mu held fixed
                    if mu_spec[0] == "const":
                        mu_v = mu_spec[1]
                    else:
                        mu_v = jax.lax.dynamic_slice(
                            q, (mu_spec[1],), (mu_spec[2],)
                        )
                    resid = zseg - mu_v
                    sse = sse + jnp.sum(resid * resid)
            sse = jnp.maximum(sse, 1e-20)  # degenerate all-zero fiber
            # scaled-inv-chi^2 independence proposal from the dominant
            # likelihood factor: v' = SSE / chi2_n
            chi2 = 2.0 * jax.random.gamma(kchi, 0.5 * n, dtype=q.dtype)
            v_new = sse / jnp.maximum(chi2, 1e-20)
            sigma_new = jnp.sqrt(v_new)

            def lpv(s_val, v_val):
                # prior density wrt v = sigma^2: p(sqrt v) / (2 sqrt v)
                lp = g["dist"].logpdf(s_val, g["params"])
                return jnp.sum(lp) - jnp.log(2.0 * s_val)

            log_alpha = (lpv(sigma_new, v_new) - lpv(sigma, v)
                         + jnp.log(v_new) - jnp.log(v))
            accept = (jnp.log(jax.random.uniform(kacc, dtype=q.dtype))
                      < log_alpha)
            # guards: (a) the proposal can overflow to inf/0 in f32 at
            # pathological SSE; (b) sigma's constraint transform may not
            # cover all of R+ (e.g. lower=c>0 or an interval bound, whose
            # prior logpdf can be finite outside the constrained support)
            # — a proposal outside the transform's image has posterior
            # density zero AND tf.inverse writes NaN into the chain, so
            # reject unless u' = tf.inverse(sigma') is finite and maps
            # back onto sigma'.
            u_prop = tf.inverse(sigma_new)
            roundtrip = tf.forward(u_prop)
            in_domain = (jnp.isfinite(u_prop)
                         & jnp.isfinite(roundtrip)
                         & (jnp.abs(roundtrip - sigma_new)
                            <= 1e-3 * jnp.abs(sigma_new) + 1e-12))
            accept = (accept & jnp.isfinite(sigma_new) & (sigma_new > 0)
                      & in_domain)

            scale = jnp.where(accept, sigma / sigma_new, 1.0)
            u_new = jnp.where(accept, u_prop, u)
            for zoff, zlen, kind, _ in g["zs"]:
                if kind != "ncp":
                    continue  # centered latents are held fixed (pure Gibbs)
                zseg = jax.lax.dynamic_slice(q, (zoff,), (zlen,))
                q = jax.lax.dynamic_update_slice(q, zseg * scale, (zoff,))
            q = q.at[off].set(u_new)
            accepts.append(accept.astype(q.dtype))

            # ---- ancillary leg (full ASIS, centered groups only) ----
            # Hold z = (theta - mu)/sigma fixed; y = mu + sigma z + eps
            # is linear in sigma, so the likelihood factor of
            # p(sigma | z, mu, y) is N(sigma; m, s^2) — propose from it
            # truncated to sigma > 0 and MH-correct with the PRIOR ratio
            # alone (likelihood over proposal cancels exactly; the
            # (u, theta) -> (sigma, z) change of variables contributes
            # p(z)=N(0,1) constant in sigma and a unit transform
            # Jacobian, same algebra as the module docstring). theta
            # moves WITH sigma on this leg — that is what breaks the
            # slow centered-Gibbs tau walk at weak identification.
            if g["anc"] is not None:
                key, kanc, kacc2 = jax.random.split(key, 3)
                u = q[off]
                sigma = tf.forward(u)
                prec = jnp.zeros((), q.dtype)
                num = jnp.zeros((), q.dtype)
                lat = []
                for zoff, zlen, mu_spec, obs_info in g["anc"]:
                    theta = jax.lax.dynamic_slice(q, (zoff,), (zlen,))
                    if mu_spec is None or mu_spec[0] == "const":
                        mu_v = jnp.asarray(
                            0.0 if mu_spec is None else mu_spec[1], q.dtype)
                    else:
                        mu_v = jax.lax.dynamic_slice(
                            q, (mu_spec[1],), (mu_spec[2],))
                    z = (theta - mu_v) / sigma
                    for y_spec, s_spec in obs_info:
                        yb = _y_runtime(y_spec, data, q.dtype)
                        if s_spec[0] == "const":
                            s_val = jnp.asarray(s_spec[1], q.dtype)
                        else:
                            # sampled obs noise: conditioned on (read
                            # from the current point, held fixed)
                            s_val = s_spec[2].forward(q[s_spec[1]])
                        w = 1.0 / jnp.square(s_val)
                        prec = prec + jnp.sum(w * z * z
                                              * jnp.ones_like(yb))
                        num = num + jnp.sum(w * z * (yb - mu_v))
                    lat.append((zoff, theta, mu_v, z))
                if g["anc_mode"] == "prior":
                    # no observations on the fiber: the ancillary
                    # conditional of the scale given z IS its prior —
                    # exact always-accept refresh (the Neal-funnel
                    # iid mixer)
                    sigma_anc = g["dist"].sample(
                        kanc, g["params"]).astype(q.dtype).reshape(())
                    log_a2 = jnp.zeros((), q.dtype)
                else:
                    prec = jnp.maximum(prec, jnp.asarray(1e-12, q.dtype))
                    m_lik = num / prec
                    s_lik = 1.0 / jnp.sqrt(prec)
                    # inverse-CDF truncated-normal draw on (0, inf)
                    u_lo = jax.scipy.special.ndtr(-m_lik / s_lik)
                    uu = jax.random.uniform(
                        kanc, dtype=q.dtype,
                        minval=jnp.clip(u_lo, 0.0, 1.0 - 1e-6), maxval=1.0)
                    uu = jnp.clip(uu, 1e-7, 1.0 - 1e-7)
                    sigma_anc = m_lik + s_lik * jax.scipy.special.ndtri(uu)

                def lp_prior(s_val):
                    return jnp.sum(g["dist"].logpdf(s_val, g["params"]))

                if g["anc_mode"] != "prior":
                    log_a2 = lp_prior(sigma_anc) - lp_prior(sigma)
                u_prop2 = tf.inverse(sigma_anc)
                rt2 = tf.forward(u_prop2)
                in_dom2 = (jnp.isfinite(u_prop2) & jnp.isfinite(rt2)
                           & (jnp.abs(rt2 - sigma_anc)
                              <= 1e-3 * jnp.abs(sigma_anc) + 1e-12))
                acc2 = (jnp.log(jax.random.uniform(kacc2, dtype=q.dtype))
                        < log_a2)
                acc2 = (acc2 & jnp.isfinite(sigma_anc) & (sigma_anc > 0)
                        & in_dom2)
                for zoff, theta, mu_v, z in lat:
                    theta_new = jnp.where(acc2, mu_v + sigma_anc * z, theta)
                    q = jax.lax.dynamic_update_slice(
                        q, theta_new.astype(q.dtype), (zoff,))
                q = q.at[off].set(jnp.where(acc2, u_prop2, u))
                accepts.append(acc2.astype(q.dtype))
        return q, jnp.mean(jnp.stack(accepts))

    return step

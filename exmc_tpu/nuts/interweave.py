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

from exmc_tpu.dists.base import get as get_dist
from exmc_tpu.transforms import get as get_transform


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

    groups = []
    for sig, latents in by_sigma.items():
        e_sig = entries.get(sig)
        if e_sig is None or e_sig.length != 1:
            continue
        node = ir.nodes.get(sig)
        if node is None or node.op[0] != "rv":
            continue
        if sig in ncp:
            # an NCP'd scale's flat coordinate is z_sigma, not sigma —
            # the move's transform/prior bookkeeping would be wrong
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
        groups.append({
            "sigma_id": sig,
            "offset": e_sig.offset,
            "transform": get_transform(e_sig.transform),
            "dist": get_dist(node.op[1]),
            # keep f64 numpy; jnp casts per the active precision mode
            # (EXMC_TPU_X64 golden paths stay full-precision)
            "params": {k: np.asarray(v, np.float64)
                       if not np.isscalar(v) else v
                       for k, v in prior_params.items()},
            "zs": tuple(zs),
            "n": int(sum(ln for _, ln, _, _ in zs)),
        })
    return groups


def build_interweave(model):
    """Return ``fn(q, key) -> (q', accept_frac)`` applying one ASIS scale
    update per eligible group, or None when nothing is eligible."""
    groups = eligible_groups(model)
    if not groups:
        return None

    def step(q, key):
        accepts = []
        for g in groups:
            key, kchi, kacc = jax.random.split(key, 3)
            off, tf, n = g["offset"], g["transform"], g["n"]
            u = q[off]
            sigma = tf.forward(u)
            v = sigma * sigma
            sse = jnp.zeros((), q.dtype)
            for zoff, zlen, kind, mu_spec in g["zs"]:
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
        return q, jnp.mean(jnp.stack(accepts))

    return step

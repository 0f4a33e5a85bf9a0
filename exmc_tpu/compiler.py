"""Compile a model IR into a single differentiable log-density.

The reference walks the IR once at build time producing term-closures
that are pure Nx ops at runtime (reference compiler.ex, DECISIONS D11),
then JITs value_and_grad, a fused leapfrog step, and a batched
multi-step function as three separate XLA executables (compiler.ex
:131-170, batched_leapfrog.ex). On TPU we need only ONE function:
``logp(flat, data) -> scalar``. ``jax.value_and_grad`` differentiates
it, and the entire NUTS transition (exmc_tpu.nuts) inlines it into a
single jitted program — there is no step_fn/multi_step_fn boundary to
amortize.

Entry points (parity with compiler.ex:21-92):
    compile_logp(ir, ...)          -> CompiledModel (logp + value_and_grad)
    compile_for_sampling(ir, ...)  -> CompiledModel (same object; the
                                      5-tuple of the reference collapses)
    compile_pointwise(ir, ...)     -> per-observation pointwise log-lik fn
                                      for WAIC/LOO (compiler.ex:66-92)

Observation data registered with ``Builder.data`` flows through as a JIT
*argument* (reference D69): the compiled executable is cached by shape,
not by data values. Obs values / meta referencing the string
"__obs_data" resolve to that argument (compiler.ex:104-126).
"""

import dataclasses
from dataclasses import dataclass
from functools import lru_cache
from typing import Any, Callable

import numpy as np

import jax
import jax.numpy as jnp

from exmc_tpu import rewrite
from exmc_tpu import transforms as tf
from exmc_tpu.config import default_dtype
from exmc_tpu.dists.base import get as get_dist
from exmc_tpu.dists.composite import CENSORED
from exmc_tpu.ir import IR
from exmc_tpu.point_map import PointMap

OBS_DATA_KEY = "__obs_data"

# Deterministic-node op table (reference det ops; compiler resolves args
# then applies). ``affine(a, b, x) = a*x + b`` matches the measurable
# lift's inverse (compiler.ex:362-384).
DET_OPS = {
    "add": lambda a, b: a + b,
    "sub": lambda a, b: a - b,
    "mul": lambda a, b: a * b,
    "div": lambda a, b: a / b,
    "neg": lambda a: -a,
    "exp": jnp.exp,
    "log": jnp.log,
    "sqrt": jnp.sqrt,
    "abs": jnp.abs,
    "sum": jnp.sum,
    "mean": jnp.mean,
    "sigmoid": lambda x: jnp.reciprocal(1.0 + jnp.exp(-x)),
    "softplus": lambda x: jnp.logaddexp(x, 0.0),
    "matmul": lambda a, x: jnp.matmul(a, x),
    "dot": lambda a, x: jnp.dot(a, x),
    "identity": lambda x: x,
    "getitem": lambda v, i: v[jnp.asarray(i, jnp.int32)],
    # Stan's '*': matmul when the left operand is a matrix, else
    # elementwise (shapes are static under jit, so the dispatch is free)
    "smul": lambda a, b: (
        jnp.matmul(a, b) if getattr(a, "ndim", 0) == 2 else a * b
    ),
    "affine": lambda a, b, x: a * x + b,
    "cumsum": lambda x: jnp.cumsum(x, axis=-1),
    "stack": lambda *xs: jnp.stack(xs),
    "concat": lambda *xs: jnp.concatenate(xs),
}


def _is_ref(v) -> bool:
    return isinstance(v, str) and v != OBS_DATA_KEY


@dataclass
class CompiledModel:
    """Compiled artifact bundle (the reference's 5-tuple
    {vag_fn, step_fn, pm, ncp_info, multi_step_fn}, compiler.ex:46-58,
    collapses to logp + vag: the step/multi-step fns are fused into the
    NUTS kernel at trace time)."""

    ir: IR                      # rewritten IR
    pm: PointMap
    ncp_info: dict
    logp: Callable              # (flat, data=None) -> scalar
    value_and_grad: Callable    # (flat, data=None) -> (scalar, flat-like)
    data: Any = None            # default data argument from Builder.data

    @property
    def size(self) -> int:
        return self.pm.size

    def constrain(self, flat):
        """flat unconstrained -> {name: constrained value} including NCP
        reconstruction in dependency order (sampler.ex:1301-1348)."""
        return constrain_flat(self.ir, self.pm, flat)

    def unconstrain(self, xmap):
        """{name: constrained} -> flat, inverting NCP reconstruction for
        user inits: z = (x - mu) / sigma (sampler.ex:362-381, D36)."""
        zmap = dict(xmap)
        resolved = dict(xmap)
        # NCP nodes may chain; iterate until fixed point (models are DAGs)
        pending = dict(self.ncp_info)
        while pending:
            progressed = False
            for nid, info in list(pending.items()):
                mu_ref, sigma_ref = info["mu"], info["sigma"]
                mu_ok = not isinstance(mu_ref, str) or mu_ref in resolved
                # sigma may reference a det node (e.g. the funnel's
                # exp(y/2)); resolve through the compiled graph when the
                # named map alone can't supply it. Constant sigma occurs
                # for Stan <offset=..., multiplier=c> affine parameters.
                sigma_ok = (not isinstance(sigma_ref, str)
                            or sigma_ref in resolved)
                if mu_ok and sigma_ok:
                    mu = (
                        jnp.asarray(resolved[mu_ref])
                        if isinstance(mu_ref, str)
                        else jnp.asarray(mu_ref)
                    )
                    sigma = (
                        jnp.asarray(resolved[sigma_ref])
                        if isinstance(sigma_ref, str)
                        else jnp.asarray(sigma_ref)
                    )
                    zmap[nid] = _ncp_invert(info, jnp.asarray(xmap[nid]),
                                            mu, sigma)
                    del pending[nid]
                    progressed = True
            if not progressed:
                # remaining refs point at det nodes: evaluate them via the
                # resolver over the already-known unconstrained values
                known_flat = self.pm.to_unconstrained(
                    {k: zmap.get(k, xmap[k]) for k in xmap}
                )
                z_known = self.pm.unpack(known_flat)
                resolver = _make_resolver(self.ir, self.pm, z_known, self.data)
                for nid, info in list(pending.items()):
                    mu_ref, sigma_ref = info["mu"], info["sigma"]
                    mu = (
                        resolver(mu_ref)
                        if isinstance(mu_ref, str)
                        else jnp.asarray(mu_ref)
                    )
                    sigma = (
                        resolver(sigma_ref)
                        if isinstance(sigma_ref, str)
                        else jnp.asarray(sigma_ref)
                    )
                    zmap[nid] = _ncp_invert(info, jnp.asarray(xmap[nid]),
                                            mu, sigma)
                    del pending[nid]
                break
        return self.pm.to_unconstrained(zmap)


@lru_cache(maxsize=8)
def _grw_spectral_basis(t):
    """Exact orthonormal eigenbasis of the cumsum gram C^T C (C = the
    lower-triangular ones matrix of s = cumsum(z)):

        V[i, k] = 2/sqrt(2T+1) * sin((2k+1) pi (T-i) / (2T+1))
        (0-indexed; eigenvalues 1/(4 sin^2((2k+1) pi / (2(2T+1)))))

    Parameterizing the GRW latent as z = V w leaves the N(0, I) prior
    invariant (orthonormal rotation, |w| = |z| — so the interweave SSE
    and the z-node logpdf both stay exact with NO code changes) while
    making the iid-observation likelihood curvature exactly diagonal in
    w. The Welford diag metric then whitens the per-mode scales — which
    it provably cannot do for the raw increments, whose gram has
    condition ~(2T/pi)^2 (~1e7 at T=5000: measured eps ~4e-4, ESS ~4%).
    Applied as ONE (T, T) matvec — an MXU-friendly alternative to an
    FFT-based DST (jnp.fft is unimplemented on this TPU backend).
    Verified: orthogonality 2e-14, diagonalization residual 3e-11 of
    the top eigenvalue, at T=128 in f64."""
    i = np.arange(t)[:, None]
    k = np.arange(t)[None, :]
    v = 2.0 / np.sqrt(2 * t + 1) * np.sin(
        (2 * k + 1) * np.pi * (t - i) / (2 * t + 1)
    )
    return v  # f64; cast at use site so EXMC_TPU_X64 keeps full precision


def _ncp_invert(info, x, mu, sigma):
    """Inverse NCP reconstruction for user inits (D36): standard
    z = (x - mu)/sigma; GRW kind inverts s = sigma*cumsum(z) via the
    first-difference operator (+ the spectral rotation w = V^T z)."""
    if info.get("kind") == "grw":
        inc = jnp.concatenate([x[..., :1], jnp.diff(x, axis=-1)], axis=-1)
        z = inc / sigma
        if info.get("spectral"):
            v = jnp.asarray(_grw_spectral_basis(z.shape[-1]), z.dtype)
            z = jnp.einsum("ij,...i->...j", v, z)
        return z
    return (x - mu) / sigma


def _apply_obs_meta(lp, meta):
    """weight -> mask -> reduce, in that order (compiler.ex:401-418)."""
    weight = meta.get("weight", 1.0)
    if not (isinstance(weight, float) and weight == 1.0):
        lp = lp * jnp.asarray(weight)
    mask = meta.get("mask")
    if mask is not None:
        lp = jnp.where(jnp.asarray(mask, dtype=bool), lp, jnp.zeros_like(lp))
    reduce = meta.get("reduce")
    if reduce == "sum":
        return jnp.sum(lp)
    if reduce == "mean":
        return jnp.mean(lp)
    if reduce == "logsumexp":
        return jax.scipy.special.logsumexp(lp)
    return lp


def _make_resolver(ir: IR, pm: PointMap, zmap: dict, data):
    """Constrained-value resolver with memoization.

    Resolves a node id to its *constrained* value (compiler.ex:436-459,
    D28), applying NCP reconstruction ``mu + sigma * z`` recursively
    (compiler.ex:446-458)."""
    memo = {}
    free_ids = {e.id for e in pm.entries}

    def resolve(ref):
        if ref == OBS_DATA_KEY:
            return _base_data(data)
        if ref in memo:
            return memo[ref]
        node = ir.get_node(ref)
        tag = node.op[0]
        if tag == "det":
            fn = node.op[1]
            fn = DET_OPS[fn] if isinstance(fn, str) else fn
            args = [
                resolve(a) if isinstance(a, str) else jnp.asarray(a)
                for a in node.op[2]  # str = node ref or "__obs_data"
            ]
            val = fn(*args)
        elif tag == "rv":
            if ref not in free_ids:
                raise ValueError(
                    f"node {ref!r} referenced but is observed — reference the "
                    "observation's value directly"
                )
            transform = node.op[3] if len(node.op) == 4 else None
            z = zmap[ref]
            x = tf.get(transform).forward(z)
            if ref in ir.ncp_info:
                info = ir.ncp_info[ref]
                if info.get("kind") == "grw":
                    # s = sigma * cumsum(z): GRW non-centered form;
                    # spectral entries sample w with z = V w (see
                    # _grw_spectral_basis)
                    if info.get("spectral"):
                        v = jnp.asarray(_grw_spectral_basis(x.shape[-1]),
                                        x.dtype)
                        x = jnp.einsum("ij,...j->...i", v, x)
                    x = resolve(info["sigma"]) * jnp.cumsum(x, axis=-1)
                else:
                    mu_v = (
                        resolve(info["mu"])
                        if isinstance(info["mu"], str)
                        else jnp.asarray(info["mu"])
                    )
                    sig_v = (
                        resolve(info["sigma"])
                        if isinstance(info["sigma"], str)
                        else jnp.asarray(info["sigma"])
                    )
                    x = mu_v + sig_v * x
            val = x
        else:
            raise ValueError(f"cannot resolve node {ref!r} of kind {tag!r}")
        memo[ref] = val
        return val

    return resolve


def _resolve_params(params, resolve, dist=None):
    out = {}
    for k, v in params.items():
        if isinstance(v, str):
            out[k] = resolve(v)  # node ref, or "__obs_data" -> data arg
        elif k == "params" and isinstance(v, (list, tuple)):
            out[k] = [_resolve_params(p, resolve) for p in v]
        elif k == "components":
            out[k] = v
        elif isinstance(v, dict):
            out[k] = {
                kk: (resolve(vv) if _is_ref(vv) else jnp.asarray(vv))
                for kk, vv in v.items()
            }
        else:
            out[k] = jnp.asarray(v)
    return out


def _resolve_value(value, data):
    """Obs values may be arrays, {"lower","upper"} dicts (interval
    censoring), the string "__obs_data" (-> JIT data argument, D69), or
    a KEYED ref ("__obs_data", key) -> data[key] — the multi-obs data
    channel the SBC harness rides (one compiled program, a dict of
    per-replication synthetic datasets)."""
    if isinstance(value, str):
        if value == OBS_DATA_KEY:
            return _base_data(data)
        raise ValueError(f"bad obs value ref: {value!r}")
    if (isinstance(value, tuple) and len(value) == 2
            and value[0] == OBS_DATA_KEY):
        return data[value[1]]
    if isinstance(value, dict):
        return {k: jnp.asarray(v) for k, v in value.items()}
    return jnp.asarray(value)


def _base_data(data):
    """The value plain "__obs_data" refs see. When the data pytree is a
    dict carrying keyed obs entries, the model's original data rides
    the reserved "__base" key (so det nodes / Custom dists keep
    resolving what they were compiled against)."""
    if isinstance(data, dict) and "__base" in data:
        return data["__base"]
    return data


def _rv_prior_term(node, entry, zmap, resolve, ir):
    """Free-RV log-prior + transform Jacobian (compiler.ex:200-235)."""
    dist = get_dist(node.op[1])
    dist.validate_ir_params(node.op[2])
    transform = node.op[3] if len(node.op) == 4 else None
    t = tf.get(transform)
    z = zmap[node.id]
    x = t.forward(z)
    params = _resolve_params(node.op[2], resolve)
    if isinstance(dist.name, str) and dist.name == "custom":
        params["__data__"] = resolve(OBS_DATA_KEY)
    lp = dist.logpdf(x, params)
    return jnp.sum(lp) + t.log_abs_det_jacobian(z)


def _obs_term(node, ir, resolve, data):
    """Observation log-likelihood with meta (compiler.ex:271-338)."""
    _, target_id, value, meta = node.op
    target = ir.get_node(target_id)
    dist = get_dist(target.op[1])
    params = _resolve_params(target.op[2], resolve)
    if dist.name == "custom":
        params["__data__"] = data
    value = _resolve_value(value, data)

    censor = meta.get("censored")
    if censor is not None:
        lp = CENSORED.log_likelihood(censor, value, dist, params)
        return _apply_obs_meta(lp, {k: v for k, v in meta.items() if k != "censored"})

    # obs logp is the dist's density at the observed value — no transform
    # Jacobian (the rewrite pass no longer attaches transforms to observed
    # RVs; see attach_default_transforms)
    lp = dist.logpdf(value, params)
    return _apply_obs_meta(lp, meta)


def _meas_obs_term(node, ir, resolve, data):
    """Measurable-lifted observation with change-of-measure Jacobian
    (compiler.ex:342-384)."""
    _, rv_id, value, op_info, meta = node.op
    target = ir.get_node(rv_id)
    dist = get_dist(target.op[1])
    params = _resolve_params(target.op[2], resolve)
    value = _resolve_value(value, data)

    kind = op_info[0]
    if kind == "matmul":
        a = resolve(op_info[1]) if _is_ref(op_info[1]) else jnp.asarray(op_info[1])
        x = jnp.linalg.solve(a, value)
        meas_jac = -jnp.log(jnp.abs(jnp.linalg.det(a)))
    elif kind == "affine":
        a = resolve(op_info[1]) if _is_ref(op_info[1]) else jnp.asarray(op_info[1])
        b = resolve(op_info[2]) if _is_ref(op_info[2]) else jnp.asarray(op_info[2])
        x = (value - b) / a
        meas_jac = -jnp.sum(jnp.log(jnp.abs(a)))
    else:
        raise ValueError(f"unknown measurable op: {kind!r}")

    lp = dist.logpdf(x, params)
    return _apply_obs_meta(lp, meta) + meas_jac


def _make_logp(ir: IR, pm: PointMap, pointwise: bool = False,
               part: str = "all"):
    """``part``: "all" (default), "prior" (rv terms only — a NORMALIZED
    density in unconstrained space, since each rv term is a normalized
    pdf plus its transform Jacobian), or "likelihood" (obs/meas_obs
    terms only). prior + likelihood == all, term by term — the split
    likelihood-tempering SMC evidence estimation needs (smc.py)."""
    if part not in ("all", "prior", "likelihood"):
        raise ValueError(f"part must be all|prior|likelihood, got {part!r}")
    free_ids = {e.id for e in pm.entries}
    entry_by_id = {e.id: e for e in pm.entries}
    node_ids = sorted(ir.nodes)  # deterministic term order

    def logp(flat, data=None):
        flat = jnp.asarray(flat, dtype=default_dtype())
        zmap = pm.unpack(flat)
        resolve = _make_resolver(ir, pm, zmap, data)
        terms = {}
        for nid in node_ids:
            node = ir.nodes[nid]
            tag = node.op[0]
            if tag in ("obs", "meas_obs") and (
                part == "prior"
                or node.op[-1].get("likelihood", True) is False
            ):
                # likelihood=False obs are excluded from the sampled
                # log-density (reference compiler.ex:244-246); they exist
                # for bookkeeping (e.g. held-out data) only
                continue
            if tag == "rv" and part == "likelihood":
                continue
            if tag == "rv" and nid in free_ids:
                terms[nid] = _rv_prior_term(node, entry_by_id[nid], zmap, resolve, ir)
            elif tag == "obs":
                if pointwise:
                    # pointwise mode: per-datapoint log-lik, no reduce
                    # (compiler.ex:66-92)
                    meta = {k: v for k, v in node.op[3].items() if k != "reduce"}
                    pw_node = dataclasses.replace(node, op=node.op[:3] + (meta,))
                    terms[nid] = _obs_term(pw_node, ir, resolve, data)
                else:
                    terms[nid] = _obs_term(node, ir, resolve, data)
            elif tag == "meas_obs":
                terms[nid] = _meas_obs_term(node, ir, resolve, data)
        if pointwise:
            return {
                nid: terms[nid]
                for nid in node_ids
                if ir.nodes[nid].op[0] in ("obs", "meas_obs")
                and ir.nodes[nid].op[-1].get("likelihood", True)
            }
        if not terms:
            return jnp.zeros((), dtype=default_dtype())
        total = jnp.zeros((), dtype=default_dtype())
        for nid in node_ids:
            if nid in terms:
                total = total + jnp.sum(terms[nid])
        return total

    return logp


def compile_logp(ir: IR, *, ncp: bool = True, rewritten: bool = False) -> CompiledModel:
    """Rewrite + compile an IR into a CompiledModel (compiler.ex:21-58)."""
    rw = ir if rewritten else rewrite.apply(ir, ncp=ncp)
    pm = PointMap.build(rw)
    logp = _make_logp(rw, pm)
    vag = jax.value_and_grad(logp)
    return CompiledModel(
        ir=rw,
        pm=pm,
        ncp_info=rw.ncp_info,
        logp=logp,
        value_and_grad=vag,
        data=rw.data,
    )


def partial_logp(model: CompiledModel, part: str) -> Callable:
    """Prior-only or likelihood-only log-density on the SAME PointMap
    (and rewritten IR) as ``model.logp``, so the two parts sum to the
    full log-density at every flat point. Used by likelihood-tempering
    SMC (smc.py) for evidence estimation."""
    return _make_logp(model.ir, model.pm, part=part)


# The reference returns a 5-tuple with separate jitted step functions
# (compiler.ex:46-58); here sampling consumes CompiledModel directly.
compile_for_sampling = compile_logp


def compile_pointwise(ir: IR, *, ncp: bool = True) -> Callable:
    """Pointwise per-observation log-likelihood fn for WAIC/LOO
    (compiler.ex:66-92): (flat, data=None) -> {obs_id: loglik array}."""
    rw = rewrite.apply(ir, ncp=ncp)
    pm = PointMap.build(rw)
    return _make_logp(rw, pm, pointwise=True)


def constrain_flat(ir: IR, pm: PointMap, flat, data=None) -> dict:
    """flat -> named constrained values with NCP reconstruction
    (sampler.ex:1281-1348). Pure jnp; vmap over draws for whole traces.
    ``data`` overrides ``ir.data`` (NCP refs may resolve through det
    nodes that read the data argument)."""
    if data is None:
        data = ir.data
    zmap = pm.unpack(jnp.asarray(flat, dtype=default_dtype()))
    resolve = _make_resolver(ir, pm, zmap, data)
    return {e.id: resolve(e.id) for e in pm.entries}

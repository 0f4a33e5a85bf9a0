"""Prior and posterior predictive sampling (reference predictive.ex).

* prior_samples — Kahn topological sort of the RV DAG, forward
  ``dist.sample`` per node (predictive.ex:19-33,140-196). On TPU all
  draws run in one vmapped jitted pass with threaded jax.random keys
  (replacing the reference's host :rand loop).
* posterior_predictive — for each obs node, resolve the target's params
  from each posterior draw and sample from the likelihood
  (predictive.ex:44-63).
"""

import numpy as np
import jax
import jax.numpy as jnp

from exmc_tpu import rewrite
from exmc_tpu.compiler import DET_OPS, OBS_DATA_KEY, _is_ref, _resolve_value
from exmc_tpu.dists.base import get as get_dist
from exmc_tpu.ir import IR
from exmc_tpu.point_map import _infer_shape


def _topo_order(ir: IR):
    """Kahn topological sort over node deps + param refs
    (predictive.ex:140-196)."""
    indeg = {nid: 0 for nid in ir.nodes}
    children = {nid: [] for nid in ir.nodes}
    for nid, node in ir.nodes.items():
        for dep in node.deps:
            if dep in ir.nodes:
                indeg[nid] += 1
                children[dep].append(nid)
    queue = sorted([nid for nid, k in indeg.items() if k == 0])
    order = []
    while queue:
        nid = queue.pop(0)
        order.append(nid)
        for ch in sorted(children[nid]):
            indeg[ch] -= 1
            if indeg[ch] == 0:
                queue.append(ch)
    if len(order) != len(ir.nodes):
        raise ValueError("model graph has a cycle")
    return order


def _forward_draw(ir: IR, order, key, data):
    """One forward sample of every RV/det node; returns {id: value}."""
    vm = {}
    for nid in order:
        node = ir.nodes[nid]
        tag = node.op[0]
        if tag == "rv":
            dist = get_dist(node.op[1])
            params = {
                k: (vm[v] if _is_ref(v) else (data if v == "__obs_data" else v))
                if isinstance(v, str)
                else v
                for k, v in node.op[2].items()
            }
            shape = _infer_shape(node)
            key, sub = jax.random.split(key)
            vm[nid] = dist.sample(sub, params, shape)
            tf = node.op[3] if len(node.op) == 4 else None
            tf_name = tf if isinstance(tf, str) else getattr(tf, "name", None)
            if tf_name in ("ordered", "positive_ordered"):
                # an ordered-transform prior restricts an iid dist to
                # the sorted cone; for EXCHANGEABLE components (scalar
                # params) the restriction of iid draws equals sorted
                # iid draws exactly (symmetry: the cone has prior mass
                # 1/K!), so forward sampling = sample + sort
                if any(jnp.ndim(p) > 0 for p in params.values()):
                    raise ValueError(
                        f"prior_samples: rv {nid!r} has an ordered "
                        "transform with non-scalar params — components "
                        "are not exchangeable, the sorted-iid forward "
                        "sample would not match the model prior"
                    )
                vm[nid] = jnp.sort(vm[nid], axis=-1)
        elif tag == "det":
            fn = node.op[1]
            fn = DET_OPS[fn] if isinstance(fn, str) else fn
            args = [
                vm[a] if _is_ref(a) else jnp.asarray(a) for a in node.op[2]
            ]
            vm[nid] = fn(*args)
    return vm


def prior_samples(ir: IR, num_draws=500, seed=0, data=None,
                  rewritten=False):
    """Prior predictive: forward-sample the whole DAG ``num_draws`` times
    (predictive.ex:19-33). Returns {rv_id: (num_draws, *shape)}.

    ``rewritten=True`` skips the rewrite and samples ``ir`` as-is —
    for ALREADY-rewritten IRs (e.g. ``CompiledModel.ir``, where NCP'd
    nodes forward-sample their z-space values directly)."""
    rw = ir if rewritten else rewrite.apply(ir, ncp=False)
    if data is None:
        data = rw.data
    order = [nid for nid in _topo_order(rw) if rw.nodes[nid].op[0] in ("rv", "det")]

    @jax.jit
    def run(keys):
        return jax.vmap(lambda k: _forward_draw(rw, order, k, data))(keys)

    keys = jax.random.split(jax.random.PRNGKey(seed), num_draws)
    out = run(keys)
    return {k: np.asarray(v) for k, v in out.items()}


def posterior_predictive(ir: IR, trace, seed=0, data=None, ncp=True):
    """Posterior predictive: for each obs node, resolve the target RV's
    params from each posterior draw and sample the likelihood
    (predictive.ex:44-63). ``trace`` is the constrained named trace from
    ``sample`` ((chains, draws, ...) arrays).

    Returns {obs_id: (chains, draws, *obs_shape)}."""
    from exmc_tpu.compiler import compile_logp, _make_resolver, _resolve_params

    model = compile_logp(ir, ncp=ncp)
    rw, pm = model.ir, model.pm
    if data is None:
        data = rw.data

    obs_nodes = [
        (nid, n) for nid, n in sorted(rw.nodes.items()) if n.op[0] in ("obs", "meas_obs")
    ]
    names = [e.id for e in pm.entries]
    arrs = {k: jnp.asarray(np.asarray(trace[k])) for k in names}
    c, n = next(iter(arrs.values())).shape[:2]

    def one(idx, key):
        row = {k: arrs[k].reshape((c * n,) + arrs[k].shape[2:])[idx] for k in names}
        flat = model.unconstrain(row)
        zmap = pm.unpack(flat)
        resolve = _make_resolver(rw, pm, zmap, data)
        out = {}
        for obs_id, node in obs_nodes:
            target = rw.get_node(node.op[1])
            dist = get_dist(target.op[1])
            # _resolve_params handles composite param structures
            # (Mixture's components/params lists) recursively, so mixture
            # likelihoods sample correctly instead of KeyError-ing
            # (ADVICE r1)
            params = _resolve_params(target.op[2], resolve)
            value = node.op[2]
            shape = (
                tuple(np.asarray(value).shape)
                if not isinstance(value, (str, dict, tuple))
                else _infer_shape(target)
            )
            key, sub = jax.random.split(key)
            draw = dist.sample(sub, params, shape)
            if node.op[0] == "meas_obs":
                # the OBSERVED quantity is the measurable transform of
                # the target RV (compiler._meas_obs_term inverts it) —
                # predictive simulation must apply it forward
                op_info = node.op[3]
                kind = op_info[0]
                a = (resolve(op_info[1]) if isinstance(op_info[1], str)
                     else jnp.asarray(op_info[1]))
                if kind == "matmul":
                    draw = a @ draw
                elif kind == "affine":
                    b = (resolve(op_info[2])
                         if isinstance(op_info[2], str)
                         else jnp.asarray(op_info[2]))
                    draw = a * draw + b
                else:
                    raise ValueError(f"unknown measurable op: {kind!r}")
            out[obs_id] = draw
        return out

    keys = jax.random.split(jax.random.PRNGKey(seed), c * n)
    out = jax.jit(jax.vmap(one))(jnp.arange(c * n), keys)
    return {
        k: np.asarray(v).reshape((c, n) + np.asarray(v).shape[1:])
        for k, v in out.items()
    }


def ppc_pvalue(ir, trace, stat, data=None, ncp=True, seed=0, obs_id=None):
    """Posterior predictive check (Gelman/Meng/Stern): the Bayesian
    p-value p = P(T(y_rep) >= T(y_obs)) for a test statistic ``stat``
    (a callable mapping an observation array to a scalar, e.g.
    ``np.std``, or ``lambda y: np.abs(skew(y))``). Beyond the
    reference's predictive surface (predictive.ex samples replicates
    but ships no check statistic).

    ``obs_id`` selects the observation node when the model has several
    (default: the only one; raises if ambiguous). Returns a dict with
    ``p_value``, ``observed``, ``replicated`` (per-draw statistics) —
    p near 0 or 1 flags misfit in the direction T measures."""
    reps = posterior_predictive(ir, trace, seed=seed, data=data, ncp=ncp)
    if obs_id is None:
        if len(reps) != 1:
            raise ValueError(
                f"model has {len(reps)} obs nodes ({sorted(reps)}); "
                "pass obs_id=")
        obs_id = next(iter(reps))
    if obs_id not in reps:
        raise ValueError(f"unknown obs node {obs_id!r} ({sorted(reps)})")

    node = (ir.ir if hasattr(ir, "ir") else ir).nodes[obs_id]
    observed_value = node.op[2]
    if isinstance(observed_value, str) or (
            isinstance(observed_value, tuple) and len(observed_value) == 2
            and observed_value[0] == OBS_DATA_KEY):
        # value rides the data channel: plain "__obs_data" (D69) or a
        # keyed ("__obs_data", key) ref (D-T27) — resolve exactly as
        # the compiler does (incl. the "__base" convention)
        src = data if data is not None else (
            ir.ir.data if hasattr(ir, "ir") else ir.data)
        observed_value = _resolve_value(observed_value, src)
    if isinstance(observed_value, dict):
        raise ValueError(
            "ppc_pvalue does not support interval-censored obs values")
    observed_value = np.asarray(observed_value)

    rep_arr = np.asarray(reps[obs_id])
    rep_flat = rep_arr.reshape((-1,) + rep_arr.shape[2:])
    t_obs = float(stat(observed_value))
    t_rep = np.asarray([float(stat(r)) for r in rep_flat])
    return {
        "p_value": float((t_rep >= t_obs).mean()),
        "observed": t_obs,
        "replicated": t_rep,
        "obs_id": obs_id,
    }

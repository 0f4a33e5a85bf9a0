"""Rewrite passes 1-5 (reference lib/exmc/rewrite/).

Pure IR->IR functions; each node is rewritten independently.
"""

from dataclasses import replace

from exmc_tpu.dists.base import get as get_dist
from exmc_tpu.ir import IR, observed_target_ids


def attach_default_transforms(ir: IR) -> IR:
    """("rv", d, p) -> ("rv", d, p, transform) from the dist's default
    (reference attach_default_transforms.ex:24-29). RVs that already carry
    an explicit transform are left alone.

    Deliberate divergence from the reference: OBSERVED RVs are skipped.
    Constraint transforms exist so NUTS can explore free RVs in
    unconstrained space; an observed RV's value never moves, and pushing
    it through the inverse transform only injects a spurious Jacobian —
    which is -inf for discrete observations (logit(0)), the bug that made
    every Bernoulli-observation model's logp -inf."""
    observed = observed_target_ids(ir)
    nodes = {}
    for nid, node in ir.nodes.items():
        if node.op[0] == "rv" and len(node.op) == 3 and nid not in observed:
            _, dist, params = node.op
            transform = get_dist(dist).default_transform(params)
            if transform is not None:
                node = replace(node, op=("rv", dist, params, transform))
        nodes[nid] = node
    return replace(ir, nodes=nodes)


def _lift(ir: IR, det_fn: str, make_op_info) -> IR:
    """Shared machinery for lifting obs(det(fn(..., rv))) into a
    measurable observation (reference lift_measurable_matmul.ex:23-47)."""
    nodes = {}
    for nid, node in ir.nodes.items():
        if node.op[0] == "obs":
            _, target_id, value, meta = _canonical_obs(node.op)
            target = ir.nodes.get(target_id)
            if target is not None and target.op[0] == "det" and target.op[1] == det_fn:
                args = target.op[2]
                lifted = make_op_info(args)
                if lifted is not None:
                    rv_id, op_info = lifted
                    node = replace(
                        node,
                        op=("meas_obs", rv_id, value, op_info, meta),
                        deps=(rv_id,),
                    )
        nodes[nid] = node
    return replace(ir, nodes=nodes)


def lift_measurable_matmul(ir: IR) -> IR:
    """obs(det(matmul(A, rv))) -> ("meas_obs", rv, value, ("matmul", A), meta)."""

    def make(args):
        if len(args) == 2 and isinstance(args[1], str):
            return args[1], ("matmul", args[0])
        return None

    return _lift(ir, "matmul", make)


def lift_measurable_affine(ir: IR) -> IR:
    """obs(det(affine(a, b, rv))) -> ("meas_obs", rv, value, ("affine", a, b), meta),
    where affine(a, b, x) = a*x + b (reference compiler.ex:362-384)."""

    def make(args):
        if len(args) == 3 and isinstance(args[2], str):
            return args[2], ("affine", args[0], args[1])
        return None

    return _lift(ir, "affine", make)


def _canonical_obs(op):
    """obs ops are always stored as 4-tuples here; accept 3-tuples for
    robustness (reference normalize_obs.ex)."""
    if len(op) == 3:
        return (op[0], op[1], op[2], {})
    return op


def normalize_obs(ir: IR) -> IR:
    """obs -> canonical ("obs", target, value, meta) 4-tuple
    (reference normalize_obs.ex)."""
    nodes = {}
    for nid, node in ir.nodes.items():
        if node.op[0] == "obs":
            node = replace(node, op=_canonical_obs(node.op))
        nodes[nid] = node
    return replace(ir, nodes=nodes)


_META_DEFAULTS = {"likelihood": True, "weight": 1.0, "mask": None, "reduce": None}


def populate_obs_metadata(ir: IR) -> IR:
    """Fill meta defaults likelihood/weight/mask/reduce
    (reference populate_obs_metadata.ex)."""
    nodes = {}
    for nid, node in ir.nodes.items():
        tag = node.op[0]
        if tag in ("obs", "meas_obs"):
            meta = dict(_META_DEFAULTS)
            meta.update(node.op[-1])
            node = replace(node, op=node.op[:-1] + (meta,))
        nodes[nid] = node
    return replace(ir, nodes=nodes)

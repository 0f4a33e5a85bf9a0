"""Interpreted-style log-prob evaluation over an IR + named value map
(reference Exmc.LogProb, log_prob.ex:29 — "same term semantics as
Compiler; used by tests/doctests").

In JAX there is no compiled/interpreted split — the compiled logp IS a
plain Python function until jitted — so this module is a thin
convenience API: evaluate a model's log-density at a named point
without touching flat vectors."""

from exmc_tpu.compiler import CompiledModel, compile_logp


def eval(ir, values, data=None, *, ncp=True, constrained=True):
    """Evaluate log p at a named value map.

    ``values``: dict free-RV name -> value. With ``constrained=True``
    (default) values are in the dists' supports and are pulled back
    through the inverse transforms (matching the trace convention);
    with ``constrained=False`` they are unconstrained z-values packed
    directly. Either way the result matches the compiled
    ``logp(flat)`` at the corresponding flat point (transform Jacobians
    included — reference compiler term semantics)."""
    model = ir if isinstance(ir, CompiledModel) else compile_logp(ir, ncp=ncp)
    if data is None:
        data = model.data
    if constrained:
        flat = model.unconstrain(values)
    else:
        flat = model.pm.pack(values)
    return model.logp(flat, data)

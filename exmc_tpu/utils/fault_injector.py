"""Deliberate numerical-fault injection (reference
nuts/fault_injector.ex:23-66 + fault_tolerant_test.exs).

The reference arms process-dictionary fault specs that raise inside the
host tree builder; the supervised tree catches them and substitutes
divergent placeholders (tree.ex:920-1008). In the TPU design there is
no host tree to crash — the failure domain is NUMERICAL: the kernel's
divergence semantics already absorb any NaN/Inf the log-density
produces (tree.py: ``~(delta >= -threshold)`` is NaN-safe, D26/D56).

So the injector here wraps a compiled model's value_and_grad and
produces NaN/Inf/garbage at chosen trigger conditions, letting tests
verify the four-layer recovery story end-to-end: faults become
divergent leaves, trajectories terminate, the sampler keeps running and
reports finite draws.
"""

from dataclasses import dataclass
import jax.numpy as jnp


@dataclass
class FaultInjector:
    """Wraps ``vag_fn``-style callables with a fault region.

    kind: "nan" | "inf" | "huge_grad" — the numerical analogues of the
    reference's :crash/:oom/:exla/:arithmetic fault classes (all of
    which surface as non-finite math inside one XLA program).
    trigger_region: (lo, hi) — fault fires when any coordinate of q
    falls inside [lo, hi] (a spatial trigger replaces the reference's
    step-count trigger, which has no meaning inside one fused kernel).
    """

    kind: str = "nan"
    trigger_lo: float = 0.0
    trigger_hi: float = 0.5

    def wrap(self, vag_fn):
        kind = self.kind
        lo, hi = self.trigger_lo, self.trigger_hi

        def wrapped(q, *args):
            v, g = vag_fn(q, *args)
            hit = jnp.any((q >= lo) & (q <= hi))
            if kind == "nan":
                v = jnp.where(hit, jnp.nan, v)
            elif kind == "inf":
                v = jnp.where(hit, -jnp.inf, v)
            elif kind == "huge_grad":
                g = jnp.where(hit, g * 1e30, g)
            else:
                raise ValueError(f"unknown fault kind {kind!r}")
            return v, g

        return wrapped

    def wrap_model(self, model):
        """Return a shallow copy of a CompiledModel with faulted
        logp/value_and_grad."""
        import dataclasses

        vag = self.wrap(model.value_and_grad)

        def logp(q, data=None):
            return vag(q, data)[0]

        return dataclasses.replace(model, logp=logp, value_and_grad=vag)

"""Profiling hooks (SURVEY.md §5.1: "TPU build: keep per-step stats as
scan outputs; add jax.profiler traces").

Per-step sample_stats (depth, n_steps, diverging, accept_prob, energy,
logp) are already scan outputs of the sampler. This adds the
device-trace wrapper around any sampling call.
"""

import contextlib

import jax


@contextlib.contextmanager
def trace_profile(logdir="/tmp/exmc_tpu_trace"):
    """Capture a jax.profiler device trace around a block::

        with trace_profile("/tmp/trace"):
            sample(ir, ...)
    """
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()

"""Checkpoint / resume for sampling runs (SURVEY.md §5.4).

The reference has no trace checkpointing — its analogue is warm-start
(sampler.ex:176-198, D71), which exmc_tpu also supports directly via
``sample(..., warm_start=stats)``. This module adds the full
orbax-style checkpoint of (positions, tuning, rng seed) the survey
calls for: save after a run, resume later with a 50-iteration
fine-tune instead of full warmup. Plain ``.npz`` by default; if orbax
is importable it can be swapped in by the caller — the payload is a
flat dict of arrays either way.
"""

import numpy as np


def save_checkpoint(path, stats, *, seed=None, positions=None, extra=None):
    """Persist tuning (+ optionally final positions) from a ``sample``
    stats dict."""
    payload = {
        "step_size": np.asarray(stats["step_size"]),
        "inv_mass": np.asarray(stats["inv_mass"]),
    }
    if positions is not None:
        payload["positions"] = np.asarray(positions)
    if seed is not None:
        payload["seed"] = np.asarray(seed)
    if extra:
        for k, v in extra.items():
            payload[f"extra_{k}"] = np.asarray(v)
    np.savez(path, **payload)


def load_checkpoint(path):
    """Load a checkpoint; the returned dict plugs straight into
    ``sample(..., warm_start=ckpt)``. Per-chain tuning arrays are kept
    per-chain (round 2: no more collapsing to chain 0) — ``sample``
    broadcasts them when the chain counts match, and raises when they
    don't (resume with the same num_chains, or index chain 0 yourself)."""
    with np.load(path) as z:
        out = {k: z[k] for k in z.files}
    out["warm_start"] = {
        "step_size": out["step_size"],
        "inv_mass": out["inv_mass"],
    }
    return out

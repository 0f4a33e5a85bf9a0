"""Action model: softmax over (fold, call, raise) given player params and
hand strength (reference poker/action_model.ex:27-107). Logit structure
mirrored exactly; vectorized over (players, hands)."""

import numpy as np
import jax
import jax.numpy as jnp


def action_logits(vpip, pfr, agg, bluff, hs):
    """Inputs broadcast together; returns (..., 3) logits
    (action_model.ex:36-52)."""
    vpip = jnp.clip(vpip, -5.0, 5.0)
    pfr = jnp.clip(pfr, -5.0, 5.0)
    agg = jnp.clip(agg, 0.01, 10.0)
    bluff = jnp.clip(bluff, -5.0, 5.0)
    fold_l = jnp.zeros_like(hs)
    call_l = hs * 2.0 + vpip * 3.0 - 1.0
    raise_l = hs * 2.0 * agg + pfr * 3.0 + bluff * (1.0 - hs) * 3.0 - 1.5
    return jnp.stack([fold_l, call_l, raise_l], axis=-1)


def log_action_probs(vpip, pfr, agg, bluff, hs):
    """log softmax over the last axis (action_model.ex:52-53,103-107)."""
    return jax.nn.log_softmax(action_logits(vpip, pfr, agg, bluff, hs), axis=-1)


def gather_log_probs(log_probs, actions):
    """Select observed-action log-probs via one-hot
    (action_model.ex:66-69)."""
    one_hot = jax.nn.one_hot(actions.astype(jnp.int32), 3, dtype=log_probs.dtype)
    return jnp.sum(log_probs * one_hot, axis=-1)


def action_probs(vpip, pfr, agg, bluff, hand_strength):
    """Host-side probs for simulation/decision (action_model.ex:74-89)."""
    fold_l = 0.0
    call_l = vpip * 3.0 + hand_strength * 2.0 - 1.0
    raise_l = (
        pfr * 3.0 + agg * hand_strength * 2.0
        + bluff * (1.0 - hand_strength) * 3.0 - 1.5
    )
    ls = np.array([fold_l, call_l, raise_l])
    e = np.exp(ls - ls.max())
    p = e / e.sum()
    return float(p[0]), float(p[1]), float(p[2])


def sample_action(rng, vpip, pfr, agg, bluff, hand_strength):
    p_fold, p_call, _ = action_probs(vpip, pfr, agg, bluff, hand_strength)
    u = rng.random()
    if u < p_fold:
        return 0
    if u < p_fold + p_call:
        return 1
    return 2

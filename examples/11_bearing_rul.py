"""Bearing degradation and remaining useful life (RUL)
(reference notebooks/15_bearing_degradation.livemd narrative,
FEMTO/PRONOSTIA-style run-to-failure data).

A bearing's vibration RMS grows exponentially in the final failure
stage, but the growth rate varies by bearing, load, and lubrication.
A curve fit to ONE bearing's short history has wide uncertainty; a
hierarchical model over a fleet of run-to-failure records narrows it —
this bearing's rate is informed by every bearing that failed before it.

Model (log scale turns exponential growth into a line):
    log y_{b,t} ~ Normal(log_a_b + r_b * t, sigma_noise)
    log_a_b ~ Normal(mu_a, sigma_a)   (NCP)
    r_b     ~ Normal(mu_r, sigma_r)   (NCP, rates are per-hour)

TPU-first formulation: all bearings' series stack into one (B, T)
tensor; the likelihood is a single broadcast Normal logpdf. The
reference notebook fits per-bearing curves in a host loop.

The deliverable is not "42 hours remaining" but
P(RMS crosses the alarm threshold before the maintenance window) —
computed from the full posterior, vmapped over draws.
"""

import os

import numpy as np

from exmc_tpu import Builder, dists, sample
from exmc_tpu.diagnostics import rhat

SMOKE = os.environ.get("EXMC_EXAMPLES_SMOKE") == "1"

B, T = 12, 40                      # fleet bearings x hourly RMS snapshots
DT = 1.0                           # hours between snapshots
THRESHOLD = 4.5                    # alarm RMS, mm/s
WINDOW_H = 30.0                    # maintenance window, hours from now
TRUE = {"mu_a": np.log(0.55), "sigma_a": 0.25,
        "mu_r": 0.045, "sigma_r": 0.012, "noise": 0.08}


def generate(seed=11):
    rng = np.random.default_rng(seed)
    log_a = rng.normal(TRUE["mu_a"], TRUE["sigma_a"], B)
    r = np.abs(rng.normal(TRUE["mu_r"], TRUE["sigma_r"], B))
    t = np.arange(T) * DT
    log_y = log_a[:, None] + r[:, None] * t[None, :]
    log_y += rng.normal(0.0, TRUE["noise"], (B, T))
    return log_y.astype(np.float32), r


def build(log_y):
    import jax.numpy as jnp

    t = jnp.arange(T, dtype=jnp.float32) * DT

    ir = Builder.new_ir()
    ir = Builder.rv(ir, "mu_a", dists.Normal, {"mu": 0.0, "sigma": 2.0})
    ir = Builder.rv(ir, "sigma_a", dists.HalfNormal, {"sigma": 1.0})
    ir = Builder.rv(ir, "mu_r", dists.Normal, {"mu": 0.0, "sigma": 0.5})
    ir = Builder.rv(ir, "sigma_r", dists.HalfNormal, {"sigma": 0.1})
    ir = Builder.rv(ir, "noise", dists.HalfNormal, {"sigma": 0.5})
    # non-centered per-bearing intercepts and rates
    ir = Builder.rv(ir, "a_raw", dists.Normal, {"mu": 0.0, "sigma": 1.0},
                    shape=(B,))
    ir = Builder.rv(ir, "r_raw", dists.Normal, {"mu": 0.0, "sigma": 1.0},
                    shape=(B,))
    ir = Builder.det(ir, "log_a", lambda m, s, z: m + s * z,
                     ["mu_a", "sigma_a", "a_raw"])
    ir = Builder.det(ir, "rate", lambda m, s, z: m + s * z,
                     ["mu_r", "sigma_r", "r_raw"])
    ir = Builder.det(
        ir, "mean_path",
        lambda la, r: la[:, None] + r[:, None] * t[None, :],
        ["log_a", "rate"],
    )
    ir = Builder.rv(ir, "log_y", dists.Normal,
                    {"mu": "mean_path", "sigma": "noise"}, shape=(B, T))
    ir = Builder.obs(ir, "log_y_obs", "log_y", log_y)
    return ir


def posterior_rates(trace):
    """Reconstruct the det-node quantities on the host (the trace holds
    free RVs; log_a = mu_a + sigma_a*a_raw, rate = mu_r + sigma_r*r_raw)."""
    log_a = (trace["mu_a"][..., None] +
             trace["sigma_a"][..., None] * trace["a_raw"])
    rate = (trace["mu_r"][..., None] +
            trace["sigma_r"][..., None] * trace["r_raw"])
    return log_a.reshape(-1, B), rate.reshape(-1, B)


def p_failure_before_window(log_a_all, rate_all, bearing):
    """P(RMS crosses THRESHOLD within WINDOW_H hours | data) for one
    bearing: deterministic crossing time per posterior draw
    t* = (log thr - log_a) / rate - t_now, plus observation noise on
    the crossing level is negligible vs rate uncertainty."""
    log_a = log_a_all[:, bearing]
    rate = np.maximum(rate_all[:, bearing], 1e-6)
    t_now = (T - 1) * DT
    t_cross = (np.log(THRESHOLD) - log_a) / rate - t_now
    return float(np.mean(t_cross < WINDOW_H)), float(np.median(t_cross))


def main():
    log_y, true_r = generate()
    ir = build(log_y)
    chains = 4 if SMOKE else 32
    n = 150 if SMOKE else 1000
    trace, stats = sample(ir, num_chains=chains, num_warmup=max(300, n),
                          num_samples=n, seed=0, ncp=False,
                          target_accept=0.9)

    for name, true_v in [("mu_r", TRUE["mu_r"]),
                         ("sigma_r", TRUE["sigma_r"]),
                         ("noise", TRUE["noise"])]:
        arr = trace[name]
        print(f"{name:8s} = {arr.mean():+.4f} (true {true_v:+.4f}), "
              f"rhat={float(rhat(arr)):.3f}")

    # per-bearing rate recovery (shrinkage view)
    log_a_all, rate_all = posterior_rates(trace)
    post_r = rate_all.mean(axis=0)
    err = np.abs(post_r - true_r).mean()
    print(f"mean |rate error| across fleet: {err:.4f}")

    worst = int(np.argmax(post_r))
    p_fail, med_t = p_failure_before_window(log_a_all, rate_all, worst)
    print(f"bearing {worst}: P(cross {THRESHOLD} mm/s within "
          f"{WINDOW_H:.0f}h) = {p_fail:.2f}, median crossing in "
          f"{med_t:.1f}h")
    print(f"divergences: {int(stats['divergences'].sum())}")

    if not SMOKE:
        assert abs(trace["mu_r"].mean() - TRUE["mu_r"]) < 0.01
        assert err < 0.01
        assert 0.0 <= p_fail <= 1.0


if __name__ == "__main__":
    main()

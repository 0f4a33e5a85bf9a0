"""Turbine imbalance diagnosis from vibration spectra
(reference notebooks/07_turbine_imbalance.livemd narrative).

Every rotating machine vibrates; the 1X synchronous component comes
from mass imbalance. A technician reads the spectrum by eye — until you
have 200 turbines across six plants. The Jeffcott rotor model predicts
the 1X amplitude from physics:

    A(omega) = U * omega^2 / sqrt((k - m*omega^2)^2 + (c*omega)^2)

with rotor mass m known, stiffness k and damping c approximately known
(given priors around design values), and the imbalance magnitude U
(g-mm) the unknown of interest. Run-up data — amplitudes at several
speeds — identifies everything, and the answer is not "12 g-mm" but a
posterior: P(U exceeds the balance-grade limit), exactly what the
maintenance planner needs.

TPU-first formulation: the amplitude curve over all measured speeds is
one broadcast det node feeding a vector LogNormal likelihood.
"""

import os

import numpy as np

from exmc_tpu import Builder, dists, sample
from exmc_tpu.diagnostics import rhat

SMOKE = os.environ.get("EXMC_EXAMPLES_SMOKE") == "1"

M_ROTOR = 5000.0          # kg (known)
K_DESIGN = 2.0e8          # N/m
C_DESIGN = 5.0e4          # N-s/m
TRUE = {"U": 120.0, "k_fac": 1.08, "c_fac": 0.9, "noise": 0.08}
BALANCE_LIMIT = 100.0     # g-mm, ISO balance-grade limit for this rotor

# run-up measurement speeds (rad/s): up to 3600 RPM operating speed
SPEEDS = np.linspace(80.0, 377.0, 12).astype(np.float32)


def amplitude(u, k, c, w):
    # U in g-mm -> kg-m: 1e-6; amplitude in micrometers: 1e6 — cancels
    return u * w ** 2 / np.sqrt((k - M_ROTOR * w ** 2) ** 2 + (c * w) ** 2)


def generate(seed=37):
    rng = np.random.default_rng(seed)
    a = amplitude(TRUE["U"], TRUE["k_fac"] * K_DESIGN,
                  TRUE["c_fac"] * C_DESIGN, SPEEDS)
    return (a * np.exp(rng.normal(0.0, TRUE["noise"], len(SPEEDS)))
            ).astype(np.float32)


def build(a_obs):
    import jax.numpy as jnp

    w = jnp.asarray(SPEEDS)

    ir = Builder.new_ir()
    ir = Builder.rv(ir, "U", dists.LogNormal,
                    {"mu": float(np.log(50.0)), "sigma": 1.0})
    # stiffness/damping: priors centered on design values
    ir = Builder.rv(ir, "k_fac", dists.LogNormal, {"mu": 0.0, "sigma": 0.15})
    ir = Builder.rv(ir, "c_fac", dists.LogNormal, {"mu": 0.0, "sigma": 0.3})
    ir = Builder.rv(ir, "noise", dists.HalfNormal, {"sigma": 0.2})
    ir = Builder.det(
        ir, "log_amp",
        lambda u, kf, cf: jnp.log(u) + 2.0 * jnp.log(w) - 0.5 * jnp.log(
            (kf * K_DESIGN - M_ROTOR * w ** 2) ** 2
            + (cf * C_DESIGN * w) ** 2
        ),
        ["U", "k_fac", "c_fac"],
    )
    ir = Builder.rv(ir, "log_a", dists.Normal,
                    {"mu": "log_amp", "sigma": "noise"},
                    shape=(len(SPEEDS),))
    ir = Builder.obs(ir, "log_a_obs", "log_a", np.log(a_obs))
    return ir


def main():
    a_obs = generate()
    ir = build(a_obs)
    chains = 4 if SMOKE else 16
    n = 150 if SMOKE else 1000
    trace, stats = sample(ir, num_chains=chains, num_warmup=max(300, n),
                          num_samples=n, seed=0, target_accept=0.9)

    u = trace["U"].reshape(-1)
    print(f"U     = {u.mean():6.1f} +- {u.std():5.1f} g-mm "
          f"(true {TRUE['U']}), rhat={float(rhat(trace['U'])):.3f}")
    for name in ("k_fac", "c_fac"):
        arr = trace[name]
        print(f"{name} = {arr.mean():6.3f} (true {TRUE[name]}), "
              f"rhat={float(rhat(arr)):.3f}")
    p_exceed = float(np.mean(u > BALANCE_LIMIT))
    print(f"P(U > {BALANCE_LIMIT:.0f} g-mm balance limit) = {p_exceed:.3f}")
    print(f"divergences: {int(stats['divergences'].sum())}")

    if not SMOKE:
        assert abs(u.mean() - TRUE["U"]) < 25.0
        assert p_exceed > 0.6  # the true imbalance exceeds the limit
        assert stats["divergences"].sum() / (chains * n) < 0.02


if __name__ == "__main__":
    main()

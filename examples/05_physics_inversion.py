"""PDE-constrained Bayesian inversion: infer a material boundary from
heat-sensor readings (reference notebook 08 / physics demos)."""

import os

import numpy as np
import jax.numpy as jnp

from exmc_tpu import sample
from exmc_tpu.apps import physics

SMOKE = os.environ.get("EXMC_EXAMPLES_SMOKE") == "1"


def main():
    ny = nx = 6 if SMOKE else 10
    iters = 10 if SMOKE else 30

    def forward(phi):
        kappa = physics.material_field(phi, 2.0, 0.5)
        t = physics.heat2d_solve(kappa, iterations=iters)
        return physics.read_sensors(t, "bottom_row")

    # ground truth: a void (phi < 0) in the upper-left block
    phi_true = np.ones((ny, nx), np.float32)
    phi_true[1 : ny // 2, 1 : nx // 2] = -1.0
    data = np.asarray(forward(jnp.asarray(phi_true)))
    noisy = data + np.random.default_rng(0).normal(0, 0.01, data.shape).astype(
        np.float32
    )

    ir = physics.build_inverse_model(forward, noisy, ny=ny, nx=nx,
                                     noise_sigma=0.02, lam=2.0)
    n = 100 if SMOKE else 500
    trace, stats = sample(ir, num_warmup=max(200, n), num_samples=n, seed=0)
    phi_post = trace["phi"].mean(axis=(0, 1)).reshape(ny, nx)
    inferred_void = (phi_post < 0).mean()
    true_void = (phi_true < 0).mean()
    print(f"void fraction: inferred {inferred_void:.2f} vs true {true_void:.2f}")
    print("divergences:", stats["divergences"])


if __name__ == "__main__":
    main()

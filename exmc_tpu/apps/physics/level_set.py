"""Level-set utilities for Bayesian geometric inverse problems
(reference physics/level_set.ex): smooth-Heaviside material
classification + Laplacian smoothness prior + model builder.
"""

import numpy as np
import jax.numpy as jnp

from exmc_tpu import dists
from exmc_tpu.ir import Builder


def smooth_heaviside(phi, eps=1.0):
    """H_eps(phi) = 0.5 (1 + tanh(phi/eps)) (level_set.ex:30-33)."""
    return 0.5 * (1.0 + jnp.tanh(phi / eps))


def material_field(phi, kappa_a, kappa_b, eps=1.0):
    """kappa = kappa_a H(phi) + kappa_b (1 - H(phi)) (level_set.ex:44-50)."""
    h = smooth_heaviside(phi, eps)
    return kappa_a * h + kappa_b * (1.0 - h)


def laplacian_prior_logpdf(ny, nx, lam=1.0):
    """Smoothness prior: logp(phi) = -lam/2 sum((nabla^2 phi)^2)
    (level_set.ex laplacian_prior_logpdf). Returns a Custom-dist logpdf
    closure over a flattened (ny*nx,) phi."""

    def logpdf(phi_flat, params):
        phi = phi_flat.reshape(ny, nx)
        lap = (
            -4.0 * phi
            + jnp.pad(phi, ((1, 0), (0, 0)))[:-1, :]
            + jnp.pad(phi, ((0, 1), (0, 0)))[1:, :]
            + jnp.pad(phi, ((0, 0), (1, 0)))[:, :-1]
            + jnp.pad(phi, ((0, 0), (0, 1)))[:, 1:]
        )
        interior = lap[1:-1, 1:-1]
        return -0.5 * lam * jnp.sum(interior * interior)

    return logpdf


def build_inverse_model(forward_fn, data, *, ny, nx, noise_sigma=0.05,
                        lam=1.0):
    """Bayesian geometric inverse problem (level_set.ex build_model):

        phi ~ LaplacianSmoothnessPrior(lam)
        sensors = forward_fn(phi)          # e.g. Heat2D solve + read
        data ~ Normal(sensors, noise_sigma)

    ``forward_fn(phi_2d) -> sensor vector`` must be pure jnp
    (differentiable). Returns the IR; phi is a (ny*nx,) free RV."""
    data = np.asarray(data, dtype=np.float32)

    prior = dists.Custom(
        logpdf_fn=laplacian_prior_logpdf(ny, nx, lam), support="real"
    )

    def likelihood(_x, params, data=None):
        phi = params["phi"].reshape(ny, nx)
        pred = forward_fn(phi)
        resid = (data - pred) / noise_sigma
        return jnp.sum(
            -0.5 * resid * resid - jnp.log(noise_sigma) - 0.9189385332046727
        )

    lik = dists.Custom(logpdf_fn=likelihood, support="real")

    ir = Builder.new_ir()
    ir = Builder.rv(ir, "phi", prior, {}, shape=(ny * nx,))
    # likelihood as an observed Custom RV so phi stays the only free param
    ir = Builder.rv(ir, "lik", lik, {"phi": "phi"})
    ir = Builder.obs(ir, "lik_obs", "lik", 0.0)
    ir = Builder.data(ir, data)
    return ir

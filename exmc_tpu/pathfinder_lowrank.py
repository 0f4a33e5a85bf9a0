"""Low-rank-plus-diagonal Pathfinder covariance (Zhang, Carpenter,
Gelman & Vehtari 2022, Algorithm "bfgs-sample") — upgrade over the
reference's crude diag fit (pathfinder.ex:156-171, sigma =
1/sqrt(|grad|+eps)). One simplification vs the paper: the diagonal
initial matrix is the scalar gamma = s.y/y.y times I rather than the
paper's per-coordinate alpha recursion; the 2m-rank correction absorbs
coordinate scaling (adequate for moderately conditioned posteriors —
per-coordinate alpha is a TODO).

At an L-BFGS iterate with curvature pairs S = [s_1..s_m], Y = [y_1..y_m]
(gradients of the NEGATIVE log-density), the inverse-Hessian estimate in
compact form is

    Sigma = diag(alpha) + B G B^T,   B = [diag(alpha) Y, S]  (d x 2m)

    G = [[ 0        , -R^{-1}                     ],
         [-R^{-T}   ,  R^{-T} (E + Y^T diag(a) Y) R^{-1}]]

with R = upper-tri(S^T Y), E = diag(S^T Y). Sampling and the exact
log-determinant use the thin-QR factorization of diag(alpha)^{-1/2} B:

    Q Rq = a^{-1/2} B;   L = chol(I + Rq G Rq^T)
    log|Sigma| = sum(log alpha) + 2 log|det L|
    x = mu + a^{1/2} (Q (L - I) Q^T + I) u,   u ~ N(0, I_d)

Invalid history slots (before m pairs accumulate) are masked by
substituting identity rows so R stays invertible and contributes
nothing. All shapes static; vmaps over path points."""

import jax
import jax.numpy as jnp
from jax.scipy.linalg import cho_factor, cho_solve, solve_triangular


def lowrank_factors(alpha, s_hist, y_hist, valid):
    """Build (Q, L, log_det_sigma) from a diagonal alpha (d,) and history
    buffers (m, d) with a validity mask (m,)."""
    m, d = s_hist.shape
    vmask = valid.astype(alpha.dtype)
    s = s_hist * vmask[:, None]
    y = y_hist * vmask[:, None]

    sty = s @ y.T                        # (m, m)
    # invalid slots -> identity rows/cols so R is invertible and inert
    eye_m = jnp.eye(m, dtype=alpha.dtype)
    mask2 = vmask[:, None] * vmask[None, :]
    r = jnp.triu(sty) * mask2 + jnp.diag(1.0 - vmask)
    e = jnp.diag(jnp.diag(sty) * vmask + (1.0 - vmask))

    ay = y * alpha[None, :]              # diag(a) Y^T rows: (m, d)
    b = jnp.concatenate([ay, s], axis=0)  # (2m, d) rows = B^T

    ytay = y @ ay.T                      # Y^T diag(a) Y  (m, m)
    r_inv = solve_triangular(r, eye_m, lower=False)
    # G blocks
    g11 = jnp.zeros((m, m), alpha.dtype)
    g12 = -r_inv
    g21 = -r_inv.T
    g22 = r_inv.T @ (e + ytay) @ r_inv
    g = jnp.block([[g11, g12], [g21, g22]])  # (2m, 2m)

    w = (b * jax.lax.rsqrt(alpha)[None, :]).T  # a^{-1/2} B  (d, 2m)
    q, rq = jnp.linalg.qr(w)                    # (d, k), (k, 2m); k=min(d,2m)
    k = rq.shape[0]
    inner = jnp.eye(k, dtype=alpha.dtype) + rq @ g @ rq.T
    # symmetrize for the cholesky
    inner = 0.5 * (inner + inner.T)
    lchol = jnp.linalg.cholesky(inner + 1e-8 * jnp.eye(k, dtype=alpha.dtype))
    log_det = jnp.sum(jnp.log(alpha)) + 2.0 * jnp.sum(
        jnp.log(jnp.abs(jnp.diagonal(lchol)))
    )
    return q, lchol, log_det


def sample_and_logq(key, mu, alpha, q, lchol, log_det, num_draws):
    """Draw from N(mu, Sigma) via the factorization and return the exact
    log-density of each draw under the approximation."""
    d = mu.shape[0]
    u = jax.random.normal(key, (num_draws, d), mu.dtype)
    qtu = u @ q                                   # (n, 2m)
    inner = qtu @ (lchol - jnp.eye(lchol.shape[0], dtype=mu.dtype)).T
    x = mu[None, :] + (u + inner @ q.T) * jnp.sqrt(alpha)[None, :]
    # x = mu + A u with Sigma = A A^T (A invertible), so the Mahalanobis
    # form (x-mu)^T Sigma^{-1} (x-mu) is exactly ||u||^2:
    quad = jnp.sum(u * u, axis=1)
    log2pi = jnp.log(2.0 * jnp.pi)
    logq = -0.5 * (d * log2pi + log_det + quad)
    return x, logq

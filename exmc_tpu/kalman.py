"""Exact linear-Gaussian state-space inference (Kalman filter / RTS
smoother) as a PUBLIC product path (round-5 VERDICT item 6: the
machinery previously lived inside benchmarks/gold_models as
target-building code; reference docs/STATE_SPACE_MODELS.md:20-31 names
the family — local level/GRW, AR(p), seasonal — this module covers
exactly for Gaussian likelihoods).

Everything is jit/vmap/grad-compatible ``lax.scan`` over time with a
small dense state (m = state dimension): the right TPU shape for
m ≤ ~50 — each step is VPU-sized algebra and XLA pipelines the scan;
for the non-Gaussian-likelihood members of the family use the Laplace
marginals in ``exmc_tpu.marginal`` (tridiagonal/banded Newton), which
this module cross-validates (Laplace is exact for Gaussian obs).

Model:  x_t = F x_{t-1} + w_t,  w ~ N(0, Q),   x_1 ~ N(mu0, P0)
        y_t = h' x_t + v_t,     v ~ N(0, r)    (scalar observations)

Constructors return an ``LGSSM`` NamedTuple; observation-noise r can
be a scalar or per-step (T,) vector.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from exmc_tpu.config import default_dtype

LOG_2PI = float(np.log(2.0 * np.pi))


class LGSSM(NamedTuple):
    F: jnp.ndarray      # (m, m) transition
    Q: jnp.ndarray      # (m, m) innovation covariance
    h: jnp.ndarray      # (m,) observation row
    r: jnp.ndarray      # scalar (or (T,)) observation variance
    mu0: jnp.ndarray    # (m,) initial mean
    P0: jnp.ndarray     # (m, m) initial covariance


def _dt(x, dtype):
    return jnp.asarray(x, dtype)


def stationary_cov(F, Q):
    """Solve the discrete Lyapunov equation P = F P F' + Q exactly via
    the vec trick: (I - F⊗F) vec(P) = vec(Q). m^2 x m^2 dense solve —
    fine for the small states of this family, and traceable so the
    transition parameters can be sampled RVs."""
    m = F.shape[0]
    eye = jnp.eye(m * m, dtype=F.dtype)
    kron = jnp.kron(F, F)
    vec_p = jnp.linalg.solve(eye - kron, Q.reshape(-1))
    P = vec_p.reshape(m, m)
    return 0.5 * (P + P.T)


def grw_ssm(sigma, dtype=None):
    """GaussianRandomWalk(sigma) in state-space form (m=1), matching the
    library convention x_1 ~ N(0, sigma^2) (dists/timeseries.py)."""
    dtype = dtype or default_dtype()
    s2 = _dt(sigma, dtype) ** 2
    one = jnp.ones((1, 1), dtype)
    return LGSSM(F=one, Q=s2 * one, h=jnp.ones((1,), dtype),
                 r=jnp.zeros((), dtype), mu0=jnp.zeros((1,), dtype),
                 P0=s2 * one)


def ar_ssm(phis, sigma, dtype=None):
    """Stationary AR(p) in companion form: state (s_t, ..., s_{t-p+1}),
    observation picks the first coordinate. ``phis``: (p,) coefficients
    (must be stationary — the Lyapunov solve encodes the stationary
    initial distribution exactly)."""
    dtype = dtype or default_dtype()
    phis = jnp.atleast_1d(_dt(phis, dtype))
    p = phis.shape[0]
    F = jnp.zeros((p, p), dtype).at[0, :].set(phis)
    if p > 1:
        F = F.at[jnp.arange(1, p), jnp.arange(0, p - 1)].set(1.0)
    Q = jnp.zeros((p, p), dtype).at[0, 0].set(_dt(sigma, dtype) ** 2)
    h = jnp.zeros((p,), dtype).at[0].set(1.0)
    return LGSSM(F=F, Q=Q, h=h, r=jnp.zeros((), dtype),
                 mu0=jnp.zeros((p,), dtype), P0=stationary_cov(F, Q))


def seasonal_ssm(period, sigma_seas, dtype=None):
    """Seasonal-dummy component: the m = period-1 state enforces that
    consecutive seasonal effects sum to ~N(0, sigma_seas^2):
        gamma_t = -(gamma_{t-1} + ... + gamma_{t-period+1}) + w_t."""
    dtype = dtype or default_dtype()
    m = int(period) - 1
    F = jnp.zeros((m, m), dtype).at[0, :].set(-1.0)
    if m > 1:
        F = F.at[jnp.arange(1, m), jnp.arange(0, m - 1)].set(1.0)
    Q = jnp.zeros((m, m), dtype).at[0, 0].set(_dt(sigma_seas, dtype) ** 2)
    h = jnp.zeros((m,), dtype).at[0].set(1.0)
    # the seasonal transition has unit-modulus eigenvalues: no
    # stationary distribution — use a diffuse-ish proper prior
    P0 = 1e4 * _dt(sigma_seas, dtype) ** 2 * jnp.eye(m, dtype=dtype)
    return LGSSM(F=F, Q=Q, h=h, r=jnp.zeros((), dtype),
                 mu0=jnp.zeros((m,), dtype), P0=P0)


def add_obs_noise(ssm, r):
    """Return the model with observation variance r (scalar or (T,))."""
    return ssm._replace(r=jnp.asarray(r, ssm.F.dtype))


def kalman_filter(ssm, ys):
    """Exact filtering: returns (loglik, means (T, m), covs (T, m, m))
    of the FILTERED state x_t | y_{1:t}. ``loglik`` is the exact
    marginal log p(y_{1:T}) — the quantity the Laplace marginals
    approximate (and match exactly for Gaussian likelihoods)."""
    dtype = ssm.F.dtype
    ys = jnp.asarray(ys, dtype)
    T = ys.shape[0]
    rs = jnp.broadcast_to(jnp.asarray(ssm.r, dtype), (T,))

    def step(carry, inp):
        mu, P, first = carry
        y, r = inp
        # time update (skipped at t=1: x_1 ~ N(mu0, P0) directly)
        mu_p = jnp.where(first, mu, ssm.F @ mu)
        P_p = jnp.where(first, P, ssm.F @ P @ ssm.F.T + ssm.Q)
        # measurement update
        s = ssm.h @ P_p @ ssm.h + r
        k = (P_p @ ssm.h) / s
        resid = y - ssm.h @ mu_p
        mu_f = mu_p + k * resid
        P_f = P_p - jnp.outer(k, ssm.h @ P_p)
        ll = -0.5 * (LOG_2PI + jnp.log(s) + resid * resid / s)
        return ((mu_f, P_f, jnp.zeros((), bool)),
                (ll, mu_f, P_f, mu_p, P_p))

    (_, _, _), (lls, mus, Ps, mu_pred, P_pred) = jax.lax.scan(
        step, (ssm.mu0, ssm.P0, jnp.ones((), bool)), (ys, rs)
    )
    return jnp.sum(lls), (mus, Ps, mu_pred, P_pred)


def kalman_loglik(ssm, ys):
    """Exact marginal log p(y_{1:T}) (filter without keeping states)."""
    ll, _ = kalman_filter(ssm, ys)
    return ll


def kalman_smoother(ssm, ys):
    """RTS smoothing: returns (means (T, m), covs (T, m, m)) of
    x_t | y_{1:T}."""
    _, (mus, Ps, mu_pred, P_pred) = kalman_filter(ssm, ys)

    def step(carry, inp):
        mu_next, P_next = carry
        mu_f, P_f, mu_p1, P_p1 = inp
        # gain J_t = P_f F' P_pred_{t+1}^{-1}
        J = jnp.linalg.solve(P_p1, ssm.F @ P_f).T
        mu_s = mu_f + J @ (mu_next - mu_p1)
        P_s = P_f + J @ (P_next - P_p1) @ J.T
        return (mu_s, P_s), (mu_s, P_s)

    # walk backward pairing (filtered t) with (predicted t+1)
    init = (mus[-1], Ps[-1])
    inputs = (mus[:-1][::-1], Ps[:-1][::-1],
              mu_pred[1:][::-1], P_pred[1:][::-1])
    _, (mu_rev, P_rev) = jax.lax.scan(step, init, inputs)
    mu_s = jnp.concatenate([mu_rev[::-1], mus[-1:]], axis=0)
    P_s = jnp.concatenate([P_rev[::-1], Ps[-1:]], axis=0)
    return mu_s, P_s

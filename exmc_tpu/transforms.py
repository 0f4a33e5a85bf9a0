"""Constraint transforms: unconstrained z -> constrained x, with log|det J|.

Mirrors the reference transform surface (reference transform.ex): ``log``,
``softplus``, ``logit``, ``stick_breaking`` plus the identity, with the same
f32-safety decisions (clamp the log transform at +/-20 in f32 / +/-200 in
f64 — D54; overflow-safe logit Jacobian via the softplus identity — D25).
The stick-breaking transform shrinks K constrained dims to K-1
unconstrained dims (reference transform.ex:84-100).

Unlike the reference's per-element Elixir reductions
(transform.ex:102-270), stick breaking here is fully vectorized with
``cumsum``/``cumprod`` so it maps onto the TPU VPU in one fused pass and
batches over arbitrary leading axes.
"""

from functools import lru_cache

import jax.numpy as jnp

from exmc_tpu import math as xm
from exmc_tpu.config import log_transform_clamp


@lru_cache(maxsize=None)
def _tril_indices(d):
    """Strict-lower-triangle (row, col) index arrays, row-major — the
    packing order of the cholesky_corr unconstrained vector. Cached as
    NUMPY (caching traced jnp arrays leaks tracers)."""
    import numpy as np

    return np.tril_indices(d, -1)


@lru_cache(maxsize=None)
def _zero_sum_basis(k):
    # cache the NUMPY result only: a jnp array materialized inside a
    # trace is a tracer, and caching one leaks it into later traces
    # (UnexpectedTracerError); jnp.asarray at the call site is free
    import numpy as np

    a = np.eye(k, k - 1)
    a[-1, :] = -1.0
    q, _ = np.linalg.qr(a)
    return q


class Transform:
    name = "identity"

    def forward(self, z):
        return z

    def inverse(self, x):
        return x

    def log_abs_det_jacobian(self, z):
        return jnp.zeros(())

    def unconstrained_shape(self, shape):
        return shape

    def constrained_shape(self, shape):
        return shape


class LogTransform(Transform):
    """x = exp(z), clamped (reference transform.ex:15-29, D54)."""

    name = "log"

    def forward(self, z):
        lim = log_transform_clamp()
        return jnp.exp(jnp.clip(z, -lim, lim))

    def inverse(self, x):
        return jnp.log(x)

    def log_abs_det_jacobian(self, z):
        lim = log_transform_clamp()
        return jnp.sum(jnp.clip(z, -lim, lim))


class SoftplusTransform(Transform):
    """x = softplus(z); log|J| = log sigmoid(z) = -softplus(-z)."""

    name = "softplus"

    def forward(self, z):
        return xm.softplus(z)

    def inverse(self, x):
        return xm.inv_softplus(x)

    def log_abs_det_jacobian(self, z):
        return jnp.sum(-xm.softplus(-z))


class LogitTransform(Transform):
    """x = sigmoid(z); log|J| = -softplus(z) - softplus(-z)
    (overflow-safe identity, reference transform.ex:291-296, D25)."""

    name = "logit"

    def forward(self, z):
        return jnp.reciprocal(1.0 + jnp.exp(-z))

    def inverse(self, x):
        return xm.logit(x)

    def log_abs_det_jacobian(self, z):
        return jnp.sum(-xm.softplus(z) - xm.softplus(-z))


class StickBreakingTransform(Transform):
    """z in R^{K-1} -> x on the simplex Delta^K.

    y_i = sigmoid(z_i); x_i = y_i * prod_{j<i}(1 - y_j); x_K = prod(1 - y).
    log|J| = sum_i [ log y_i + log(1-y_i) + log prod_{j<i}(1-y_j) ]
    (reference transform.ex:102-270, vectorized here via cumsum).

    Works on arbitrary batch shapes (..., K-1) -> (..., K).
    """

    name = "stick_breaking"

    def forward(self, z):
        log_y = -xm.softplus(-z)          # log sigmoid(z_i)
        log_1my = -xm.softplus(z)         # log (1 - sigmoid(z_i))
        csum = jnp.cumsum(log_1my, axis=-1)
        log_rem = jnp.concatenate(
            [jnp.zeros_like(csum[..., :1]), csum[..., :-1]], axis=-1
        )
        x_head = jnp.exp(log_y + log_rem)
        x_last = jnp.exp(csum[..., -1:])
        return jnp.concatenate([x_head, x_last], axis=-1)

    def inverse(self, x):
        # rem_i = 1 - sum_{j<i} x_j ; y_i = x_i / rem_i ; z_i = logit(y_i)
        x_head = x[..., :-1]
        csum = jnp.cumsum(x_head, axis=-1)
        rem = 1.0 - jnp.concatenate(
            [jnp.zeros_like(csum[..., :1]), csum[..., :-1]], axis=-1
        )
        return jnp.log(x_head) - jnp.log(rem - x_head)

    def log_abs_det_jacobian(self, z):
        log_y = -xm.softplus(-z)
        log_1my = -xm.softplus(z)
        csum = jnp.cumsum(log_1my, axis=-1)
        log_rem = jnp.concatenate(
            [jnp.zeros_like(csum[..., :1]), csum[..., :-1]], axis=-1
        )
        return jnp.sum(log_y + log_1my + log_rem)

    def unconstrained_shape(self, shape):
        if len(shape) == 0:
            raise ValueError("stick_breaking requires a vector-shaped RV")
        return tuple(shape[:-1]) + (shape[-1] - 1,)

    def constrained_shape(self, shape):
        return tuple(shape[:-1]) + (shape[-1] + 1,)


class OrderedTransform(Transform):
    """z in R^K -> strictly increasing x (Stan's ``ordered`` type):
    x_1 = z_1, x_k = x_{k-1} + exp(z_k); log|J| = sum_{k>=2} z_k.
    The standard fix for mixture label switching. Beyond the
    reference's transform surface."""

    name = "ordered"

    def forward(self, z):
        lim = log_transform_clamp()
        steps = jnp.exp(jnp.clip(z[..., 1:], -lim, lim))
        return jnp.concatenate(
            [z[..., :1], z[..., :1] + jnp.cumsum(steps, axis=-1)], axis=-1)

    def inverse(self, x):
        return jnp.concatenate(
            [x[..., :1], jnp.log(jnp.diff(x, axis=-1))], axis=-1)

    def log_abs_det_jacobian(self, z):
        lim = log_transform_clamp()
        return jnp.sum(jnp.clip(z[..., 1:], -lim, lim))


class ZeroSumTransform(Transform):
    """z in R^{K-1} -> x in R^K with sum(x) = 0 (PyMC's ZeroSumNormal
    support). The map is the isometric embedding onto the orthogonal
    complement of the ones vector (normalized Helmert-style basis), so
    the Jacobian is an isometry: log|det J| = 0 and an iid N(0, sigma)
    density on z induces the exchangeable zero-sum normal on x with
    Var[x_k] = sigma^2 (1 - 1/K), Cov = -sigma^2/K."""

    name = "zero_sum"

    @staticmethod
    def _basis(k, dtype):
        # columns: orthonormal basis of {x : sum x = 0} in R^k;
        # QR cached per k — a constant; eager callers
        # (to_unconstrained per draw) would otherwise re-run it each time
        return jnp.asarray(_zero_sum_basis(int(k)), dtype)

    def forward(self, z):
        b = self._basis(z.shape[-1] + 1, z.dtype)
        return z @ b.T

    def inverse(self, x):
        b = self._basis(x.shape[-1], x.dtype)
        return x @ b

    def log_abs_det_jacobian(self, z):
        return jnp.zeros(())

    def unconstrained_shape(self, shape):
        if len(shape) == 0:
            raise ValueError("zero_sum requires a vector-shaped RV")
        return tuple(shape[:-1]) + (shape[-1] - 1,)

    def constrained_shape(self, shape):
        return tuple(shape[:-1]) + (shape[-1] + 1,)


class PositiveOrderedTransform(Transform):
    """z in R^K -> strictly increasing positive x (Stan's
    ``positive_ordered``): x_k = sum_{j<=k} exp(z_j); log|J| = sum z."""

    name = "positive_ordered"

    def forward(self, z):
        lim = log_transform_clamp()
        return jnp.cumsum(jnp.exp(jnp.clip(z, -lim, lim)), axis=-1)

    def inverse(self, x):
        first = jnp.log(x[..., :1])
        rest = jnp.log(jnp.diff(x, axis=-1))
        return jnp.concatenate([first, rest], axis=-1)

    def log_abs_det_jacobian(self, z):
        lim = log_transform_clamp()
        return jnp.sum(jnp.clip(z, -lim, lim))


class CholeskyCorrTransform(Transform):
    """z in R^{d(d-1)/2} -> L, the lower-triangular Cholesky factor of a
    correlation matrix (unit rows: sum_j L[i,j]^2 = 1, L[i,i] > 0).

    Stan's canonical-partial-correlation construction: x = tanh(z)
    row-major over the strict lower triangle; L[i,j] = x_ij *
    sqrt(1 - sum_{k<j} L[i,k]^2), L[i,i] = sqrt(1 - sum_{k<i} L[i,k]^2).
    The Jacobian (row-major ordering) is triangular:

        log|J| = sum_ij [ log(1 - x_ij^2) + 0.5 * log rem_ij ]

    with log(1 - tanh^2 z) computed overflow-safe as
    2*(log 2 - z - softplus(-2z)). Beyond the reference's transform
    surface (no correlation-matrix support there); enables LKJ priors
    for hierarchical covariance models. Batches over leading axes; d is
    recovered statically from the trailing dim."""

    name = "cholesky_corr"

    @staticmethod
    def _dim(m):
        d = int(round((1.0 + (1.0 + 8.0 * m) ** 0.5) / 2.0))
        if d * (d - 1) // 2 != m:
            raise ValueError(f"invalid cholesky_corr length {m}")
        return d

    @staticmethod
    def _scatter_tril(z, d):
        """Strict-lower-triangle scatter of the packed row-major vector
        into a (d, d) matrix — one static-index scatter, so the whole
        transform is ~6 fused array ops instead of O(d^2) Python-loop
        ops (the original unrolled build traced minutes at d~100)."""
        rows, cols = _tril_indices(d)
        out = jnp.zeros(z.shape[:-1] + (d, d), z.dtype)
        return out.at[..., rows, cols].set(z)

    def _rem(self, x):
        """rem[i, j] = prod_{k<j} (1 - x[i,k]^2) with x zero outside the
        strict lower triangle — exclusive cumprod along each row; the
        diagonal entry rem[i, i] is the full row product."""
        s = 1.0 - x * x
        p = jnp.cumprod(s, axis=-1)
        return jnp.concatenate(
            [jnp.ones_like(p[..., :1]), p[..., :-1]], axis=-1)

    def forward(self, z):
        d = self._dim(z.shape[-1])
        x = self._scatter_tril(jnp.tanh(z), d)
        rem = self._rem(x)
        rows, cols = _tril_indices(d)
        strict = jnp.zeros((d, d), bool).at[rows, cols].set(True)
        L = jnp.where(strict, x * jnp.sqrt(rem), 0.0)
        diag = jnp.sqrt(rem[..., jnp.arange(d), jnp.arange(d)])
        return L.at[..., jnp.arange(d), jnp.arange(d)].set(diag)

    def inverse(self, L):
        d = L.shape[-1]
        rows, cols = _tril_indices(d)
        strict = jnp.zeros((d, d), bool).at[rows, cols].set(True)
        low = jnp.where(strict, L, 0.0)
        # rem[i, j] = 1 - sum_{k<j} L[i,k]^2 (exclusive cumsum)
        s2 = jnp.cumsum(low * low, axis=-1)
        rem = 1.0 - jnp.concatenate(
            [jnp.zeros_like(s2[..., :1]), s2[..., :-1]], axis=-1)
        x = low / jnp.sqrt(jnp.maximum(rem, 1e-30))
        z = jnp.arctanh(jnp.clip(x, -1.0 + 1e-7, 1.0 - 1e-7))
        return z[..., rows, cols]

    def log_abs_det_jacobian(self, z):
        d = self._dim(z.shape[-1])
        # log(1 - tanh^2 z), overflow-safe
        log_dtanh = 2.0 * (jnp.log(2.0) - z - xm.softplus(-2.0 * z))
        x = self._scatter_tril(jnp.tanh(z), d)
        rem = self._rem(x)
        rows, cols = _tril_indices(d)
        return jnp.sum(log_dtanh) + 0.5 * jnp.sum(
            jnp.log(jnp.maximum(rem[..., rows, cols], 1e-30)))

    def unconstrained_shape(self, shape):
        if len(shape) < 2 or shape[-1] != shape[-2]:
            raise ValueError("cholesky_corr requires a (d, d)-shaped RV")
        d = shape[-1]
        return tuple(shape[:-2]) + (d * (d - 1) // 2,)

    def constrained_shape(self, shape):
        d = self._dim(shape[-1])
        return tuple(shape[:-1]) + (d, d)


class IntervalTransform(Transform):
    """x = lower + (upper - lower) * sigmoid(z) — bounded-interval transform
    (extension beyond the reference's 4 transforms, used by the Stan
    frontend for two-sided <lower=,upper=> constraints)."""

    name = "interval"

    def __init__(self, lower, upper):
        self.lower = lower
        self.upper = upper

    def forward(self, z):
        width = self.upper - self.lower
        return self.lower + width * jnp.reciprocal(1.0 + jnp.exp(-z))

    def inverse(self, x):
        u = (x - self.lower) / (self.upper - self.lower)
        return xm.logit(u)

    def log_abs_det_jacobian(self, z):
        width = self.upper - self.lower
        return jnp.sum(jnp.log(width) - xm.softplus(z) - xm.softplus(-z))


class LowerBoundTransform(Transform):
    """x = lower + exp(z) — shifted-log transform for general one-sided
    ``<lower=c>`` constraints (Stan's convention; extension beyond the
    reference, which only supports lower=0)."""

    name = "lower_bound"

    def __init__(self, lower):
        self.lower = lower

    def forward(self, z):
        lim = log_transform_clamp()
        return self.lower + jnp.exp(jnp.clip(z, -lim, lim))

    def inverse(self, x):
        return jnp.log(x - self.lower)

    def log_abs_det_jacobian(self, z):
        lim = log_transform_clamp()
        return jnp.sum(jnp.clip(z, -lim, lim))


class UpperBoundTransform(Transform):
    """x = upper - exp(z) — for one-sided ``<upper=c>`` constraints."""

    name = "upper_bound"

    def __init__(self, upper):
        self.upper = upper

    def forward(self, z):
        lim = log_transform_clamp()
        return self.upper - jnp.exp(jnp.clip(z, -lim, lim))

    def inverse(self, x):
        return jnp.log(self.upper - x)

    def log_abs_det_jacobian(self, z):
        lim = log_transform_clamp()
        return jnp.sum(jnp.clip(z, -lim, lim))


IDENTITY = Transform()
LOG = LogTransform()
SOFTPLUS = SoftplusTransform()
LOGIT = LogitTransform()
STICK_BREAKING = StickBreakingTransform()
CHOLESKY_CORR = CholeskyCorrTransform()
ORDERED = OrderedTransform()
POSITIVE_ORDERED = PositiveOrderedTransform()
ZERO_SUM = ZeroSumTransform()

_REGISTRY = {
    None: IDENTITY,
    "identity": IDENTITY,
    "log": LOG,
    "softplus": SOFTPLUS,
    "logit": LOGIT,
    "stick_breaking": STICK_BREAKING,
    "cholesky_corr": CHOLESKY_CORR,
    "ordered": ORDERED,
    "positive_ordered": POSITIVE_ORDERED,
    "zero_sum": ZERO_SUM,
}


def get(name):
    """Resolve a transform by name (or pass a Transform instance through)."""
    if isinstance(name, Transform):
        return name
    try:
        return _REGISTRY[name]
    except KeyError:
        raise ValueError(f"unknown transform: {name!r}") from None


def unconstrained_shape(transform, shape):
    return get(transform).unconstrained_shape(tuple(shape))

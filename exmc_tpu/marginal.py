"""Laplace marginalization of GRW latent paths (INLA-within-MCMC).

The long-T stochastic-volatility wall (DESIGN D-T23, LONGT.json): at
T=5000 the NCP'd path couples sigma to every z coordinate through a
position-dependent exp(s) curvature spanning ~e^6 — no constant metric
mixes it, and NUTS crawls at 0.1 min-ESS/s. Rather than sampling the
5000-dimensional path at all, this module MARGINALIZES it with a
Laplace approximation (Rue/Martino/Chopin 2009 INLA; the candidate
scoped in VERDICT r2 #3):

    p(y | theta) ~= |Q|^{1/2} |Q + W|^{-1/2} exp(g(s_hat)),
    g(s) = -1/2 s'Qs + sum_t loglik_t(s_t),
    s_hat = argmax g  (Newton/IRLS),  W = diag(-loglik''(s_hat))

Q is the GRW prior precision — TRIDIAGONAL — so every linear-algebra
piece is an O(T) ``lax.scan``: Thomas factorization/solve for the
Newton steps, the LDL' diagonal for log-determinants, and a reversed
Takahashi recurrence for the marginal latent variances diag((Q+W)^-1).
The scans are sequential but trivially cheap per step, grad-traceable
(fixed Newton iteration count), and vmap-compatible — the INLA grid
evaluates EVERY hyperparameter point in one batched call, and the
marginal log-density drops into the existing NUTS kernel as a Custom
likelihood (2-3 free hyperparameters instead of T+2).

This is an APPROXIMATION (exact only for Gaussian likelihoods, where
Laplace is exact — tested against the Kalman battery machinery); for
the heavy-tailed StudentT SV likelihood the curvature is clamped at a
floor (W >= w_floor), the SoftAbs-lite move. Accuracy is validated
against full-path NUTS at T=1000 in tests/test_marginal.py.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from exmc_tpu.config import default_dtype

LOG_2PI = float(np.log(2.0 * np.pi))


# All three tridiagonal kernels are first-order recurrences, which
# compose ASSOCIATIVELY: the factorization is a Möbius (continued-
# fraction) composition and the solves/Takahashi are affine maps. On
# TPU a sequential lax.scan of length T=5000 is latency-bound (the
# multi-minute vmapped NUTS kernels it produced crashed the axon
# worker — kernel fault, measured twice). A FLAT associative_scan
# fixes the latency but unrolls O(log T) slice/concat levels per scan
# into the HLO — at T=5000 x (6 scans x 12 Newton) the remote service
# never finished compiling it (>85 min, killed). The shape that
# satisfies both constraints is the BLOCKED parallel prefix: one
# lax.scan over T/B blocks (compact HLO — a single while op) whose
# body runs an associative_scan over B elements (parallel on the VPU).
# Sequential depth drops T -> T/B; program size stays O(log B).

_BLOCK = 128


def _resolve_block(block):
    """None -> the module-level default, resolved at CALL time so
    benchmarks can tune ``marginal._BLOCK`` without re-importing (the
    def-time default would freeze the value into every signature)."""
    return _BLOCK if block is None else block


def _mm2(y, x):
    """Batched 2x2 matrix product y @ x written as explicit elementwise
    multiply-adds. NOT jnp.matmul: on TPU, f32 matmul defaults to
    bfloat16 MXU passes, and an 8-bit mantissa destroys the
    continued-fraction recurrence — measured 2026-08-19 on chip: the
    T=5000 INLA grid came back degenerate (sigma_sd 4e-5, 705/1600
    points non-finite) while the identical f32 program on CPU matched
    truth to 0.8 sd. Tiny 2x2 products belong on the VPU anyway."""
    a = y[..., 0, 0] * x[..., 0, 0] + y[..., 0, 1] * x[..., 1, 0]
    b = y[..., 0, 0] * x[..., 0, 1] + y[..., 0, 1] * x[..., 1, 1]
    c = y[..., 1, 0] * x[..., 0, 0] + y[..., 1, 1] * x[..., 1, 0]
    d = y[..., 1, 0] * x[..., 0, 1] + y[..., 1, 1] * x[..., 1, 1]
    return jnp.stack([jnp.stack([a, b], -1), jnp.stack([c, d], -1)], -2)


def _mv2(m, v):
    """Batched 2x2 @ 2-vector, elementwise for the same precision
    reason as _mm2."""
    return jnp.stack([m[..., 0, 0] * v[..., 0] + m[..., 0, 1] * v[..., 1],
                      m[..., 1, 0] * v[..., 0] + m[..., 1, 1] * v[..., 1]],
                     -1)


def _mobius_combine(x, y):
    """Compose 2x2 Möbius matrices, y AFTER x (prefix products
    M_i ... M_0), renormalized per combine — the continued-fraction
    value is a RATIO of homogeneous coordinates, so any per-step
    rescaling cancels exactly (projective invariance); without it the
    products overflow f32 within ~10 steps."""
    c = _mm2(y, x)
    scale = jnp.max(jnp.abs(c), axis=(-2, -1), keepdims=True)
    return c / jnp.maximum(scale, 1e-30)


def _affine_combine(x, y):
    """Compose affine maps, y AFTER x: (a2,c2)∘(a1,c1) =
    (a2*a1, a2*c1 + c2)."""
    a1, c1 = x
    a2, c2 = y
    return a2 * a1, a2 * c1 + c2


def _affine_scan(coef, offs, y0, block=None):
    """y_i = coef_i * y_{i-1} + offs_i for i >= 1 with y_0 = y0.
    Returns the full (T,) sequence incl. y_0. Blocked parallel prefix
    (see module note); the identity element (1, 0) pads the tail."""
    block = _resolve_block(block)
    a = jnp.concatenate([jnp.zeros((1,), coef.dtype), coef])
    c = jnp.concatenate([jnp.reshape(y0, (1,)), offs])
    t = a.shape[0]
    if t <= 2 * block:
        _, ys = jax.lax.associative_scan(_affine_combine, (a, c))
        return ys
    k = -(-t // block)
    pad = k * block - t
    a = jnp.concatenate([a, jnp.ones((pad,), a.dtype)]).reshape(k, block)
    c = jnp.concatenate([c, jnp.zeros((pad,), c.dtype)]).reshape(k, block)

    def body(y_in, blk):
        pa, pc = jax.lax.associative_scan(_affine_combine, blk)
        ys = pa * y_in + pc
        return ys[-1], ys

    _, ys = jax.lax.scan(body, jnp.zeros((), a.dtype), (a, c))
    return ys.reshape(-1)[:t]


def _thomas_factor(a, b, block=None):
    """LDL' of the SPD tridiagonal with diagonal ``a`` (T,) and constant
    sub/super-diagonal ``b`` (scalar): returns (delta, ell) with
    delta = D diagonal, ell = L sub-diagonal multipliers (T-1,).

    delta_i = a_i - b^2/delta_{i-1} is the Möbius map of the matrix
    [[a_i, -b^2], [1, 0]] acting on the homogeneous [delta_{i-1}, 1];
    blocked parallel prefix over the matrix products, carry vector
    renormalized per block (projective invariance)."""
    block = _resolve_block(block)
    t = a.shape[0]
    if t == 1:
        return a, a[:0]
    n = t - 1
    m = jnp.zeros((n, 2, 2), a.dtype)
    m = m.at[:, 0, 0].set(a[1:])
    m = m.at[:, 0, 1].set(-b * b)
    m = m.at[:, 1, 0].set(1.0)
    v0 = jnp.stack([a[0], jnp.ones((), a.dtype)])
    v0 = v0 / jnp.maximum(jnp.max(jnp.abs(v0)), 1e-30)
    if n <= 2 * block:
        p = jax.lax.associative_scan(_mobius_combine, m)
        vs = _mv2(p, v0)
    else:
        k = -(-n // block)
        pad = k * block - n
        eye = jnp.broadcast_to(jnp.eye(2, dtype=a.dtype), (pad, 2, 2))
        m = jnp.concatenate([m, eye]).reshape(k, block, 2, 2)

        def body(v_in, mb):
            p = jax.lax.associative_scan(_mobius_combine, mb)
            vb = _mv2(p, v_in)
            v_out = vb[-1]
            v_out = v_out / jnp.maximum(jnp.max(jnp.abs(v_out)), 1e-30)
            return v_out, vb

        _, vs = jax.lax.scan(body, v0, m)
        vs = vs.reshape(-1, 2)[:n]
    delta = jnp.concatenate([a[:1], vs[:, 0] / vs[:, 1]])
    ell = b / delta[:-1]
    return delta, ell


def _thomas_solve(delta, ell, rhs):
    """Solve (L D L') x = rhs given the factors from _thomas_factor."""
    y = _affine_scan(-ell, rhs[1:], rhs[0])      # y_i = rhs_i - l_i y_{i-1}
    z = y / delta
    # x_i = z_i - l_i x_{i+1}: the same affine recurrence on the
    # reversed sequence starting from x_{T-1} = z_{T-1}
    x_rev = _affine_scan(-ell[::-1], z[:-1][::-1], z[-1])
    return x_rev[::-1]


def _takahashi_diag(delta, ell):
    """diag((LDL')^-1) for the tridiagonal factorization:
    Sigma_ii = 1/delta_i + ell_i^2 Sigma_{i+1,i+1}, run reversed."""
    inv_d = 1.0 / delta
    s_rev = _affine_scan(ell[::-1] * ell[::-1], inv_d[:-1][::-1],
                         inv_d[-1])
    return s_rev[::-1]


def grw_precision_diag(T, sigma, dtype=None):
    """Diagonal of Q = D'D / sigma^2 for the library's GRW convention
    (x0 ~ N(0, sigma), increments N(0, sigma) — dists/timeseries.py):
    diag = [2, 2, ..., 2, 1] / sigma^2, off-diagonal -1/sigma^2, and
    |D'D| = 1 so logdet Q = -2 T log sigma."""
    dtype = dtype or default_dtype()
    d = jnp.full((T,), 2.0, dtype).at[-1].set(1.0)
    return d / (sigma * sigma)


def _make_tridiag_marginal(loglik, T, prior, newton_iters=25,
                           w_floor=1e-3, implicit_diff=True):
    """Laplace-marginal engine for ANY Markov-1 Gaussian latent prior
    with tridiagonal precision (round-5 generalization of the GRW-only
    engine; reference STATE_SPACE_MODELS.md:20-31 is the family map).

    ``prior`` supplies three functions of the prior's hyperparameter
    pytree ``pp``:
      tri(pp, dtype) -> (q_diag (T,), q_off scalar)   precision pieces
      neg_half_quad(s, pp) -> scalar                  -1/2 s'Qs (stable)
      half_logdet(pp) -> scalar                       +1/2 logdet Q

    Returns marginal(pp, theta) -> (logZ, s_hat, var_hat); see
    make_grw_marginal for the contract."""

    def ell_sum(s, theta):
        return jnp.sum(loglik(s, theta))

    g1 = jax.grad(ell_sum)                       # elementwise loglik'
    g2 = jax.grad(lambda s, th: jnp.sum(g1(s, th)))  # elementwise loglik''

    def _q_parts(pp, dtype):
        return prior["tri"](pp, dtype)

    def _grad_g(s, pp, theta):
        """∇_s of the objective g(s) = -1/2 s'Qs + sum loglik: the
        root function the Newton solve drives to zero."""
        dtype = s.dtype
        q_diag, b = _q_parts(pp, dtype)
        z = jnp.zeros((1,), dtype)
        qs = (q_diag * s + b * jnp.concatenate([s[1:], z])
              + b * jnp.concatenate([z, s[:-1]]))
        return g1(s, theta) - qs

    def _newton_scan(pp, theta):
        dtype = default_dtype()
        pp = jax.tree.map(lambda x: jnp.asarray(x, dtype), pp)
        q_diag, b = _q_parts(pp, dtype)
        S_CLAMP = 40.0  # |log-vol| beyond this is numerically absurd

        def g_of(s):
            return prior["neg_half_quad"](s, pp) + ell_sum(s, theta)

        def newton(s, _):
            l1 = g1(s, theta)
            l2 = g2(s, theta)
            w = jnp.maximum(-l2, w_floor)  # SoftAbs-lite curvature floor
            delta, ell = _thomas_factor(q_diag + w, b)
            rhs = w * s + l1
            s_full = _thomas_solve(delta, ell, rhs)
            # MONOTONE damping: a heavy-tailed likelihood at extreme
            # hyperparameters makes the clamped-curvature Newton step
            # overshoot (measured: |s| -> 160 -> NaN logZ -> chains
            # frozen on an artificial plateau). Backtrack the step until
            # g does not decrease, and clamp the iterate.
            g_cur = g_of(s)

            def try_step(alpha):
                cand = jnp.clip(s + alpha * (s_full - s), -S_CLAMP, S_CLAMP)
                g_new = g_of(cand)
                ok = jnp.isfinite(g_new) & (g_new >= g_cur - 1e-3)
                return cand, ok

            c1, ok1 = try_step(1.0)
            c2, ok2 = try_step(0.25)
            c3, ok3 = try_step(0.0625)
            s_new = jnp.where(ok1, c1, jnp.where(ok2, c2,
                                                 jnp.where(ok3, c3, s)))
            return s_new, None

        s0 = jnp.zeros((T,), dtype)
        s_hat, _ = jax.lax.scan(newton, s0, None, length=newton_iters)
        return s_hat

    # Implicit differentiation at the mode (D-T37). Reverse-mode
    # through the Newton scan transposes all `newton_iters` damped
    # iterations — 12 extra unrolled tridiagonal-solve chains in the
    # HLO and the dominant share of the 0.165 s/leapfrog latency at
    # T=5000. At a converged mode the implicit-function theorem gives
    # the exact derivative in ONE extra solve: F(s*, p) = ∇g = 0  =>
    # ds*/dp = (Q + W)^{-1} ∂F/∂p with W = -loglik'' (true curvature;
    # the SoftAbs floor only biases this where the floor binds, the
    # same region where the unrolled derivative is inexact too). The
    # backward pass is v -> (∂F/∂p)' (Q+W)^{-1} v: one Thomas solve +
    # one vjp of F at fixed s*. Gradient inexactness cannot bias the
    # posterior — leapfrog with any position-dependent force field is
    # reversible/volume-preserving and the tree weights use the exact
    # logp — it only perturbs proposal efficiency.
    @jax.custom_vjp
    def s_mode(pp, theta):
        return _newton_scan(pp, theta)

    def s_mode_fwd(pp, theta):
        s_hat = _newton_scan(pp, theta)
        return s_hat, (s_hat, pp, theta)

    def s_mode_bwd(res, v):
        s_hat, pp, theta = res
        dtype = s_hat.dtype
        ppd = jax.tree.map(lambda x: jnp.asarray(x, dtype), pp)
        q_diag, b = _q_parts(ppd, dtype)
        w = jnp.maximum(-g2(s_hat, theta), w_floor)
        delta, ell = _thomas_factor(q_diag + w, b)
        u = _thomas_solve(delta, ell, v)
        _, pull = jax.vjp(
            lambda p, th: _grad_g(s_hat, p, th), pp, theta)
        return pull(u)

    s_mode.defvjp(s_mode_fwd, s_mode_bwd)

    def marginal(pp, theta):
        dtype = default_dtype()
        pp = jax.tree.map(lambda x: jnp.asarray(x, dtype), pp)
        q_diag, b = _q_parts(pp, dtype)

        s_hat = (s_mode(pp, theta) if implicit_diff
                 else _newton_scan(pp, theta))

        l2 = g2(s_hat, theta)
        w = jnp.maximum(-l2, w_floor)
        delta, ell = _thomas_factor(q_diag + w, b)
        g_hat = prior["neg_half_quad"](s_hat, pp) + ell_sum(s_hat, theta)
        # logZ = g_hat + 1/2 logdet Q - 1/2 logdet(Q+W); the
        # (2 pi)^{+-T/2} prior/Laplace constants cancel
        logZ = (g_hat + prior["half_logdet"](pp)
                - 0.5 * jnp.sum(jnp.log(delta)))
        var_hat = _takahashi_diag(delta, ell)
        return logZ, s_hat, var_hat

    return marginal


def make_grw_marginal(loglik, T, newton_iters=25, w_floor=1e-3,
                      implicit_diff=True):
    """Build the Laplace-marginal log-density for

        s ~ GaussianRandomWalk(sigma) over T steps,
        y_t ~ likelihood with elementwise log-density loglik(s, theta)_t.

    ``loglik(s, theta) -> (T,)`` must be elementwise in ``s`` (each
    component depends only on s_t; data closed over). Returns

        marginal(sigma, theta) -> (logZ, s_hat, var_hat)

    jit/vmap/grad-compatible: Newton runs a FIXED ``newton_iters`` scans
    and every tridiagonal op is a blocked O(T/B) parallel prefix. With
    ``implicit_diff=True`` (default, D-T37) the mode's gradient comes
    from the implicit-function theorem (one extra tridiagonal solve in
    the backward pass) instead of transposing all ``newton_iters``
    damped iterations; ``implicit_diff=False`` keeps the unrolled
    reverse-mode path for A/B checks."""

    prior = {
        "tri": lambda sigma, dtype: (
            grw_precision_diag(T, sigma, dtype),
            -1.0 / (sigma * sigma),
        ),
        # -(1/2) s'Qs = -(1/2) ||D s||^2 / sigma^2
        "neg_half_quad": lambda s, sigma: -0.5 * (
            jnp.sum(jnp.concatenate([s[:1], jnp.diff(s)]) ** 2)
            / (sigma * sigma)
        ),
        # logdet Q = -2 T log sigma (|D'D| = 1)
        "half_logdet": lambda sigma: -T * jnp.log(sigma),
    }
    return _make_tridiag_marginal(loglik, T, prior, newton_iters,
                                  w_floor, implicit_diff)


def make_ar1_marginal(loglik, T, newton_iters=25, w_floor=1e-3,
                      implicit_diff=True):
    """Laplace marginal for a STATIONARY AR(1) latent path (round-5
    VERDICT item 6: the first latent family beyond the random walk —
    the textbook SV latent, reference STATE_SPACE_MODELS.md:20-31):

        s_1 ~ N(0, sigma^2 / (1 - phi^2)),
        s_t = phi s_{t-1} + N(0, sigma^2),   |phi| < 1
        y_t ~ likelihood with elementwise log-density loglik(s, theta)_t.

    Returns marginal(sigma, phi, theta) -> (logZ, s_hat, var_hat),
    jit/vmap/grad-compatible in BOTH hyperparameters (phi can be a
    sampled RV). The AR(1) precision is tridiagonal —
    diag [1, 1+phi^2, ..., 1+phi^2, 1]/sigma^2, off-diag -phi/sigma^2,
    logdet Q = log(1-phi^2) - 2T log sigma — so the whole blocked
    parallel-prefix machinery is reused unchanged. Validated against
    the exact Kalman likelihood for Gaussian observations in
    tests/test_marginal.py (Laplace is exact there)."""

    def tri(pp, dtype):
        sigma, phi = pp
        inv_s2 = 1.0 / (sigma * sigma)
        d = jnp.full((T,), 1.0 + phi * phi, dtype)
        d = d.at[0].set(1.0).at[-1].set(1.0)
        return d * inv_s2, -phi * inv_s2

    def neg_half_quad(s, pp):
        sigma, phi = pp
        inn = s[1:] - phi * s[:-1]
        return -0.5 * (
            s[0] * s[0] * (1.0 - phi * phi) + jnp.sum(inn * inn)
        ) / (sigma * sigma)

    def half_logdet(pp):
        sigma, phi = pp
        return 0.5 * jnp.log1p(-phi * phi) - T * jnp.log(sigma)

    prior = {"tri": tri, "neg_half_quad": neg_half_quad,
             "half_logdet": half_logdet}
    base = _make_tridiag_marginal(loglik, T, prior, newton_iters,
                                  w_floor, implicit_diff)

    def marginal(sigma, phi, theta):
        return base((sigma, phi), theta)

    return marginal


# ---------------------------------------------------------------------------
# Banded extension: AR(p) latents (round-5 VERDICT item 6)
#
# An AR(p) prior's precision is BANDED with bandwidth p (Markov-p). The
# banded LDL'/solve/Takahashi kernels below are plain length-T
# lax.scans with a (p, p) carry — p is static and tiny (2-3), so each
# step is a handful of VPU ops. Unlike the tridiagonal kernels they are
# not (yet) blocked parallel prefixes: the p=1 Möbius/affine algebra
# generalizes to (p+1)-dim matrix composition, but at the validated
# scales (T <= ~2000 non-Gaussian Laplace; any T for the exact-Kalman
# Gaussian path in exmc_tpu.kalman) the sequential scan compiles
# compactly and runs fine. Cross-validated against exact Kalman in
# tests/test_kalman.py.
# ---------------------------------------------------------------------------


def _banded_ldl(q_bands, p):
    """LDL' of an SPD banded matrix. ``q_bands``: (p+1, T) with
    q_bands[j, i] = Q[i, i-j] (zero-padded where i < j). Returns
    (d (T,), l (p, T)) with l[j-1, i] = L[i, i-j]."""
    T = q_bands.shape[1]
    dtype = q_bands.dtype

    def step(carry, cols):
        d_prev, l_prev = carry    # d_prev[m-1] = d[i-m]; l_prev[a-1, m-1] = L[i-a, i-a-m]
        li = [jnp.zeros((), dtype)] * p
        for j in range(p, 0, -1):
            acc = cols[j]
            for m in range(j + 1, p + 1):
                # L[i-j, i-m] = l_prev[j-1, m-j-1]
                acc = acc - li[m - 1] * d_prev[m - 1] * l_prev[j - 1, m - j - 1]
            li[j - 1] = acc / d_prev[j - 1]
        di = cols[0]
        for m in range(1, p + 1):
            di = di - li[m - 1] * li[m - 1] * d_prev[m - 1]
        li_v = jnp.stack(li)
        # shift the carries: new row i becomes a=1
        d_new = jnp.concatenate([di[None], d_prev[:-1]])
        l_new = jnp.concatenate([li_v[None, :], l_prev[:-1]])
        return (d_new, l_new), (di, li_v)

    # virtual rows i < 0: d = 1, L = 0 (they multiply only the zero
    # padding in q_bands, so they never contribute)
    init = (jnp.ones((p,), dtype), jnp.zeros((p, p), dtype))
    _, (d, l) = jax.lax.scan(step, init, q_bands.T)
    return d, l.T


def _banded_solve(d, l, rhs):
    """Solve (L D L') x = rhs with the factors from _banded_ldl."""
    p = l.shape[0]
    dtype = rhs.dtype

    def fwd(carry, inp):
        r, lc = inp
        y = r
        for m in range(1, p + 1):
            y = y - lc[m - 1] * carry[m - 1]
        new = jnp.concatenate([y[None], carry[:-1]])
        return new, y

    _, y = jax.lax.scan(fwd, jnp.zeros((p,), dtype), (rhs, l.T))
    z = y / d

    def bwd(carry, inp):
        zi, lrows = inp           # lrows[m-1] = L[i+m, i]
        x = zi
        for m in range(1, p + 1):
            x = x - lrows[m - 1] * carry[m - 1]
        new = jnp.concatenate([x[None], carry[:-1]])
        return new, x

    # L[i+m, i] = l[m-1, i+m]: build per-i rows by shifting l
    T = rhs.shape[0]
    lrows = jnp.stack([
        jnp.concatenate([l[m - 1, m:], jnp.zeros((m,), dtype)])
        for m in range(1, p + 1)
    ])                            # (p, T): lrows[m-1, i] = L[i+m, i]
    _, x_rev = jax.lax.scan(bwd, jnp.zeros((p,), dtype),
                            (z[::-1], lrows.T[::-1]))
    return x_rev[::-1]


def _banded_takahashi_diag(d, l):
    """diag((LDL')^-1) for a banded factorization via the Takahashi
    recurrence run in reverse, carrying the trailing (p, p) block of
    the inverse's band."""
    p = l.shape[0]
    T = d.shape[0]
    dtype = d.dtype
    lrows = jnp.stack([
        jnp.concatenate([l[m - 1, m:], jnp.zeros((m,), dtype)])
        for m in range(1, p + 1)
    ])                            # lrows[m-1, i] = L[i+m, i]

    def step(carry, inp):
        W = carry                 # W[a, c] = B[i+1+a, i+1+c], a,c in 0..p-1
        inv_di, lr = inp          # lr[m-1] = L[i+m, i]
        # B[i, i+b] for b = p..1 (uses only W), then b = 0
        b_off = [jnp.zeros((), dtype)] * (p + 1)
        for b in range(p, 0, -1):
            acc = jnp.zeros((), dtype)
            for m in range(1, p + 1):
                # B[i+m, i+b] = W[m-1, b-1]
                acc = acc - lr[m - 1] * W[m - 1, b - 1]
            b_off[b] = acc
        acc = inv_di
        for m in range(1, p + 1):
            acc = acc - lr[m - 1] * b_off[m]
        b_off[0] = acc
        # new trailing block W'[a, c] = B[i+a, i+c], a,c in 0..p-1
        rows = []
        for a in range(p):
            cols = []
            for c in range(p):
                if a == 0:
                    cols.append(b_off[c])
                elif c == 0:
                    cols.append(b_off[a])
                else:
                    cols.append(W[a - 1, c - 1])
            rows.append(jnp.stack(cols))
        W_new = jnp.stack(rows)
        return W_new, b_off[0]

    _, diag_rev = jax.lax.scan(
        step, jnp.zeros((p, p), dtype),
        ((1.0 / d)[::-1], lrows.T[::-1])
    )
    return diag_rev[::-1]


def _arp_whitener_bands(phis, sigma, T, dtype):
    """Band representation (T, p+1) of the AR(p) whitening operator A
    (Q = A'A): c[t, k] is A's row-t coefficient for column t-p+k.
    Rows t >= p: [-phi_p, ..., -phi_1, 1]/sigma. Rows t < p: the
    stationary-block whitener C^-1 (C = chol of the stationary p x p
    covariance), giving the EXACT stationary initial distribution.
    Also returns log|det A| for the logdet."""
    from exmc_tpu.kalman import ar_ssm

    p = phis.shape[0]
    ssm = ar_ssm(phis, sigma, dtype=dtype)
    # companion-state covariance = stationary Sigma_p (Toeplitz in the
    # lag, so the companion's reversed ordering is immaterial)
    C = jnp.linalg.cholesky(ssm.P0)
    Cinv = jax.scipy.linalg.solve_triangular(
        C, jnp.eye(p, dtype=dtype), lower=True)
    c = jnp.zeros((T, p + 1), dtype)
    row = jnp.concatenate([-phis[::-1], jnp.ones((1,), dtype)]) / sigma
    c = c.at[p:, :].set(row[None, :])
    for t in range(p):          # static tiny loop
        c = c.at[t, p - t: p + 1].set(Cinv[t, : t + 1])
    log_det_a = (jnp.sum(jnp.log(jnp.abs(jnp.diag(Cinv))))
                 - (T - p) * jnp.log(sigma))
    return c, log_det_a


def _bands_from_whitener(c, p):
    """Q = A'A bands from A's band rep: q_bands[j, i] = Q[i, i-j]."""
    T = c.shape[0]
    dtype = c.dtype
    c_pad = jnp.concatenate([c, jnp.zeros((p, p + 1), dtype)])
    idx = jnp.arange(T)
    bands = []
    for j in range(p + 1):
        acc = jnp.zeros((T,), dtype)
        for u in range(0, p - j + 1):
            acc = acc + (c_pad[idx + u, p - u] * c_pad[idx + u, p - u - j])
        bands.append(acc)
    return jnp.stack(bands)


def make_arp_marginal(loglik, T, p, newton_iters=25, w_floor=1e-3,
                      implicit_diff=True):
    """Laplace marginal for a STATIONARY AR(p) latent path (banded
    precision, bandwidth p):

        (s_1..s_p) ~ exact stationary distribution,
        s_t = phi_1 s_{t-1} + ... + phi_p s_{t-p} + N(0, sigma^2)

    Returns marginal(sigma, phis, theta) -> (logZ, s_hat, var_hat);
    jit/vmap/grad-compatible in sigma and phis ((p,) vector — must be
    stationary). For p == 1 prefer make_ar1_marginal (blocked
    parallel-prefix kernels); these banded kernels are sequential
    scans — see the module note above. Validated against exact Kalman
    (Gaussian obs) in tests/test_kalman.py."""

    def ell_sum(s, theta):
        return jnp.sum(loglik(s, theta))

    g1 = jax.grad(ell_sum)
    g2 = jax.grad(lambda s, th: jnp.sum(g1(s, th)))

    def _bands(sigma, phis, dtype):
        c, log_det_a = _arp_whitener_bands(phis, sigma, T, dtype)
        return _bands_from_whitener(c, p), c, log_det_a

    def _apply_a(c, s):
        """A s from the band rep (for the stable quad ||A s||^2)."""
        s_pad = jnp.concatenate([jnp.zeros((p,), s.dtype), s])
        idx = jnp.arange(T)
        out = jnp.zeros((T,), s.dtype)
        for k in range(p + 1):
            out = out + c[:, k] * s_pad[idx + k]
        return out

    def _grad_g(s, pp, theta):
        sigma, phis = pp
        dtype = s.dtype
        _, c, _ = _bands(sigma, phis, dtype)
        a_s = _apply_a(c, s)
        # Q s = A'(A s): column i of A has entries c[i+u, p-u], u=0..p
        as_pad = jnp.concatenate([a_s, jnp.zeros((p,), dtype)])
        idx = jnp.arange(T)
        qs = jnp.zeros((T,), dtype)
        c_pad = jnp.concatenate([c, jnp.zeros((p, p + 1), dtype)])
        for u in range(p + 1):
            qs = qs + c_pad[idx + u, p - u] * as_pad[idx + u]
        return g1(s, theta) - qs

    def _newton_scan(pp, theta):
        dtype = default_dtype()
        sigma, phis = (jnp.asarray(pp[0], dtype),
                       jnp.asarray(pp[1], dtype))
        q_bands, c, _ = _bands(sigma, phis, dtype)
        S_CLAMP = 40.0

        def g_of(s):
            a_s = _apply_a(c, s)
            return -0.5 * jnp.sum(a_s * a_s) + ell_sum(s, theta)

        def newton(s, _):
            l1 = g1(s, theta)
            l2 = g2(s, theta)
            w = jnp.maximum(-l2, w_floor)
            bw = q_bands.at[0].add(w)
            d, l = _banded_ldl(bw, p)
            rhs = w * s + l1
            s_full = _banded_solve(d, l, rhs)
            g_cur = g_of(s)

            def try_step(alpha):
                cand = jnp.clip(s + alpha * (s_full - s), -S_CLAMP,
                                S_CLAMP)
                g_new = g_of(cand)
                ok = jnp.isfinite(g_new) & (g_new >= g_cur - 1e-3)
                return cand, ok

            c1, ok1 = try_step(1.0)
            c2, ok2 = try_step(0.25)
            c3, ok3 = try_step(0.0625)
            s_new = jnp.where(ok1, c1, jnp.where(ok2, c2,
                                                 jnp.where(ok3, c3, s)))
            return s_new, None

        s0 = jnp.zeros((T,), dtype)
        s_hat, _ = jax.lax.scan(newton, s0, None, length=newton_iters)
        return s_hat

    @jax.custom_vjp
    def s_mode(pp, theta):
        return _newton_scan(pp, theta)

    def s_mode_fwd(pp, theta):
        s_hat = _newton_scan(pp, theta)
        return s_hat, (s_hat, pp, theta)

    def s_mode_bwd(res, v):
        s_hat, pp, theta = res
        dtype = s_hat.dtype
        sigma, phis = (jnp.asarray(pp[0], dtype),
                       jnp.asarray(pp[1], dtype))
        q_bands, _, _ = _bands(sigma, phis, dtype)
        w = jnp.maximum(-g2(s_hat, theta), w_floor)
        d, l = _banded_ldl(q_bands.at[0].add(w), p)
        u = _banded_solve(d, l, v)
        _, pull = jax.vjp(
            lambda P, th: _grad_g(s_hat, P, th), pp, theta)
        return pull(u)

    s_mode.defvjp(s_mode_fwd, s_mode_bwd)

    def marginal(sigma, phis, theta):
        dtype = default_dtype()
        pp = (jnp.asarray(sigma, dtype), jnp.asarray(phis, dtype))
        q_bands, c, log_det_a = _bands(pp[0], pp[1], dtype)

        s_hat = (s_mode(pp, theta) if implicit_diff
                 else _newton_scan(pp, theta))

        w = jnp.maximum(-g2(s_hat, theta), w_floor)
        d, l = _banded_ldl(q_bands.at[0].add(w), p)
        a_s = _apply_a(c, s_hat)
        g_hat = -0.5 * jnp.sum(a_s * a_s) + ell_sum(s_hat, theta)
        logZ = g_hat + log_det_a - 0.5 * jnp.sum(jnp.log(d))
        var_hat = _banded_takahashi_diag(d, l)
        return logZ, s_hat, var_hat

    return marginal


# ---------------------------------------------------------------------------
# Stochastic volatility front door
# ---------------------------------------------------------------------------

def _sv_loglik(r):
    """Elementwise StudentT(nu, 0, exp(s)) log-density of returns r,
    matching benchmarks/suite.sv_model's likelihood."""
    from jax.scipy.special import gammaln

    rj = jnp.asarray(r)

    def loglik(s, theta):
        nu = theta["nu"]
        scale = jnp.exp(s)
        z = rj / scale
        return (gammaln(0.5 * (nu + 1.0)) - gammaln(0.5 * nu)
                - 0.5 * jnp.log(nu * jnp.pi) - s
                - 0.5 * (nu + 1.0) * jnp.log1p(z * z / nu))

    return loglik


def sv_marginal_model(r, newton_iters=25, implicit_diff=True):
    """The suite's SV model with the latent path MARGINALIZED: free RVs
    are just (sigma, nu) — same priors as benchmarks/suite.sv_model
    (sigma ~ Exponential(50), nu ~ Exponential(0.1)) — and the
    likelihood is the Laplace marginal, a Custom term the standard NUTS
    kernel differentiates straight through (2-d sampling problem at ANY
    T). Returns the IR; sample with ``sample(ir, ncp=False)``.

    ``newton_iters`` trades mode-finding accuracy for traced-program
    size: the NUTS kernel instantiates the marginal (fwd+bwd) many
    times, and each instantiation carries ~6 scans per Newton
    iteration — at T=5000 on the CPU backend, 25 iterations produced a
    program XLA could not compile within 30 minutes (measured); 10-12
    suffice once warmup has found the posterior bulk."""
    from exmc_tpu import Builder, dists

    T = len(r)
    marginal = make_grw_marginal(_sv_loglik(np.asarray(r)), T,
                                 newton_iters=newton_iters,
                                 implicit_diff=implicit_diff)

    def logpdf(_value, params, data=None):
        logZ, _, _ = marginal(params["sigma"], {"nu": params["nu"]})
        return logZ

    lik = dists.Custom(logpdf_fn=logpdf, support="real")
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "sigma", dists.Exponential, {"lambda": 50.0})
    ir = Builder.rv(ir, "nu", dists.Exponential, {"lambda": 0.1})
    ir = Builder.rv(ir, "lik", lik, {"sigma": "sigma", "nu": "nu"})
    ir = Builder.obs(ir, "lik_obs", "lik", 0.0)
    return ir


def sv_inla(r, sigma_grid=None, nu_grid=None, newton_iters=25,
            grid_batch=None):
    """Full INLA for the SV model: evaluate the Laplace marginal on a
    (sigma, nu) grid, normalize to the joint hyperparameter posterior,
    and mix the conditional latent Gaussians into marginal path
    estimates.

    ``grid_batch=B`` evaluates the grid in bounded device calls of B
    points (one compiled program; short batches pad by wrapping) — the
    full 1600-point grid at T=5000 in ONE call ran for minutes and
    kernel-faulted the remote axon TPU worker (measured).

    Returns dict with hyperparam grids/posterior, posterior means/sds of
    sigma and nu, and the latent path's marginal mean/sd (mixture over
    the grid)."""
    r = np.asarray(r)
    T = len(r)
    if sigma_grid is None:
        sigma_grid = np.geomspace(0.002, 0.2, 40)
    if nu_grid is None:
        nu_grid = np.geomspace(2.0, 80.0, 40)
    marginal = make_grw_marginal(_sv_loglik(r), T,
                                 newton_iters=newton_iters)

    sg, ng = np.meshgrid(sigma_grid, nu_grid, indexing="ij")
    flat_s = jnp.asarray(sg.reshape(-1), default_dtype())
    flat_n = jnp.asarray(ng.reshape(-1), default_dtype())

    @jax.jit
    def run(flat_s, flat_n):
        def one(sig, nu):
            logZ, s_hat, var_hat = marginal(sig, {"nu": nu})
            # prior: sigma ~ Exp(50), nu ~ Exp(0.1); grid in log-space
            # so include the log-Jacobians sigma, nu
            lp = (logZ - 50.0 * sig + jnp.log(sig)
                  - 0.1 * nu + jnp.log(nu))
            return lp, s_hat, var_hat

        return jax.vmap(one)(flat_s, flat_n)

    n_pts = int(flat_s.shape[0])
    if grid_batch is None or grid_batch >= n_pts:
        lp, s_hat, var_hat = run(flat_s, flat_n)
    else:
        parts = []
        for s0 in range(0, n_pts, grid_batch):
            e = min(s0 + grid_batch, n_pts)
            idx = np.arange(grid_batch) % (e - s0)
            out = run(flat_s[s0:e][idx], flat_n[s0:e][idx])
            parts.append(jax.tree.map(lambda a: a[: e - s0], out))
        lp, s_hat, var_hat = jax.tree.map(
            lambda *xs: jnp.concatenate(xs), *parts)
    # np.array (not asarray): under x64 the device arrays are already
    # f64 and asarray returns a READ-ONLY zero-copy view -> the masked
    # writes below raise "output array is read-only"
    lp = np.array(lp, np.float64)
    s_hat = np.array(s_hat, np.float64)
    var_hat = np.array(var_hat, np.float64)
    # extreme grid corners (tiny sigma x tiny nu at long T) can blow
    # the f32 Newton out of range -> non-finite logZ; one NaN would
    # poison max/sum, so failed points get exactly zero weight (they
    # fail BECAUSE they're absurd — negligible true mass) and their
    # conditional moments are zeroed out of the mixture (0 * NaN = NaN
    # otherwise). n_failed is reported; a failure NEAR the mode would
    # show up as a large accuracy z-score downstream.
    bad = ~np.isfinite(lp)
    if bad.all():
        raise ValueError(
            f"sv_inla: the Laplace marginal is non-finite at ALL "
            f"{lp.size} grid points — the grid is entirely outside the "
            "numerically representable region (masking would just "
            "return NaN again); widen/re-center sigma_grid/nu_grid")
    if bad.any():
        lp[bad] = -np.inf
        s_hat[bad] = 0.0
        var_hat[bad] = 0.0
    lp -= lp.max()
    w = np.exp(lp)
    w /= w.sum()

    sig_mean = float((w * sg.reshape(-1)).sum())
    sig_sd = float(np.sqrt((w * (sg.reshape(-1) - sig_mean) ** 2).sum()))
    nu_mean = float((w * ng.reshape(-1)).sum())
    nu_sd = float(np.sqrt((w * (ng.reshape(-1) - nu_mean) ** 2).sum()))

    path_mean = (w[:, None] * s_hat).sum(axis=0)
    path_var = (w[:, None] * (var_hat + (s_hat - path_mean) ** 2)).sum(axis=0)

    return {
        "sigma_grid": sigma_grid, "nu_grid": nu_grid,
        "posterior": w.reshape(sg.shape),
        "sigma_mean": sig_mean, "sigma_sd": sig_sd,
        "nu_mean": nu_mean, "nu_sd": nu_sd,
        "path_mean": path_mean, "path_sd": np.sqrt(path_var),
        "n_failed": int(bad.sum()),
    }

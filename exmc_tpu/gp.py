"""Gaussian-process model building on the IR (beyond the reference —
no GP support exists in borodark/exmc; this is standard PPL surface a
PyMC/Stan user expects).

Two formulations, both plain IR graphs (nothing new in the compiler):

* ``gp_marginal``: Gaussian-noise regression with f marginalized
  analytically — y ~ MvNormal(mean, K(X, X; theta) + sigma^2 I), only
  the kernel hyperparameters are sampled. One O(n^3) Cholesky per logp
  evaluation, batched on the MXU; the exact form, no latent vector.
* ``gp_latent``: non-Gaussian likelihoods. WHITENED parameterization —
  z ~ N(0, I), f = m + L(theta) z with L the jittered Cholesky — so
  NUTS moves in an identity-metric space regardless of the sampled
  hyperparameters (the GP analogue of the auto-NCP lesson: centered f
  has condition number kappa(K), whitened has ~1).

``gp_predict`` draws f* | f, theta at new inputs from the exact
conditional N(Ks^T K^-1 f, Kss - Ks^T K^-1 Ks), vmapped over posterior
draws.

Kernels are pure-jnp pairwise functions supporting scalar or
per-dimension (ARD) lengthscales; X is (n,) or (n, p). All kernel
hyperparameters may be IR references (sampled) or constants.
"""

import numpy as np
import jax
import jax.numpy as jnp

from exmc_tpu.config import default_dtype

__all__ = [
    "rbf", "matern32", "matern52", "periodic", "linear",
    "gp_latent", "gp_marginal", "gp_predict", "KERNELS",
]


def _as_2d(x):
    x = jnp.asarray(x, default_dtype())
    return x[:, None] if x.ndim == 1 else x


def _sqdist(x1, x2, lengthscale):
    """Pairwise scaled squared distances, (n1, n2). ``lengthscale`` is
    scalar or (p,) (ARD)."""
    x1 = _as_2d(x1) / lengthscale
    x2 = _as_2d(x2) / lengthscale
    d = x1[:, None, :] - x2[None, :, :]
    return jnp.sum(d * d, axis=-1)


def rbf(x1, x2, lengthscale=1.0, variance=1.0):
    """Squared-exponential kernel."""
    return variance * jnp.exp(-0.5 * _sqdist(x1, x2, lengthscale))


def matern32(x1, x2, lengthscale=1.0, variance=1.0):
    r = jnp.sqrt(_sqdist(x1, x2, lengthscale) + 1e-12)
    a = np.sqrt(3.0) * r
    return variance * (1.0 + a) * jnp.exp(-a)


def matern52(x1, x2, lengthscale=1.0, variance=1.0):
    r = jnp.sqrt(_sqdist(x1, x2, lengthscale) + 1e-12)
    a = np.sqrt(5.0) * r
    return variance * (1.0 + a + a * a / 3.0) * jnp.exp(-a)


def periodic(x1, x2, lengthscale=1.0, variance=1.0, period=1.0):
    """Exp-sine-squared kernel (1-d inputs or summed over dims)."""
    d = _as_2d(x1)[:, None, :] - _as_2d(x2)[None, :, :]
    s = jnp.sin(np.pi * d / period) / lengthscale
    return variance * jnp.exp(-2.0 * jnp.sum(s * s, axis=-1))


def linear(x1, x2, variance=1.0, offset=0.0):
    a = _as_2d(x1) - offset
    b = _as_2d(x2) - offset
    return variance * (a @ b.T)


KERNELS = {"rbf": rbf, "matern32": matern32, "matern52": matern52,
           "periodic": periodic, "linear": linear}


def _kernel_fn(kernel):
    if callable(kernel):
        return kernel
    if kernel not in KERNELS:
        raise ValueError(
            f"unknown kernel {kernel!r} (one of {sorted(KERNELS)} "
            "or a callable (x1, x2, **hypers) -> matrix)")
    return KERNELS[kernel]


def _split_hypers(hypers):
    """{name: ref-or-constant} -> ([(kw name, node ref)...] in fixed
    order, constants). Ref VALUES become det-node dependencies (the kw
    name is how the kernel consumes them); constants close over."""
    refs, consts = [], {}
    for k, v in sorted(hypers.items()):
        if isinstance(v, str):
            refs.append((k, v))
        else:
            consts[k] = v
    return refs, consts


def _cov_builder(kernel, x1, x2, hypers, jitter):
    """Det-node fn computing K(x1, x2) from the sampled hyper refs.
    Returns (fn, [node refs] for the det args)."""
    kfn = _kernel_fn(kernel)
    refs, consts = _split_hypers(hypers)

    def build(*vals):
        kw = dict(consts)
        kw.update({name: v for (name, _), v in zip(refs, vals)})
        k = kfn(x1, x2, **kw)
        if jitter and x1 is x2:
            k = k + jitter * jnp.eye(k.shape[0], dtype=k.dtype)
        return k

    return build, [r for (_, r) in refs]


def gp_latent(m, name, X, *, kernel="rbf", mean=0.0, jitter=1e-4,
              **hypers):
    """Add a whitened latent GP to Model ``m``: ``{name}_z`` ~ N(0, I),
    ``{name}`` = mean + chol(K + jitter I) z. Returns the f node id.

    ``hypers`` (lengthscale=, variance=, ...) may be node references
    (strings) or constants; referenced hyperparameters rebuild the
    kernel matrix inside the compiled logp, so NUTS sees their exact
    gradients through the Cholesky.

    The default jitter is 1e-4 (not the marginal form's 1e-6): here
    the Cholesky GRADIENT flows into NUTS, and in f32 a near-singular
    K (large sampled lengthscale) explodes it — measured: jitter 1e-6
    gave 97% divergences on a 40-point classifier, 1e-4 gave 0 with
    the posterior unchanged at this data scale. For classification
    pass the latent straight into ``dists.Bernoulli {"logits": f}``
    (the p-space path saturates in f32; see discrete.py)."""
    X = np.asarray(X)
    n = X.shape[0]
    build, refs = _cov_builder(kernel, X, X, hypers, jitter)
    from exmc_tpu import dists

    m.rv(f"{name}_z", dists.Normal, {"mu": np.zeros(n), "sigma": 1.0},
         shape=(n,))
    m.det(f"{name}_cov", build, refs)

    def whiten(cov, z):
        return mean + jnp.linalg.cholesky(cov) @ z

    m.det(name, whiten, [f"{name}_cov", f"{name}_z"])
    return name


def gp_marginal(m, name, X, y_obs, *, kernel="rbf", mean=0.0,
                noise="noise", jitter=1e-6, **hypers):
    """Add a marginalized GP REGRESSION observation to Model ``m``:
    y ~ MvNormal(mean, K(X, X) + noise^2 I + jitter I), observed at
    ``y_obs``. ``noise`` is a node reference (sampled noise sd) or a
    constant. Returns the obs node id ``{name}_obs``."""
    X = np.asarray(X)
    y_obs = np.asarray(y_obs)
    n = X.shape[0]
    build, refs = _cov_builder(kernel, X, X, hypers, jitter)
    from exmc_tpu import dists

    if isinstance(noise, str):
        def full_cov(k, s):
            return k + (s * s) * jnp.eye(n, dtype=k.dtype)

        m.det(f"{name}_kern", build, refs)
        m.det(f"{name}_cov", full_cov, [f"{name}_kern", noise])
    else:
        def full_cov_c(k):
            return k + float(noise) ** 2 * jnp.eye(n, dtype=k.dtype)

        m.det(f"{name}_kern", build, refs)
        m.det(f"{name}_cov", full_cov_c, [f"{name}_kern"])
    m.rv(name, dists.MvNormal,
         {"mu": mean * np.ones(n), "cov": f"{name}_cov"})
    m.obs(f"{name}_obs", name, y_obs)
    return f"{name}_obs"


def gp_predict(trace, X, Xstar, *, kernel="rbf", mean=0.0, jitter=1e-4,
               f_name=None, y=None, noise=None, seed=0, num_draws=None,
               **hypers):
    """Posterior GP draws at new inputs ``Xstar``, vmapped over the
    posterior sample.

    Latent form: pass ``f_name`` — conditions on the sampled latent f
    (trace[f_name+"_z"] is whitened back through each draw's kernel).
    Marginal form: pass ``y`` (+ ``noise``: trace key or constant) —
    conditions on the observations through K + sigma^2 I.

    ``hypers`` values that are strings are looked up in the trace
    (posterior draws); others are constants. Returns (S, n*) draws of
    f* (one conditional draw per posterior sample: the full posterior
    predictive of the function values).

    ``jitter`` must MATCH the model's (defaults match gp_latent's
    1e-4): the latent path un-whitens trace z draws through
    chol(K + jitter I), and a different jitter than the one the model
    sampled under reconstructs a systematically different f (review
    finding, round 4)."""
    if (f_name is None) == (y is None):
        raise ValueError("pass exactly one of f_name= (latent) or "
                         "y= (marginal)")
    kfn = _kernel_fn(kernel)
    dtype = default_dtype()
    X = np.asarray(X)
    Xstar = np.asarray(Xstar)
    n = X.shape[0]

    refs, consts = _split_hypers(hypers)

    def flatten(a):
        a = np.asarray(a)
        return a.reshape(-1, *a.shape[2:]) if a.ndim > 2 else a.reshape(-1)

    hyper_draws = {name: jnp.asarray(flatten(trace[ref]), dtype)
                   for name, ref in refs}
    if f_name is not None:
        z_draws = jnp.asarray(flatten(trace[f_name + "_z"]), dtype)
        s_total = z_draws.shape[0]
    else:
        y = jnp.asarray(np.asarray(y), dtype)
        if isinstance(noise, str):
            noise_draws = jnp.asarray(flatten(trace[noise]), dtype)
            s_total = noise_draws.shape[0]
        else:
            if not hyper_draws:
                raise ValueError("marginal gp_predict needs at least one "
                                 "trace-ref hyper or noise")
            s_total = next(iter(hyper_draws.values())).shape[0]
            noise_draws = jnp.full((s_total,), float(noise or 0.0), dtype)

    if num_draws is not None and num_draws < s_total:
        idx = np.linspace(0, s_total - 1, num_draws).astype(int)
        hyper_draws = {k: v[idx] for k, v in hyper_draws.items()}
        if f_name is not None:
            z_draws = z_draws[idx]
        else:
            noise_draws = noise_draws[idx]
        s_total = len(idx)

    keys = jax.random.split(jax.random.PRNGKey(seed), s_total)

    def one(args):
        hv, extra, key = args
        kw = dict(consts)
        kw.update(hv)
        kxx = kfn(X, X, **kw) + jitter * jnp.eye(n, dtype=dtype)
        kxs = kfn(X, Xstar, **kw)
        kss = kfn(Xstar, Xstar, **kw) + jitter * jnp.eye(
            Xstar.shape[0], dtype=dtype)
        if f_name is not None:
            lxx = jnp.linalg.cholesky(kxx)
            f = mean + lxx @ extra          # whiten z -> f
            rhs = f - mean
            kc = kxx
        else:
            kc = kxx + (extra * extra) * jnp.eye(n, dtype=dtype)
            rhs = y - mean
        lc = jnp.linalg.cholesky(kc)
        alpha = jax.scipy.linalg.cho_solve((lc, True), rhs)
        mu_s = mean + kxs.T @ alpha
        v = jax.scipy.linalg.solve_triangular(lc, kxs, lower=True)
        cov_s = kss - v.T @ v
        # the subtraction can dip ~1e-5 below PSD in f32 when the
        # draw's lengthscale makes K(X, X) near-singular; scale the
        # stabilizer with the covariance magnitude instead of a fixed
        # 1e-8 (measured: fixed jitter left NaN rows in the predictive)
        stab = 1e-5 * (1.0 + jnp.max(jnp.diag(kss)))
        ls = jnp.linalg.cholesky(
            cov_s + stab * jnp.eye(cov_s.shape[0], dtype=dtype))
        eps = jax.random.normal(key, (Xstar.shape[0],), dtype)
        return mu_s + ls @ eps

    extra = z_draws if f_name is not None else noise_draws
    draws = jax.jit(jax.vmap(one))((hyper_draws, extra, keys))
    return np.asarray(draws)

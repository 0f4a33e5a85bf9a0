"""End-to-end sampling for the remaining model classes: simplex RVs
(stick-breaking under NUTS), mixtures with RV-referenced weights,
censored observations via obs meta, measurable-lifted obs under
sampling, GaussianRandomWalk latents."""

import numpy as np
import pytest
import jax.numpy as jnp

from exmc_tpu import Builder, dists, sample


def test_dirichlet_multinomial_recovery():
    """Dirichlet posterior over category probabilities: conjugate
    Dirichlet(alpha + counts)."""
    rng = np.random.default_rng(0)
    probs = np.array([0.5, 0.3, 0.2])
    n = 300
    cats = rng.choice(3, size=n, p=probs)
    counts = np.bincount(cats, minlength=3).astype(np.float64)

    def loglik(_x, params):
        w = params["w"]
        return jnp.sum(jnp.asarray(counts) * jnp.log(w))

    lik = dists.Custom(logpdf_fn=loglik, support="real")
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "w", dists.Dirichlet, {"alpha": np.ones(3)})
    ir = Builder.rv(ir, "lik", lik, {"w": "w"})
    ir = Builder.obs(ir, "lik_obs", "lik", 0.0)
    trace, stats = sample(ir, num_warmup=400, num_samples=400, seed=0)
    w = trace["w"]
    assert w.shape == (1, 400, 3)
    np.testing.assert_allclose(w.sum(axis=-1), 1.0, atol=1e-4)
    post_mean = (1.0 + counts) / (3.0 + n)
    np.testing.assert_allclose(w.mean(axis=(0, 1)), post_mean, atol=0.03)


def test_mixture_with_fixed_weights_sampling():
    """Free location of one mixture component recovered from data."""
    rng = np.random.default_rng(1)
    ys = np.concatenate([
        rng.normal(-2.0, 0.5, 150), rng.normal(3.0, 0.5, 150)
    ])
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "m1", dists.Normal, {"mu": 3.0, "sigma": 2.0})
    ir = Builder.rv(
        ir, "y", dists.Mixture,
        {
            "components": [dists.Normal, dists.Normal],
            "params": [{"mu": -2.0, "sigma": 0.5}, {"mu": "m1", "sigma": 0.5}],
            "weights": np.array([0.5, 0.5]),
        },
    )
    ir = Builder.obs(ir, "y_obs", "y", ys)
    trace, _ = sample(ir, num_warmup=400, num_samples=300, seed=1)
    assert abs(float(trace["m1"].mean()) - 3.0) < 0.15


def test_censored_obs_meta_sampling():
    """Right-censored Normal observations shift the posterior up
    (obs meta censored=, reference censored.ex / compiler.ex:274-277)."""
    rng = np.random.default_rng(2)
    full = rng.normal(1.0, 1.0, size=80)
    cut = 1.5
    observed = full[full <= cut]
    n_cens = int((full > cut).sum())

    ir = Builder.new_ir()
    ir = Builder.rv(ir, "mu", dists.Normal, {"mu": 0.0, "sigma": 10.0})
    ir = Builder.rv(ir, "y", dists.Normal, {"mu": "mu", "sigma": 1.0})
    ir = Builder.obs(ir, "y_obs", "y", observed)
    # censored points only tell us they exceed the cut
    ir = Builder.rv(ir, "yc", dists.Normal, {"mu": "mu", "sigma": 1.0})
    ir = Builder.obs(ir, "yc_obs", "yc", np.full(n_cens, cut),
                     censored="right")
    trace, _ = sample(ir, num_warmup=400, num_samples=400, seed=2)
    mu_cens = float(trace["mu"].mean())

    ir2 = Builder.new_ir()
    ir2 = Builder.rv(ir2, "mu", dists.Normal, {"mu": 0.0, "sigma": 10.0})
    ir2 = Builder.rv(ir2, "y", dists.Normal, {"mu": "mu", "sigma": 1.0})
    ir2 = Builder.obs(ir2, "y_obs", "y", observed)
    trace2, _ = sample(ir2, num_warmup=400, num_samples=400, seed=2)
    mu_naive = float(trace2["mu"].mean())

    # accounting for censoring must pull mu toward the true 1.0
    assert mu_cens > mu_naive + 0.1
    assert abs(mu_cens - 1.0) < 0.35


def test_measurable_affine_sampling():
    """Sampling through a lifted affine observation recovers the parent."""
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "mu", dists.Normal, {"mu": 0.0, "sigma": 10.0})
    ir = Builder.rv(ir, "x", dists.Normal, {"mu": "mu", "sigma": 0.3})
    ir = Builder.det(ir, "yd", "affine", [2.0, 1.0, "x"])
    ir = Builder.obs(ir, "y_obs", "yd", 7.0)  # implies x = 3.0
    trace, _ = sample(ir, num_warmup=300, num_samples=300, seed=3, ncp=False)
    assert abs(float(trace["mu"].mean()) - 3.0) < 0.5


def test_grw_latent_sampling():
    """Short GRW latent path recovered from noisy observations."""
    rng = np.random.default_rng(4)
    t = 12
    path = np.cumsum(rng.normal(0, 0.5, t))
    ys = path + rng.normal(0, 0.2, t)
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "s", dists.GaussianRandomWalk, {"sigma": 0.5},
                    shape=(t,))
    ir = Builder.rv(ir, "y", dists.Normal, {"mu": "s", "sigma": 0.2})
    ir = Builder.obs(ir, "y_obs", "y", ys)
    trace, stats = sample(ir, num_warmup=400, num_samples=400, seed=4)
    est = trace["s"].mean(axis=(0, 1))
    assert np.max(np.abs(est - path)) < 0.6

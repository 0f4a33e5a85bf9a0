"""HMM marginalization tests (exmc_tpu/hmm.py, D-T34).

Beyond the reference (no discrete-latent machinery). Bars: the forward
algorithm against BRUTE-FORCE path enumeration (exact), a Gaussian HMM
recovering its generating parameters through NUTS with the discrete
states marginalized, smoothing probabilities that identify the true
states, and Viterbi accuracy.
"""

import itertools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from exmc_tpu import Model, dists, sample
from exmc_tpu.hmm import forward_logp, hmm_dist, posterior_state_probs, viterbi


def _norm_logpdf(y, mu, sigma):
    z = (y - mu) / sigma
    return -0.5 * z * z - np.log(sigma) - 0.5 * np.log(2 * np.pi)


def test_forward_matches_brute_force():
    rng = np.random.default_rng(0)
    T, K = 8, 2
    trans = np.array([[0.8, 0.2], [0.3, 0.7]])
    init = np.array([0.6, 0.4])
    mus, sigma = np.array([-1.0, 1.5]), 0.7
    y = rng.normal(size=T)
    log_obs = np.stack(
        [_norm_logpdf(y, mus[k], sigma) for k in range(K)], axis=-1)

    got = float(forward_logp(jnp.asarray(log_obs), jnp.log(jnp.asarray(trans)),
                             jnp.log(jnp.asarray(init))))

    # brute force: sum over all 2^8 state paths
    total = -np.inf
    for path in itertools.product(range(K), repeat=T):
        lp = np.log(init[path[0]]) + log_obs[0, path[0]]
        for t in range(1, T):
            lp += np.log(trans[path[t - 1], path[t]]) + log_obs[t, path[t]]
        total = np.logaddexp(total, lp)
    assert got == pytest.approx(total, abs=1e-4)


def _gen_hmm_data(T=300, seed=0):
    rng = np.random.default_rng(seed)
    trans = np.array([[0.9, 0.1], [0.2, 0.8]])
    mus, sigma = np.array([-1.0, 1.5]), 0.6
    s = np.zeros(T, int)
    s[0] = 0
    for t in range(1, T):
        s[t] = rng.choice(2, p=trans[s[t - 1]])
    y = mus[s] + sigma * rng.normal(size=T)
    return y.astype(np.float32), s, trans, mus, sigma


def _emission(y, k, params):
    mu = params["mus"][k]
    sigma = params["sigma"]
    z = (y - mu) / sigma
    return -0.5 * z * z - jnp.log(sigma) - 0.5 * np.log(2 * np.pi)


def _fit(y):
    with Model() as m:
        m.rv("mus", dists.Normal, {"mu": 0.0, "sigma": 3.0},
             transform="ordered", shape=(2,))
        m.rv("sigma", dists.HalfNormal, {"sigma": 2.0})
        m.rv("p00", dists.Beta, {"alpha": 2.0, "beta": 2.0})
        m.rv("p11", dists.Beta, {"alpha": 2.0, "beta": 2.0})
        m.det("trans", lambda a, b: jnp.stack(
            [jnp.stack([a, 1 - a]), jnp.stack([1 - b, b])]), ["p00", "p11"])
        m.rv("y", hmm_dist(_emission, 2, stationary_init=True),
             {"trans": "trans", "mus": "mus", "sigma": "sigma"})
        m.obs("y_obs", "y", y)
    return m, sample(m.ir, num_chains=2, num_warmup=400, num_samples=400,
                     seed=0)


def test_gaussian_hmm_recovers_parameters():
    y, s, trans, mus, sigma = _gen_hmm_data()
    _, (trace, stats) = _fit(y)
    assert stats["divergences"].sum() == 0
    mus_post = trace["mus"].reshape(-1, 2).mean(axis=0)
    np.testing.assert_allclose(mus_post, mus, atol=0.25)
    assert trace["sigma"].mean() == pytest.approx(sigma, abs=0.1)
    assert trace["p00"].mean() == pytest.approx(0.9, abs=0.08)
    assert trace["p11"].mean() == pytest.approx(0.8, abs=0.1)


def test_hmm_state_decoding():
    y, s, trans, mus, sigma = _gen_hmm_data()
    _, (trace, stats) = _fit(y)
    # decode with the posterior-mean parameters (point decode)
    params = {
        "mus": jnp.asarray(trace["mus"].reshape(-1, 2).mean(axis=0)),
        "sigma": jnp.asarray(trace["sigma"].mean()),
        "trans": jnp.asarray(
            trace["p00"].mean() * np.array([[1, 0], [0, 0]])
            + (1 - trace["p00"].mean()) * np.array([[0, 1], [0, 0]])
            + trace["p11"].mean() * np.array([[0, 0], [0, 1]])
            + (1 - trace["p11"].mean()) * np.array([[0, 0], [1, 0]])),
    }
    gamma = np.asarray(posterior_state_probs(_emission, y, params, 2, stationary_init=True))
    assert gamma.shape == (len(y), 2)
    np.testing.assert_allclose(gamma.sum(axis=1), 1.0, atol=1e-4)
    acc_smooth = ((gamma[:, 1] > 0.5).astype(int) == s).mean()
    assert acc_smooth > 0.85

    path = np.asarray(viterbi(_emission, y, params, 2, stationary_init=True))
    assert path.shape == (len(y),)
    assert (path == s).mean() > 0.85

"""Bayesian statistical process control: changepoint detection
(reference notebooks/13_bayesian_spc.livemd narrative).

A Shewhart chart answers "how often would noise cross 3-sigma?" — a
frequency about an infinite future. The operator needs P(the process
has shifted | data), a probability about *this* run. A Bayesian
changepoint model gives exactly that.

Model (Nile-style annual flow, known shift when the Aswan Low Dam
construction began): y_t ~ Normal(mu1 if t < tau else mu2, sigma) with
the discrete changepoint tau MARGINALIZED inside the likelihood:

    log p(y | mu1, mu2, sigma) = logsumexp_k [ log prior(tau=k)
        + sum_{t<k} logN(y_t|mu1,s) + sum_{t>=k} logN(y_t|mu2,s) ]

TPU-first formulation: the reference's notebook iterates candidate
changepoints on the host; here the per-k segment log-likelihoods come
from ONE (T+1, T) broadcast + masked sum — a single fused VPU pass
under jit, differentiable in (mu1, mu2, sigma), no discrete sampling.
P(tau = k | y) is then recovered per posterior draw by softmax of the
per-k joint terms (Rao-Blackwellized changepoint posterior).
"""

import os

import numpy as np

from exmc_tpu import Builder, dists, sample
from exmc_tpu.diagnostics import rhat

SMOKE = os.environ.get("EXMC_EXAMPLES_SMOKE") == "1"

T = 100
TRUE_TAU = 28          # index of the first post-shift observation
TRUE = {"mu1": 1100.0, "mu2": 850.0, "sigma": 120.0}


def generate(seed=7):
    rng = np.random.default_rng(seed)
    mu = np.where(np.arange(T) < TRUE_TAU, TRUE["mu1"], TRUE["mu2"])
    return (mu + rng.normal(0.0, TRUE["sigma"], T)).astype(np.float32)


def per_k_loglik(y, mu1, mu2, sigma):
    """(T+1,) log-likelihood of y for each candidate changepoint k
    (k = number of pre-shift observations, 0..T) in one broadcast."""
    import jax.numpy as jnp

    t = jnp.arange(T)
    lp1 = dists.Normal.logpdf(y, {"mu": mu1, "sigma": sigma})   # (T,)
    lp2 = dists.Normal.logpdf(y, {"mu": mu2, "sigma": sigma})   # (T,)
    ks = jnp.arange(T + 1)[:, None]                             # (T+1, 1)
    pre = t[None, :] < ks                                       # (T+1, T)
    return jnp.sum(jnp.where(pre, lp1, lp2), axis=-1)           # (T+1,)


def build(y):
    import jax.numpy as jnp

    yj = jnp.asarray(y)

    def marginal_loglik(_value, params):
        # uniform prior over tau: -log(T+1) constant, dropped
        per_k = per_k_loglik(yj, params["mu1"], params["mu2"],
                             params["sigma"])
        from jax.scipy.special import logsumexp
        return logsumexp(per_k)

    ir = Builder.new_ir()
    ir = Builder.rv(ir, "mu1", dists.Normal, {"mu": 1000.0, "sigma": 300.0})
    ir = Builder.rv(ir, "mu2", dists.Normal, {"mu": 1000.0, "sigma": 300.0})
    ir = Builder.rv(ir, "sigma", dists.HalfNormal, {"sigma": 200.0})
    lik = dists.Custom(logpdf_fn=marginal_loglik, support="real")
    ir = Builder.rv(ir, "y", lik,
                    {"mu1": "mu1", "mu2": "mu2", "sigma": "sigma"})
    ir = Builder.obs(ir, "y_obs", "y", 0.0)  # value unused: marginal factor
    return ir


def changepoint_posterior(y, trace):
    """Rao-Blackwellized P(tau = k | y): softmax of per-k joint terms,
    averaged over posterior draws (vmapped on device)."""
    import jax
    import jax.numpy as jnp

    yj = jnp.asarray(y)
    flat = {k: jnp.asarray(trace[k]).reshape(-1) for k in
            ("mu1", "mu2", "sigma")}

    def one(mu1, mu2, sigma):
        lp = per_k_loglik(yj, mu1, mu2, sigma)
        return jax.nn.softmax(lp)

    probs = jax.vmap(one)(flat["mu1"], flat["mu2"], flat["sigma"])
    return np.asarray(jnp.mean(probs, axis=0))


def main():
    y = generate()
    ir = build(y)
    chains = 4 if SMOKE else 32
    n = 150 if SMOKE else 1000
    trace, stats = sample(ir, num_chains=chains, num_warmup=max(300, n),
                          num_samples=n, seed=0)

    for name in ("mu1", "mu2", "sigma"):
        arr = trace[name]
        print(f"{name:6s} = {arr.mean():8.1f} (true {TRUE[name]:7.1f}), "
              f"rhat={float(rhat(arr)):.3f}")

    p_tau = changepoint_posterior(y, trace)
    k_map = int(np.argmax(p_tau))
    # P(shift happened at all) vs the no-shift edge cells k=0 / k=T
    p_shift = 1.0 - p_tau[0] - p_tau[-1]
    print(f"MAP changepoint: t={k_map} (true {TRUE_TAU}), "
          f"P(tau=MAP)={p_tau[k_map]:.2f}, P(shift)={p_shift:.3f}")
    print(f"divergences: {int(stats['divergences'].sum())}")

    if not SMOKE:
        assert abs(k_map - TRUE_TAU) <= 2
        assert p_shift > 0.99
        assert abs(trace["mu2"].mean() - TRUE["mu2"]) < 60


if __name__ == "__main__":
    main()

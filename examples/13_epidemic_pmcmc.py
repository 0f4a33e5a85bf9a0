"""Epidemic inference with an intractable likelihood: bootstrap particle
filter + particle MCMC (the smc_ex stack, reference DECISIONS D72/D73).

A stochastic SIR model has DISCRETE, random transitions — new
infections are integer draws, not a differentiable density — so NUTS
cannot run: there is no closed-form p(y | beta). The bootstrap filter
gives an unbiased estimate of the marginal likelihood by simulating
particles through the epidemic, and particle-marginal MH (Andrieu,
Doucet & Holenstein 2010) targets the EXACT posterior of the
transmission rate despite the noise in that estimate.

TPU-first formulation: the reference's smc_ex fans BEAM processes over
particles; here 512 particles advance through all T weeks inside one
``lax.scan``, and PMMH chains vmap on top — the full inference is a
single XLA program (exmc_tpu.particle).
"""

import os

import numpy as np

SMOKE = os.environ.get("EXMC_EXAMPLES_SMOKE") == "1"

N_POP = 10_000.0
T = 40
TRUE_BETA = 0.45       # transmission rate per week
GAMMA = 0.2            # recovery rate (known)
RHO = 0.4              # case-ascertainment fraction (known)


def generate(seed=17):
    rng = np.random.default_rng(seed)
    s, i = N_POP - 20.0, 20.0
    cases = []
    for _ in range(T):
        p_inf = 1.0 - np.exp(-TRUE_BETA * i / N_POP)
        new_inf = rng.binomial(int(s), p_inf)
        new_rec = rng.binomial(int(i), 1.0 - np.exp(-GAMMA))
        s -= new_inf
        i += new_inf - new_rec
        cases.append(rng.poisson(RHO * max(new_inf, 1e-9)))
    return np.asarray(cases, np.float32)


def model_fns():
    import jax
    import jax.numpy as jnp

    def init_fn(key, n, params):
        # state per particle: (s, i, new_inf)
        return jnp.tile(jnp.asarray([N_POP - 20.0, 20.0, 0.0]), (n, 1))

    def step_fn(key, x, t, params):
        beta = params["beta"]
        s, i = x[:, 0], x[:, 1]
        k1, k2 = jax.random.split(key)
        p_inf = 1.0 - jnp.exp(-beta * i / N_POP)
        # normal approximation to the binomial keeps the state float
        # (f32, VPU-friendly) while preserving the stochastic dynamics
        mean_inf = s * p_inf
        new_inf = jnp.clip(
            mean_inf + jnp.sqrt(jnp.maximum(mean_inf, 1e-6))
            * jax.random.normal(k1, s.shape), 0.0, s)
        p_rec = 1.0 - jnp.exp(-GAMMA)
        mean_rec = i * p_rec
        new_rec = jnp.clip(
            mean_rec + jnp.sqrt(jnp.maximum(mean_rec, 1e-6))
            * jax.random.normal(k2, i.shape), 0.0, i)
        return jnp.stack([s - new_inf, i + new_inf - new_rec, new_inf],
                         axis=1)

    def loglik_fn(x, y, t, params):
        lam = jnp.maximum(RHO * x[:, 2], 1e-3)
        return y * jnp.log(lam) - lam - jax.scipy.special.gammaln(y + 1.0)

    return init_fn, step_fn, loglik_fn


def main():
    import jax
    import jax.numpy as jnp

    from exmc_tpu.particle import particle_filter, pmcmc
    from exmc_tpu.particle.filter import make_log_marginal_fn

    ys = generate()
    init_fn, step_fn, loglik_fn = model_fns()
    n_particles = 128 if SMOKE else 512

    # 1. one filter pass at the true beta: log-evidence + filtered path
    out = particle_filter(init_fn, step_fn, loglik_fn, jnp.asarray(ys),
                          n_particles, jax.random.PRNGKey(0),
                          {"beta": TRUE_BETA})
    print(f"log p(y | beta={TRUE_BETA}) ~ {float(out['log_marginal']):.1f}, "
          f"min ESS {float(np.min(out['ess'])):.2f}")

    # 2. PMMH over log-beta
    lm = make_log_marginal_fn(
        init_fn, step_fn, loglik_fn, jnp.asarray(ys), n_particles)

    def log_marginal(key, theta):
        return lm(key, {"beta": jnp.exp(theta[0])})

    def log_prior(theta):
        # log-normal prior on beta: beta ~ LogNormal(log 0.3, 0.7)
        return -0.5 * ((theta[0] - np.log(0.3)) / 0.7) ** 2

    num_samples = 80 if SMOKE else 800
    thetas, accept = pmcmc(log_marginal, log_prior,
                           jnp.asarray([np.log(0.3)]), num_samples,
                           jax.random.PRNGKey(1), step_scale=0.15,
                           num_chains=2 if SMOKE else 4)
    betas = np.exp(np.asarray(thetas)[:, num_samples // 4:, 0])
    print(f"beta posterior: {betas.mean():.3f} +- {betas.std():.3f} "
          f"(true {TRUE_BETA}), PMMH accept {np.asarray(accept).mean():.2f}")

    if not SMOKE:
        assert abs(betas.mean() - TRUE_BETA) < 0.08
        assert 0.05 < float(np.asarray(accept).mean()) < 0.8


if __name__ == "__main__":
    main()

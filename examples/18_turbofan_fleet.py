"""A hundred engines, one model: hierarchical fleet RUL estimation
(reference notebooks/16_turbofan_fleet.livemd — C-MAPSS FD001-shaped).

100 turbofan engines run from healthy to failure. Some have already
failed (lifetime observed); the rest are still running (lifetime
RIGHT-CENSORED at their current cycle count — they constrain the upper
tail). The hierarchy lets every engine borrow degradation knowledge
from the whole fleet:

    mu ~ Normal(200, 50)                 fleet mean lifetime [cycles]
    sigma_fleet ~ HalfNormal(50)         engine-to-engine variation
    L_i ~ Normal(mu, sigma_fleet)        per-engine lifetime
    failed:  L_i observed
    running: L_i > t_i  (right-censored — the Censored likelihood's
             log-survival term, reference censored.ex:17-42)

Deliverable: per-engine RUL posterior P(L_i - t_i) for the running
engines, and the maintenance decision — which engines exceed a 10%
probability of failure within the next 30-cycle window.

TPU-first: one vectorized Normal term for the failures + one vectorized
right-censored term for the runners; the RUL posteriors for all running
engines come from a single vmapped truncated-posterior draw.
"""

import os

import numpy as np

from exmc_tpu import Builder, dists, sample

SMOKE = os.environ.get("EXMC_EXAMPLES_SMOKE") == "1"

N_ENGINES = 100
TRUE_MU, TRUE_SIGMA = 206.0, 46.0  # C-MAPSS FD001 lifetime stats


def generate(seed=16):
    rng = np.random.default_rng(seed)
    lifetimes = rng.normal(TRUE_MU, TRUE_SIGMA, N_ENGINES).clip(60, None)
    # a snapshot in fleet time: engines entered service at random points
    age = rng.uniform(30, 280, N_ENGINES)
    failed = age >= lifetimes
    obs_life = lifetimes[failed]
    censor_at = age[~failed]
    return obs_life.astype(np.float32), censor_at.astype(np.float32)


def build(obs_life, censor_at):
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "mu", dists.Normal, {"mu": 200.0, "sigma": 50.0})
    ir = Builder.rv(ir, "sigma_fleet", dists.HalfNormal, {"sigma": 50.0})
    # failed engines: lifetime observed
    ir = Builder.rv(ir, "L_failed", dists.Normal,
                    {"mu": "mu", "sigma": "sigma_fleet"},
                    shape=(len(obs_life),))
    ir = Builder.obs(ir, "life_obs", "L_failed", obs_life)
    # running engines: lifetime right-censored at the current cycle
    ir = Builder.rv(ir, "L_running", dists.Normal,
                    {"mu": "mu", "sigma": "sigma_fleet"},
                    shape=(len(censor_at),))
    ir = Builder.obs(ir, "life_cens", "L_running", censor_at,
                     censored="right")
    return ir


def rul_posterior(trace, censor_at, window=30.0, n_mc=64, seed=0):
    """P(fail within `window` cycles | still alive at t_i) per engine:
    draw L from the truncated N(mu, sigma; L > t_i) per posterior draw
    (vmapped inverse-CDF) and count arrivals inside the window."""
    import jax
    import jax.numpy as jnp
    from jax.scipy.stats import norm

    mu = jnp.asarray(trace["mu"]).reshape(-1)
    sf = jnp.asarray(trace["sigma_fleet"]).reshape(-1)
    t = jnp.asarray(censor_at)
    key = jax.random.PRNGKey(seed)
    u = jax.random.uniform(key, (n_mc, mu.shape[0], t.shape[0]),
                           minval=1e-6, maxval=1 - 1e-6)

    def per_draw(mu_d, sf_d, u_d):
        # inverse-CDF truncated normal draw above t
        a = norm.cdf((t - mu_d) / sf_d)
        q = a + u_d * (1 - a)
        L = mu_d + sf_d * jax.scipy.special.ndtri(q)
        return L - t  # RUL

    rul = jax.vmap(lambda u_d: jax.vmap(per_draw, (0, 0, 0))(mu, sf, u_d))(u)
    rul = np.asarray(rul).reshape(-1, t.shape[0])
    p_fail = (rul < window).mean(axis=0)
    return rul, p_fail


def main():
    obs_life, censor_at = generate()
    print(f"fleet snapshot: {len(obs_life)} failed, "
          f"{len(censor_at)} running (right-censored)")
    ir = build(obs_life, censor_at)

    chains = 4 if SMOKE else 8
    iters = (150, 150) if SMOKE else (1000, 1000)
    trace, stats = sample(ir, num_chains=chains, num_warmup=iters[0],
                          num_samples=iters[1], seed=0)

    mu = trace["mu"].reshape(-1)
    sf = trace["sigma_fleet"].reshape(-1)
    print(f"\nfleet lifetime: mu = {mu.mean():.0f} ± {mu.std():.0f} cycles "
          f"(true {TRUE_MU:.0f}); sigma = {sf.mean():.0f} ± {sf.std():.0f} "
          f"(true {TRUE_SIGMA:.0f})")

    rul, p_fail = rul_posterior(trace, censor_at,
                                n_mc=8 if SMOKE else 64)
    order = np.argsort(-p_fail)
    print("\nwho's at risk (P(failure within 30 cycles)):")
    for rank, i in enumerate(order[:5]):
        med = np.median(rul[:, i])
        print(f"  engine@{censor_at[i]:.0f} cycles: "
              f"P={p_fail[i]:.2f}, median RUL {med:.0f} cycles"
              + ("  <- schedule overhaul" if p_fail[i] > 0.10 else ""))
    n_flag = int((p_fail > 0.10).sum())
    print(f"\n{n_flag}/{len(censor_at)} running engines exceed the 10% "
          "risk tolerance for the next maintenance window")

    if not SMOKE:
        assert abs(mu.mean() - TRUE_MU) < 3 * mu.std() + 10
        # censoring must push the fleet mean ABOVE the failed-only mean
        assert mu.mean() > obs_life.mean()
    print(f"divergences={int(stats['divergences'].sum())}")


if __name__ == "__main__":
    main()

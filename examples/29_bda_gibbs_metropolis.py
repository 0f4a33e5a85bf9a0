"""BDA3 ch. 11 — Gibbs and Metropolis from scratch (reference
notebooks/bda/ch11_gibbs_metropolis.livemd; Vehtari demos 11.1-11.2).

Target: a correlated bivariate Normal (rho = 0.8) — the textbook
stage where you can SEE what each sampler does. Both are written as
single `lax.scan` programs (the TPU idiom: one compiled chain, no
Python-loop host round-trips), with 64 vmapped chains for R-hat:

  * Gibbs: alternate the exact conditionals x1 | x2 and x2 | x1 —
    always accepted, but the 0.8 correlation makes the staircase slow;
  * Metropolis: spherical random-walk proposals with the acceptance
    test — tuning sigma trades acceptance for step size;
  * the punchline: NUTS (the framework's kernel) on the same target,
    which is what both ancestors grew up to be.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp

from exmc_tpu import Builder, dists, sample
from exmc_tpu.diagnostics import ess, rhat

SMOKE = os.environ.get("EXMC_EXAMPLES_SMOKE") == "1"

RHO = 0.8
COV = np.array([[1.0, RHO], [RHO, 1.0]])


def gibbs(key, n_iter, n_chains):
    cond_sd = jnp.sqrt(1.0 - RHO * RHO)

    def chain(key):
        def step(state, k):
            x1, x2 = state
            k1, k2 = jax.random.split(k)
            x1 = RHO * x2 + cond_sd * jax.random.normal(k1)
            x2 = RHO * x1 + cond_sd * jax.random.normal(k2)
            return (x1, x2), jnp.stack([x1, x2])

        keys = jax.random.split(key, n_iter)
        _, draws = jax.lax.scan(step, (jnp.float32(-3.0), jnp.float32(3.0)),
                                keys)
        return draws

    return jax.jit(jax.vmap(chain))(jax.random.split(key, n_chains))


def metropolis(key, n_iter, n_chains, prop_sd=0.8):
    prec = jnp.linalg.inv(jnp.asarray(COV))

    def log_p(x):
        return -0.5 * x @ prec @ x

    def chain(key):
        def step(state, k):
            x, lp = state
            k1, k2 = jax.random.split(k)
            prop = x + prop_sd * jax.random.normal(k1, (2,))
            lp_prop = log_p(prop)
            acc = jnp.log(jax.random.uniform(k2)) < lp_prop - lp
            x = jnp.where(acc, prop, x)
            lp = jnp.where(acc, lp_prop, lp)
            return (x, lp), (x, acc)

        keys = jax.random.split(key, n_iter)
        x0 = jnp.array([-3.0, 3.0])
        (_, _), (draws, accs) = jax.lax.scan(step, (x0, log_p(x0)), keys)
        return draws, accs

    return jax.jit(jax.vmap(chain))(jax.random.split(key, n_chains))


def main():
    n_iter = 300 if SMOKE else 2000
    n_chains = 16 if SMOKE else 64
    burn = n_iter // 2
    key = jax.random.PRNGKey(0)

    g = np.asarray(gibbs(key, n_iter, n_chains))[:, burn:]
    g_ess = float(ess(g[:, :, 0]))
    print(f"[gibbs      ] mean {g[:, :, 0].mean():+.3f}, "
          f"R-hat {float(rhat(g[:, :, 0])):.3f}, "
          f"ESS {g_ess:.0f}/{g.shape[0] * g.shape[1]} — exact "
          "conditionals, but rho=0.8 makes the staircase crawl")

    m, accs = metropolis(jax.random.fold_in(key, 1), n_iter, n_chains)
    m = np.asarray(m)[:, burn:]
    acc_rate = float(np.asarray(accs)[:, burn:].mean())
    m_ess = float(ess(m[:, :, 0]))
    print(f"[metropolis ] mean {m[:, :, 0].mean():+.3f}, "
          f"R-hat {float(rhat(m[:, :, 0])):.3f}, "
          f"ESS {m_ess:.0f}, acceptance {acc_rate:.1%}")

    ir = Builder.new_ir()
    ir = Builder.rv(ir, "x", dists.MvNormal,
                    {"mu": np.zeros(2, np.float32),
                     "cov": COV.astype(np.float32)}, shape=(2,))
    trace, _ = sample(ir, num_chains=min(n_chains, 16),
                      num_warmup=max(200, n_iter // 4),
                      num_samples=n_iter - burn, seed=0)
    x = np.asarray(trace["x"])[:, :, 0]
    print(f"[nuts       ] mean {x.mean():+.3f}, "
          f"R-hat {float(rhat(x)):.3f}, ESS {float(ess(x)):.0f} — "
          "gradients + trajectories: the descendant of both")

    for arr in (g[:, :, 0], m[:, :, 0], x):
        assert abs(arr.mean()) < 0.15
        assert abs(arr.std() - 1.0) < 0.15
    print("gibbs/metropolis OK: all three agree on the target")


if __name__ == "__main__":
    main()

"""BDA-cyber ch. 11 — Gibbs and Metropolis on correlated traffic
features (reference notebooks/bda-cyber/ch11_mcmc_traffic.livemd; the
security edition of ch. 11's bivariate normal).

Target: (log duration, log bytes) of network connections, correlated
at rho = 0.8 — longer connections move more data. Gibbs alternates the
exact conditionals; Metropolis sweeps proposal scales showing the
acceptance/step-size trade; NUTS closes the loop. All three as
lax.scan programs with vmapped chains.
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
    sd = jnp.sqrt(1 - RHO * RHO)

    def chain(k):
        def step(st, kk):
            d, b = st
            k1, k2 = jax.random.split(kk)
            d = RHO * b + sd * jax.random.normal(k1)
            b = RHO * d + sd * jax.random.normal(k2)
            return (d, b), jnp.stack([d, b])

        _, out = jax.lax.scan(step, (jnp.float32(3.0), jnp.float32(-3.0)),
                              jax.random.split(k, n_iter))
        return out

    return jax.jit(jax.vmap(chain))(jax.random.split(key, n_chains))


def metropolis(key, n_iter, n_chains, prop_sd):
    prec = jnp.linalg.inv(jnp.asarray(COV))

    def chain(k):
        def step(st, kk):
            x, lp = st
            k1, k2 = jax.random.split(kk)
            prop = x + prop_sd * jax.random.normal(k1, (2,))
            lpp = -0.5 * prop @ prec @ prop
            acc = jnp.log(jax.random.uniform(k2)) < lpp - lp
            return ((jnp.where(acc, prop, x), jnp.where(acc, lpp, lp)),
                    (jnp.where(acc, prop, x), acc))

        x0 = jnp.array([3.0, -3.0])
        _, (draws, accs) = jax.lax.scan(
            step, (x0, -0.5 * x0 @ prec @ x0),
            jax.random.split(k, n_iter))
        return draws, accs

    return jax.jit(jax.vmap(chain))(jax.random.split(key, n_chains))


def main():
    n_iter = 300 if SMOKE else 2000
    n_chains = 16 if SMOKE else 64
    burn = n_iter // 2
    key = jax.random.PRNGKey(0)

    g = np.asarray(gibbs(key, n_iter, n_chains))[:, burn:]
    print(f"[gibbs     ] ESS {float(ess(g[:, :, 0])):.0f}"
          f"/{g.shape[0] * g.shape[1]} — exact conditionals, rho=0.8 "
          "staircase")

    print("proposal-scale sweep (the Metropolis tuning lesson):")
    for psd in (0.1, 0.5, 1.5, 5.0):
        m, accs = metropolis(jax.random.fold_in(key, int(psd * 10)),
                             n_iter, n_chains, psd)
        m = np.asarray(m)[:, burn:]
        print(f"  sd={psd:<4}: acceptance "
              f"{float(np.asarray(accs)[:, burn:].mean()):.1%}, "
              f"ESS {float(ess(m[:, :, 0])):.0f}")

    ir = Builder.new_ir()
    ir = Builder.rv(ir, "x", dists.MvNormal,
                    {"mu": np.zeros(2, np.float32),
                     "cov": COV.astype(np.float32)}, shape=(2,))
    trace, _ = sample(ir, num_chains=min(n_chains, 16),
                      num_warmup=max(200, n_iter // 4),
                      num_samples=n_iter - burn, seed=0)
    x = np.asarray(trace["x"])[:, :, 0]
    print(f"[nuts      ] ESS {float(ess(x)):.0f}, "
          f"R-hat {float(rhat(x)):.3f} — the gradient-guided descendant")
    for arr in (g[:, :, 0], x):
        assert abs(arr.mean()) < 0.15 and abs(arr.std() - 1.0) < 0.15
    print("mcmc traffic OK")


if __name__ == "__main__":
    main()

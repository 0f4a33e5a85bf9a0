"""Trend-cycle decomposition of a macroeconomic series
(reference notebooks/trend_cycle_demo.livemd — local-level and
unobserved-components models on FRED-style data).

Is the economy trending or cycling? The unobserved-components model
splits a series into a stochastic trend (random walk), a persistent
cycle (AR(2) with complex roots), and noise — with the split itself
uncertain:

    local level:   y_t = tau_t + eps_t,  tau ~ GRW(sigma_trend)
    trend+cycle:   y_t = tau_t + c_t + eps_t,
                   c_t = 2 rho cos(lambda) c_{t-1} - rho^2 c_{t-2} + nu_t

The AR(2) parameterization (rho, lambda) makes the cycle's damping and
period directly interpretable: period = 2 pi / lambda quarters.

TPU-first: the trend is the library's vectorized GaussianRandomWalk
(one fused first-difference logpdf); the AR(2) cycle prior is a Custom
dist whose whole-path logpdf is two shifted slices — no scan, no
per-step graph nodes. WAIC compares the two structures.
"""

import os

import numpy as np

from exmc_tpu import Builder, dists, model_comparison, sample

SMOKE = os.environ.get("EXMC_EXAMPLES_SMOKE") == "1"

T = 60 if SMOKE else 160  # quarters (~40 years)


def generate(seed=19):
    """GDP-gap-shaped synthetic: slow trend + 8-year cycle + noise."""
    rng = np.random.default_rng(seed)
    trend = np.cumsum(rng.normal(0.08, 0.12, T)) + 100.0
    rho, lam = 0.95, 2 * np.pi / 32  # 32-quarter (8-year) cycle
    c = np.zeros(T)
    for t in range(2, T):
        c[t] = (2 * rho * np.cos(lam) * c[t - 1] - rho**2 * c[t - 2]
                + rng.normal(0, 0.35))
    y = trend + c + rng.normal(0, 0.25, T)
    return y.astype(np.float32), trend, c


def build_local_level(y):
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "sigma_trend", dists.HalfNormal, {"sigma": 2.0})
    ir = Builder.rv(ir, "sigma_obs", dists.HalfNormal, {"sigma": 2.0})
    ir = Builder.rv(ir, "trend0", dists.Normal, {"mu": 100.0, "sigma": 10.0})
    ir = Builder.rv(ir, "trend", dists.GaussianRandomWalk,
                    {"sigma": "sigma_trend"}, shape=(T,))
    ir = Builder.det(ir, "level", "add", ["trend", "trend0"])
    ir = Builder.rv(ir, "y", dists.Normal,
                    {"mu": "level", "sigma": "sigma_obs"}, shape=(T,))
    ir = Builder.obs(ir, "y_obs", "y", y)
    return ir


def build_trend_cycle(y):
    import jax.numpy as jnp

    def ar2_logpdf(c, params):
        """AR(2) cycle prior in (rho, lambda) form: whole-path logpdf as
        two shifted slices (innovations nu_t for t >= 2; c_0, c_1 get a
        diffuse stationary-ish N(0, sigma_c/ (1-rho^2)^0.5) start)."""
        rho, lam, sig = params["rho"], params["lam"], params["sigma_c"]
        phi1 = 2.0 * rho * jnp.cos(lam)
        phi2 = -(rho**2)
        nu = c[2:] - phi1 * c[1:-1] - phi2 * c[:-2]
        lp = jnp.sum(-0.5 * (nu / sig) ** 2 - jnp.log(sig))
        s0 = sig / jnp.sqrt(jnp.maximum(1.0 - rho**2, 1e-3))
        lp += jnp.sum(-0.5 * (c[:2] / s0) ** 2 - jnp.log(s0))
        return lp

    cycle_prior = dists.Custom(logpdf_fn=lambda c, p, data=None:
                               ar2_logpdf(c, p), support="real")

    ir = Builder.new_ir()
    ir = Builder.rv(ir, "sigma_trend", dists.HalfNormal, {"sigma": 0.5})
    ir = Builder.rv(ir, "sigma_obs", dists.HalfNormal, {"sigma": 2.0})
    ir = Builder.rv(ir, "sigma_c", dists.HalfNormal, {"sigma": 1.0})
    ir = Builder.rv(ir, "rho", dists.Beta, {"alpha": 9.0, "beta": 1.0})
    # lambda in (0.05, 0.8): cycle period ~8 to ~125 quarters
    ir = Builder.rv(ir, "lam", dists.Uniform, {"lower": 0.05, "upper": 0.8})
    ir = Builder.rv(ir, "trend0", dists.Normal, {"mu": 100.0, "sigma": 10.0})
    ir = Builder.rv(ir, "trend", dists.GaussianRandomWalk,
                    {"sigma": "sigma_trend"}, shape=(T,))
    ir = Builder.rv(ir, "cycle", cycle_prior,
                    {"rho": "rho", "lam": "lam", "sigma_c": "sigma_c"},
                    shape=(T,))
    ir = Builder.det(ir, "level",
                     lambda tr, t0, c: tr + t0 + c,
                     ["trend", "trend0", "cycle"])
    ir = Builder.rv(ir, "y", dists.Normal,
                    {"mu": "level", "sigma": "sigma_obs"}, shape=(T,))
    ir = Builder.obs(ir, "y_obs", "y", y)
    return ir


def main():
    y, true_trend, true_cycle = generate()

    chains = 4
    iters = (200, 200) if SMOKE else (1000, 1000)

    ir_ll = build_local_level(y)
    tr_ll, st_ll = sample(ir_ll, num_chains=chains, num_warmup=iters[0],
                          num_samples=iters[1], seed=0, target_accept=0.9)
    ir_tc = build_trend_cycle(y)
    tr_tc, st_tc = sample(ir_tc, num_chains=chains, num_warmup=iters[0],
                          num_samples=iters[1], seed=0, target_accept=0.9)

    lam = tr_tc["lam"].reshape(-1)
    period = 2 * np.pi / lam
    rho = tr_tc["rho"].reshape(-1)
    print(f"cycle period: {np.median(period):.0f} quarters "
          f"[{np.percentile(period, 10):.0f}, "
          f"{np.percentile(period, 90):.0f}] (true 32)")
    print(f"cycle damping rho: {rho.mean():.2f} (true 0.95)")

    # decomposition quality: posterior-mean cycle vs truth
    c_hat = tr_tc["cycle"].reshape(-1, T).mean(axis=0)
    corr = np.corrcoef(c_hat, true_cycle)[0, 1]
    print(f"posterior-mean cycle vs truth: corr = {corr:.2f}")

    w_ll = model_comparison.waic(ir_ll, tr_ll)
    w_tc = model_comparison.waic(ir_tc, tr_tc)
    print(f"\nWAIC local-level : {w_ll['waic']:.1f}")
    print(f"WAIC trend+cycle : {w_tc['waic']:.1f}"
          + ("  <- preferred" if w_tc["waic"] < w_ll["waic"] else ""))

    if not SMOKE:
        # the decomposition, not the WAIC ranking, is the test: a local
        # level with a loose sigma_trend prior can absorb the cycle into
        # the trend and fit competitively — but it cannot RECOVER the
        # cycle, and its period posterior does not exist at all
        assert corr > 0.5
        assert np.percentile(period, 10) < 32 < np.percentile(period, 90)
    print(f"divergences: ll={int(st_ll['divergences'].sum())} "
          f"tc={int(st_tc['divergences'].sum())}")


if __name__ == "__main__":
    main()

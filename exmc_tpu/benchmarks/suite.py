"""The seven-model benchmark suite (reference STANDARD_BENCHMARKS.md).

Model definitions follow the reference's specs (STANDARD_BENCHMARKS.md
§II and §V-VI; simple/medium/stress are its homegrown hierarchical
trio). Where the reference leaned on the Custom-dist escape hatch (it
carried funnel/logistic/SV — STANDARD_BENCHMARKS.md:89), the TPU build
expresses every model natively in the IR:

* funnel   — x ~ Normal(0, exp(y/2)) via a det node (no Custom);
* logistic — Bernoulli(p) with p = sigmoid(alpha + X @ beta) as det
  nodes, whole-likelihood vectorized, design matrix as data;
* sv       — the vectorized GaussianRandomWalk dist over the 100-step
  latent path (the reference built 100 scalar RVs with string refs and
  called that model its "natural limit" — the vectorized logpdf is the
  TPU answer).

Reference baselines to beat (ESS/s, 1000+1000, 5-seed medians,
88-thread Xeon — BASELINE.md):
    simple 454/560, medium 270/163, stress 217/174,
    eight_schools 12/5, funnel 2/6, logistic 69/336, sv 1.2/1.0
    (eXMC/PyMC).
"""

import time

import numpy as np

from exmc_tpu import dists
from exmc_tpu.ir import Builder


def simple_model():
    """simple (d=2): location+scale on 10 obs (reference quickstart shape)."""
    ys = np.array([2.1, 1.8, 2.5, 2.0, 1.9, 2.3, 2.2, 1.7, 2.4, 2.6])
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "mu", dists.Normal, {"mu": 0.0, "sigma": 5.0})
    ir = Builder.rv(ir, "sigma", dists.HalfNormal, {"sigma": 2.0})
    ir = Builder.rv(ir, "y", dists.Normal, {"mu": "mu", "sigma": "sigma"})
    ir = Builder.obs(ir, "y_obs", "y", ys)
    return ir


def _grouped_hierarchical(n_groups, seed=7):
    """mu, tau, theta_g (g groups), sigma -> d = 3 + n_groups free params.
    medium = 2 groups (d=5), stress = 5 groups (d=8)
    (reference's 'five-parameter hierarchical structure with two
    observation groups', STANDARD_BENCHMARKS.md §I)."""
    rng = np.random.default_rng(seed)
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "mu", dists.Normal, {"mu": 0.0, "sigma": 5.0})
    ir = Builder.rv(ir, "tau", dists.HalfNormal, {"sigma": 2.0})
    ir = Builder.rv(ir, "sigma", dists.HalfNormal, {"sigma": 1.0})
    true_theta = rng.normal(1.0, 1.5, size=n_groups)
    for g in range(n_groups):
        ys = rng.normal(true_theta[g], 0.8, size=20)
        ir = Builder.rv(ir, f"theta_{g}", dists.Normal,
                        {"mu": "mu", "sigma": "tau"})
        ir = Builder.rv(ir, f"y_{g}", dists.Normal,
                        {"mu": f"theta_{g}", "sigma": "sigma"})
        ir = Builder.obs(ir, f"y_{g}_obs", f"y_{g}", ys)
    return ir


def medium_model():
    return _grouped_hierarchical(2)


def stress_model():
    return _grouped_hierarchical(5)


def eight_schools_model():
    """Rubin 1981, run CENTERED deliberately — 'the harder test'
    (STANDARD_BENCHMARKS.md §II). Pass ncp=True at compile/sample time
    for the non-centered variant."""
    y = [28.0, 8.0, -3.0, 7.0, -1.0, 1.0, 18.0, 12.0]
    sig = [15.0, 10.0, 16.0, 11.0, 9.0, 11.0, 10.0, 18.0]
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "mu", dists.Normal, {"mu": 0.0, "sigma": 5.0})
    ir = Builder.rv(ir, "tau", dists.HalfNormal, {"sigma": 5.0})
    for i in range(8):
        ir = Builder.rv(ir, f"theta_{i}", dists.Normal,
                        {"mu": "mu", "sigma": "tau"})
        ir = Builder.rv(ir, f"y_{i}", dists.Normal,
                        {"mu": f"theta_{i}", "sigma": sig[i]})
        ir = Builder.obs(ir, f"y_{i}_obs", f"y_{i}", y[i])
    return ir


def funnel_model():
    """Neal 2003 (d=10): y ~ N(0,3); x_i ~ N(0, exp(y/2)), i=1..9.
    No observations — the joint prior IS the target."""
    ir = Builder.new_ir()
    ir = Builder.rv(ir, "y", dists.Normal, {"mu": 0.0, "sigma": 3.0})
    ir = Builder.det(ir, "y_half", "mul", ["y", 0.5])
    ir = Builder.det(ir, "scale", "exp", ["y_half"])
    ir = Builder.rv(ir, "x", dists.Normal, {"mu": 0.0, "sigma": "scale"},
                    shape=(9,))
    return ir


def logistic_model(n=500, p=20, seed=11):
    """Logistic regression (d=21): alpha, beta_j ~ N(0,10);
    y ~ Bernoulli(sigmoid(alpha + X beta)), n=500 — all native det
    nodes, likelihood vectorized over the full design matrix."""
    rng = np.random.default_rng(seed)
    x_mat = rng.normal(size=(n, p)).astype(np.float32)
    true_beta = rng.normal(0, 0.5, size=p)
    logits = 0.5 + x_mat @ true_beta
    y = (rng.random(n) < 1.0 / (1.0 + np.exp(-logits))).astype(np.float32)

    ir = Builder.new_ir()
    ir = Builder.rv(ir, "alpha", dists.Normal, {"mu": 0.0, "sigma": 10.0})
    ir = Builder.rv(ir, "beta", dists.Normal, {"mu": 0.0, "sigma": 10.0},
                    shape=(p,))
    ir = Builder.det(ir, "xb", "matmul", [x_mat, "beta"])
    ir = Builder.det(ir, "eta", "add", ["xb", "alpha"])
    # stable logits parameterization (no sigmoid->log round trip in f32)
    ir = Builder.rv(ir, "y", dists.Bernoulli, {"logits": "eta"}, shape=(n,))
    ir = Builder.obs(ir, "y_obs", "y", y)
    return ir


def sv_model(t=100, seed=13):
    """Stochastic volatility (d=t+2): sigma ~ Exp(50); nu ~ Exp(0.1);
    s ~ GaussianRandomWalk(sigma) over T; r_i ~ StudentT(nu, 0,
    exp(s_i)) observed. Uses the VECTORIZED GaussianRandomWalk dist —
    one fused logpdf for the whole path.

    The per-step innovation scales as sqrt(100/t) so the TOTAL path
    variance matches the reference's T=100 setting at every T: a pure
    random walk at sigma=0.15 reaches exp(+-17) volatility by T=5000,
    which creates a degenerate "all observations are StudentT outliers"
    local mode (sigma->0, nu->0.1) that traps badly-initialized chains —
    an artifact of the synthetic generator, not a property of real
    log-volatility paths (which mean-revert)."""
    rng = np.random.default_rng(seed)
    true_sigma = 0.15 * float(np.sqrt(100.0 / t))
    s_true = np.cumsum(rng.normal(0, true_sigma, size=t))
    r = (rng.standard_t(10, size=t) * np.exp(s_true)).astype(np.float32)

    ir = Builder.new_ir()
    ir = Builder.rv(ir, "sigma", dists.Exponential, {"lambda": 50.0})
    ir = Builder.rv(ir, "nu", dists.Exponential, {"lambda": 0.1})
    ir = Builder.rv(ir, "s", dists.GaussianRandomWalk, {"sigma": "sigma"},
                    shape=(t,))
    ir = Builder.det(ir, "vol", "exp", ["s"])
    ir = Builder.rv(ir, "r", dists.StudentT,
                    {"df": "nu", "loc": 0.0, "scale": "vol"}, shape=(t,))
    ir = Builder.obs(ir, "r_obs", "r", r)
    return ir


MODELS = {
    "simple": simple_model,
    "medium": medium_model,
    "stress": stress_model,
    "eight_schools": eight_schools_model,
    "funnel": funnel_model,
    "logistic": logistic_model,
    "sv": sv_model,
}

# reference ESS/s baselines (BASELINE.md): (eXMC, PyMC)
REFERENCE_ESS_PER_S = {
    "simple": (454.0, 560.0),
    "medium": (270.0, 163.0),
    "stress": (217.0, 174.0),
    "eight_schools": (12.0, 5.0),
    "funnel": (2.0, 6.0),
    "logistic": (69.0, 336.0),
    "sv": (1.2, 1.0),
}


def build_model(name):
    return MODELS[name]()


def run_model(name, num_chains=64, num_warmup=1000, num_samples=1000,
              seed=0, ncp=False, chunked=None, seeds=1, **opts):
    """Run one suite model; returns a result dict with min/median ESS/s
    across parameters (protocol: STANDARD_BENCHMARKS.md:105, adapted to
    vmapped chains — wall excludes compile, reported separately).

    ``seeds``: number of independent timed runs; reported metrics are
    per-seed MEDIANS, matching the reference's 5-seed race protocol
    (STANDARD_BENCHMARKS.md:105; VERDICT r1 weak-item 4 — round 1
    reported single-seed rows).

    ``chunked``: run in bounded device calls of this many iterations —
    needed for pathological models (funnel) where vmap-lockstep trees at
    max depth make one 2000-iteration call exceed runtime watchdogs."""
    from exmc_tpu.diagnostics import ess, rhat
    from exmc_tpu.nuts.sampler import _make_sampler

    ir = build_model(name)
    sampler = _make_sampler(ir, ncp=ncp, num_warmup=num_warmup,
                            num_samples=num_samples, **opts)

    def go(seed):
        if chunked:
            return sampler.run_chunked(num_chains=num_chains, seed=seed,
                                       chunk_iters=chunked)
        return sampler.run(num_chains=num_chains, seed=seed)

    t0 = time.time()
    go(seed)
    compile_s = time.time() - t0

    per_seed = []
    for k in range(seeds):
        t0 = time.time()
        trace, stats = go(seed + 1 + k)
        wall = time.time() - t0

        ess_vals, rhat_vals = {}, {}
        for key0, arr in trace.items():
            flat = arr.reshape(arr.shape[0], arr.shape[1], -1)
            for i in range(flat.shape[-1]):
                key = key0 if flat.shape[-1] == 1 else f"{key0}[{i}]"
                ess_vals[key] = float(ess(flat[:, :, i]))
                rhat_vals[key] = float(rhat(flat[:, :, i]))
        min_ess = min(ess_vals.values())
        per_seed.append({
            "wall_s": wall,
            "min_ess": min_ess,
            "min_ess_per_s": min_ess / wall,
            "median_ess": float(np.median(list(ess_vals.values()))),
            "max_rhat": max(rhat_vals.values()),
            "divergence_rate": float(stats["divergences"].sum())
            / (num_chains * num_samples),
        })

    med = {k: float(np.median([r[k] for r in per_seed])) for k in per_seed[0]}
    ref_exmc, ref_pymc = REFERENCE_ESS_PER_S[name]
    return {
        "model": name,
        "num_chains": num_chains,
        "n_seeds": seeds,
        "compile_s": compile_s,
        **med,
        "vs_exmc": med["min_ess_per_s"] / ref_exmc,
        "vs_pymc": med["min_ess_per_s"] / ref_pymc,
        "per_seed": per_seed,
    }


def run_suite(models=None, **kwargs):
    out = {}
    for name in models or MODELS:
        out[name] = run_model(name, **kwargs)
    return out

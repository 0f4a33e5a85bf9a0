"""Round-2 Stan frontend extensions (VERDICT r1 task 5, exceeding the
reference's stated limits, stan.ex:31-36): target +=, for loops,
transformed data/parameters, matrix data, indexing, _lpdf calls."""

import numpy as np
import pytest

from exmc_tpu import compile_logp, stan
from exmc_tpu.stan.lexer import StanSyntaxError
from exmc_tpu.stan.parser import parse


def _lp(ir, q):
    import jax.numpy as jnp

    m = compile_logp(ir, ncp=False)
    return float(m.logp(jnp.asarray(q, jnp.float32))), m


# ---- parsing ----

def test_parse_target_and_for_and_transformed():
    ast = parse("""
    data { int N; vector[N] y; }
    transformed data { real ybar = mean(y); }
    parameters { real mu; }
    transformed parameters { real shifted = mu + 1; }
    model {
      mu ~ normal(0, 1);
      target += normal_lpdf(y | mu, 1);
      for (i in 1:N) y[i] ~ normal(mu, 2);
    }
    """)
    assert ast["transformed_data"][0]["name"] == "ybar"
    assert ast["transformed_parameters"][0]["name"] == "shifted"
    kinds = [s["kind"] for s in ast["model"]]
    assert kinds == ["sampling", "target", "for"]
    tgt = ast["model"][1]["expr"]
    assert tgt[0] == "lpdf" and tgt[1] == "normal"


# ---- target += ----

def test_target_increment_matches_tilde():
    """'target += normal_lpdf(y | mu, s)' must produce the same logp as
    'y ~ normal(mu, s)' up to Jacobian-free constant terms."""
    ys = np.array([1.0, 2.0, 3.0], np.float32)
    code_tilde = """
    data { vector[3] y; }
    parameters { real mu; }
    model { mu ~ normal(0, 10); y ~ normal(mu, 1); }
    """
    code_target = """
    data { vector[3] y; }
    parameters { real mu; }
    model { mu ~ normal(0, 10); target += normal_lpdf(y | mu, 1); }
    """
    lp1, _ = _lp(stan.compile(code_tilde, {"y": ys}), [0.7])
    lp2, _ = _lp(stan.compile(code_target, {"y": ys}), [0.7])
    assert abs(lp1 - lp2) < 1e-4


def test_target_arbitrary_expression():
    """target += with plain arithmetic: logp shifts by exactly expr."""
    code = """
    parameters { real mu; }
    model { mu ~ normal(0, 1); target += 2 * mu; }
    """
    code_plain = """
    parameters { real mu; }
    model { mu ~ normal(0, 1); }
    """
    lp, _ = _lp(stan.compile(code), [0.3])
    lp0, _ = _lp(stan.compile(code_plain), [0.3])
    assert abs((lp - lp0) - 2 * 0.3) < 1e-5


# ---- transformed parameters: eight-schools NCP in real Stan ----

EIGHT_SCHOOLS_NCP = """
data { int J; vector[J] y; vector[J] sigma; }
parameters { real mu; real<lower=0> tau; vector[J] theta_raw; }
transformed parameters { vector[J] theta = mu + tau * theta_raw; }
model {
  mu ~ normal(0, 5);
  tau ~ half_cauchy(5);
  theta_raw ~ normal(0, 1);
  y ~ normal(theta, sigma);
}
"""

ES_DATA = {
    "J": 8,
    "y": np.array([28.0, 8.0, -3.0, 7.0, -1.0, 1.0, 18.0, 12.0]),
    "sigma": np.array([15.0, 10.0, 16.0, 11.0, 9.0, 11.0, 10.0, 18.0]),
}


def test_eight_schools_ncp_real_stan_syntax():
    trace, stats = stan.sample(
        EIGHT_SCHOOLS_NCP, ES_DATA, ncp=False,
        num_warmup=800, num_samples=800, num_chains=4, seed=0,
    )
    mu = float(np.mean(trace["mu"]))
    tau = float(np.mean(trace["tau"]))
    # published posterior moments (as in the gold-standard battery)
    assert abs(mu - 4.4) < 0.5 * 3.3
    assert abs(tau - 3.6) < 0.5 * 3.2


# ---- for loops (vectorized lowering) ----

def test_for_loop_equals_vector_statement():
    ys = np.array([0.5, 1.5, 2.5, 3.5], np.float32)
    code_loop = """
    data { int N; vector[N] y; }
    parameters { real mu; }
    model {
      mu ~ normal(0, 5);
      for (i in 1:N) y[i] ~ normal(mu, 1);
    }
    """
    code_vec = """
    data { int N; vector[N] y; }
    parameters { real mu; }
    model { mu ~ normal(0, 5); y ~ normal(mu, 1); }
    """
    d = {"N": 4, "y": ys}
    lp1, _ = _lp(stan.compile(code_loop, d), [1.1])
    lp2, _ = _lp(stan.compile(code_vec, d), [1.1])
    assert abs(lp1 - lp2) < 1e-5


def test_for_loop_indexed_args():
    """Indexing both target and args by the loop var vectorizes."""
    ys = np.array([1.0, 2.0], np.float32)
    sig = np.array([0.5, 2.0], np.float32)
    code = """
    data { vector[2] y; vector[2] s; }
    parameters { real mu; }
    model {
      mu ~ normal(0, 10);
      for (j in 1:2) y[j] ~ normal(mu, s[j]);
    }
    """
    lp, _ = _lp(stan.compile(code, {"y": ys, "s": sig}), [0.4])
    import math

    def nlp(y, m, s):
        return -0.5 * ((y - m) / s) ** 2 - math.log(s) - 0.5 * math.log(2 * math.pi)

    want = nlp(0.4, 0, 10) + nlp(1.0, 0.4, 0.5) + nlp(2.0, 0.4, 2.0)
    assert abs(lp - want) < 1e-4


def test_for_loop_partial_range_rejected():
    code = """
    data { vector[4] y; }
    parameters { real mu; }
    model { mu ~ normal(0, 1); for (i in 1:3) y[i] ~ normal(mu, 1); }
    """
    with pytest.raises(StanSyntaxError, match="does not cover"):
        stan.compile(code, {"y": np.zeros(4)})


# ---- matrix data + logistic regression (the d=21-style model) ----

def test_matrix_logistic_regression_samples():
    rng = np.random.default_rng(0)
    n, k = 80, 4
    x = rng.normal(size=(n, k)).astype(np.float32)
    beta_true = np.array([1.0, -0.5, 0.25, 0.0], np.float32)
    p = 1.0 / (1.0 + np.exp(-(x @ beta_true)))
    y = (rng.random(n) < p).astype(np.float32)
    code = """
    data { int N; int K; matrix[N, K] X; vector[N] y; }
    parameters { vector[K] beta; }
    model {
      beta ~ normal(0, 2.5);
      y ~ bernoulli(sigmoid(X * beta));
    }
    """
    trace, stats = stan.sample(
        code, {"N": n, "K": k, "X": x, "y": y},
        num_warmup=500, num_samples=500, num_chains=2, seed=0,
    )
    b = trace["beta"].reshape(-1, k).mean(axis=0)
    assert b[0] > 0.4 and b[1] < -0.1
    assert stats["divergences"].sum() == 0


def test_transformed_data_eager():
    code = """
    data { vector[3] y; }
    transformed data { real ybar = mean(y); real c = 2 * ybar; }
    parameters { real mu; }
    model { mu ~ normal(c, 1); y ~ normal(mu, 1); }
    """
    ir = stan.compile(code, {"y": np.array([1.0, 2.0, 3.0])})
    # prior mean folded to 2*mean(y) = 4
    assert float(ir.nodes["mu"].op[2]["mu"]) == 4.0


def test_loop_var_bare_use_rejected():
    code = """
    data { vector[2] y; }
    parameters { real mu; }
    model { mu ~ normal(0,1); for (i in 1:2) y[i] ~ normal(mu, i); }
    """
    with pytest.raises(StanSyntaxError, match="loop variable"):
        stan.compile(code, {"y": np.zeros(2)})


# ---- round-3: matrix parameters + data-referencing bounds ----

def test_matrix_parameter_elementwise_prior():
    code = """
    data { int N; int K; }
    parameters { matrix[N, K] B; }
    model { B ~ normal(0, 1); }
    """
    ir = stan.compile(code, {"N": 3, "K": 2})
    assert ir.nodes["B"].shape == (3, 2)
    # 6 unconstrained dims; logp at zeros = 6 * logpdf_N(0|0,1)
    lp, m = _lp(ir, np.zeros(6))
    assert m.pm.size == 6
    expected = 6 * (-0.5 * np.log(2 * np.pi))
    assert abs(lp - expected) < 1e-4


def test_matrix_parameter_sampling_end_to_end():
    code = """
    data { int N; int K; }
    parameters { matrix[N, K] B; }
    model { B ~ normal(3, 0.5); }
    """
    trace, stats = stan.sample(
        code, {"N": 2, "K": 2},
        num_warmup=300, num_samples=300, num_chains=2, seed=0,
    )
    assert trace["B"].shape[-2:] == (2, 2)
    assert abs(float(np.mean(trace["B"])) - 3.0) < 0.2


def test_data_referencing_lower_bound():
    code = """
    data { real y0; vector[4] y; }
    parameters { real<lower=y0> mu; }
    model { mu ~ normal(0, 10); y ~ normal(mu, 1); }
    """
    data = {"y0": 5.0, "y": np.array([6.0, 7.0, 6.5, 7.5])}
    trace, _ = stan.sample(code, data, num_warmup=300, num_samples=300,
                           num_chains=2, seed=1)
    mu = np.asarray(trace["mu"])
    assert float(mu.min()) > 5.0           # constraint respected
    assert abs(float(mu.mean()) - 6.75) < 0.5


def test_upper_bound_transform():
    code = """
    data { vector[4] y; }
    parameters { real<upper=2> mu; }
    model { mu ~ normal(0, 10); y ~ normal(mu, 1); }
    """
    trace, _ = stan.sample(code, {"y": np.zeros(4)}, num_warmup=300,
                           num_samples=300, num_chains=2, seed=2)
    assert float(np.asarray(trace["mu"]).max()) < 2.0


def test_nonscalar_bound_rejected():
    code = """
    data { vector[4] y; }
    parameters { real<lower=y> mu; }
    model { mu ~ normal(0, 10); y ~ normal(mu, 1); }
    """
    with pytest.raises(StanSyntaxError, match="scalar data"):
        stan.compile(code, {"y": np.zeros(4)})


def test_unknown_bound_name_rejected():
    code = """
    data { real y; }
    parameters { real<lower=zmin> mu; }
    model { mu ~ normal(0, 1); y ~ normal(mu, 1); }
    """
    with pytest.raises(StanSyntaxError, match="not in the data"):
        stan.compile(code, {"y": 0.0})


# ---- round-3: functions block (inlined expression functions) ----

def test_functions_block_inlines_and_samples():
    code = """
    functions {
      real decline(real qi, real di, real t) { return qi / (1 + di * t); }
      real sq(real x) { return x * x; }
    }
    data { vector[6] t; vector[6] y; }
    parameters { real<lower=0> qi; real<lower=0> di; real<lower=0> s; }
    model {
      qi ~ lognormal(1, 1);
      di ~ lognormal(-2, 1);
      s ~ half_normal(1);
      y ~ normal(decline(qi, di, t), sq(s));
    }
    """
    t = np.arange(1.0, 7.0, dtype=np.float32)
    true_q = 5.0 / (1.0 + 0.2 * t)
    y = (true_q + 0.05 * np.array([0.3, -0.5, 0.1, 0.4, -0.2, 0.0])
         ).astype(np.float32)
    trace, stats = stan.sample(code, {"t": t, "y": y}, num_warmup=400,
                               num_samples=400, num_chains=2, seed=0)
    assert abs(float(trace["qi"].mean()) - 5.0) < 1.0
    assert abs(float(trace["di"].mean()) - 0.2) < 0.15


def test_functions_nested_and_in_target():
    code = """
    functions {
      real half(real x) { return x / 2; }
      real quarter(real x) { return half(half(x)); }
    }
    parameters { real mu; }
    model { mu ~ normal(0, 1); target += quarter(mu); }
    """
    ir = stan.compile(code, {})
    lp0, m = _lp(ir, np.zeros(1))
    lp1 = float(m.logp(__import__("jax.numpy", fromlist=["x"]).asarray([2.0], np.float32)))
    # logp(2) - logp(0) = N(2)-N(0) + 2/4
    expected_delta = (-0.5 * 4.0) + 0.5
    assert abs((lp1 - lp0) - expected_delta) < 1e-4


def test_recursive_function_rejected():
    code = """
    functions { real f(real x) { return f(x) + 1; } }
    parameters { real mu; }
    model { mu ~ normal(f(1), 1); }
    """
    with pytest.raises(StanSyntaxError, match="recursive"):
        stan.compile(code, {})


def test_function_arity_checked():
    code = """
    functions { real f(real a, real b) { return a + b; } }
    parameters { real mu; }
    model { mu ~ normal(f(1), 1); }
    """
    with pytest.raises(StanSyntaxError, match="expects 2 arguments"):
        stan.compile(code, {})


def test_function_local_variables():
    """Round-4: 'type name = expr;' locals before the return, in
    dependency order, sized or not — macro-expanded into the call."""
    code = """
    functions {
      real steps(real x) {
        real y = x * 2;
        real z = y + 1;
        return z * y;
      }
    }
    parameters { real mu; }
    model { mu ~ normal(0, 1); target += steps(mu); }
    """
    ir = stan.compile(code, {})
    lp0, m = _lp(ir, np.zeros(1))
    import jax.numpy as jnp
    lp1 = float(m.logp(jnp.asarray([3.0], np.float32)))
    # steps(3) - steps(0) = (7*6) - (1*0) = 42; N(3)-N(0) = -4.5
    assert abs((lp1 - lp0) - (42.0 - 4.5)) < 1e-3


def test_function_local_vector_and_sampling():
    code = """
    functions {
      real softabs_mean(vector x) {
        vector[6] a = x * x;
        real m = sum(a) / 6;
        return m;
      }
    }
    data { vector[6] y; }
    parameters { real mu; }
    model { mu ~ normal(0, 1); y ~ normal(softabs_mean(y) * 0 + mu, 1); }
    """
    y = np.array([1.0, 2.0, 1.5, 0.5, 1.2, 1.8], np.float32)
    trace, _ = stan.sample(code, {"y": y}, num_warmup=300,
                           num_samples=300, num_chains=2, seed=0)
    assert abs(float(trace["mu"].mean()) - float(y.mean()) * 6 / 7) < 0.4


def test_function_statements_still_rejected():
    # assignment after declaration is a statement, not a local decl
    with pytest.raises(StanSyntaxError, match="locals"):
        stan.compile("""
        functions { real f(real x) { real y = x; y = y + 1; return y; } }
        parameters { real mu; }
        model { mu ~ normal(f(mu), 1); }
        """, {})
    # duplicate local/param names rejected
    with pytest.raises(StanSyntaxError, match="duplicate local"):
        stan.compile("""
        functions { real f(real x) { real x = 2; return x; } }
        parameters { real mu; }
        model { mu ~ normal(f(mu), 1); }
        """, {})


def test_function_hygiene_rejections():
    """Code-review r2: free names, builtin shadowing, duplicate params,
    nullary calls."""
    # free name in body -> compile error, not silent call-site capture
    with pytest.raises(StanSyntaxError, match="undeclared name"):
        stan.compile("""
        functions { real f(real x) { return x * sigma; } }
        parameters { real mu; real<lower=0> sigma; }
        model { sigma ~ half_normal(1); mu ~ normal(f(2), 1); }
        """, {})
    # builtin shadowing rejected
    with pytest.raises(StanSyntaxError, match="shadows a built-in"):
        stan.compile("""
        functions { real log(real x) { return x; } }
        parameters { real mu; }
        model { mu ~ normal(0, 1); }
        """, {})
    # duplicate parameter names rejected
    with pytest.raises(StanSyntaxError, match="duplicate parameter"):
        stan.compile("""
        functions { real f(real x, real x) { return x; } }
        parameters { real mu; }
        model { mu ~ normal(f(1, 2), 1); }
        """, {})
    # nullary functions are callable
    ir = stan.compile("""
    functions { real c() { return 2.5; } }
    parameters { real mu; }
    model { mu ~ normal(c(), 1); }
    """, {})
    assert float(ir.nodes["mu"].op[2]["mu"]) == 2.5


# ---- <offset=, multiplier=> affine parameters (Stan manual §25.7) ----

EIGHT_SCHOOLS_AFFINE = """
data { int J; vector[J] y; vector[J] sigma; }
parameters {
  real mu;
  real<lower=0> tau;
  vector<offset=mu, multiplier=tau>[J] theta;
}
model {
  mu ~ normal(0, 5);
  tau ~ half_cauchy(5);
  theta ~ normal(mu, tau);
  y ~ normal(theta, sigma);
}
"""


def test_affine_param_matches_manual_ncp_logp():
    """theta<offset=mu, multiplier=tau> ~ normal(mu, tau): the affine
    Jacobian (+J log tau) cancels the lpdf's scale terms, leaving a
    standard normal on z — the SAME unconstrained density as the manual
    transformed-parameters NCP (which uses theta_raw ~ normal(0,1)).
    Both models share the point-map layout {mu, tau, theta*}, so their
    compiled logps must agree pointwise INCLUDING constants."""
    ir_aff = stan.compile(EIGHT_SCHOOLS_AFFINE, ES_DATA)
    ir_ncp = stan.compile(EIGHT_SCHOOLS_NCP, ES_DATA)
    rng = np.random.default_rng(0)
    for _ in range(5):
        q = rng.normal(size=10).astype(np.float32)
        lp_a, _ = _lp(ir_aff, q)
        lp_n, _ = _lp(ir_ncp, q)
        assert abs(lp_a - lp_n) < 1e-3, (lp_a, lp_n)


def test_affine_param_constant_offset_multiplier():
    """Constant o/m: z-space density is normal_lpdf(o + m*z | mu0, s0)
    + log m, checked against the closed form."""
    code = """
    parameters { real<offset=10, multiplier=2> x; }
    model { x ~ normal(10, 2); }
    """
    ir = stan.compile(code, {})
    z = 0.7
    lp, _ = _lp(ir, [z])
    expect = (-0.5 * z * z - np.log(2.0) - 0.5 * np.log(2 * np.pi)
              + np.log(2.0))
    assert abs(lp - expect) < 1e-5


def test_affine_param_trace_is_constrained_and_samples():
    """End-to-end: the trace reports theta on the CONSTRAINED scale
    (reconstructed o + m*z), and the posterior matches the NCP
    reference moments."""
    trace, stats = stan.sample(
        EIGHT_SCHOOLS_AFFINE, ES_DATA, ncp=False,
        num_warmup=800, num_samples=800, num_chains=4, seed=0,
    )
    mu = float(np.mean(trace["mu"]))
    tau = float(np.mean(trace["tau"]))
    assert abs(mu - 4.4) < 0.5 * 3.3
    assert abs(tau - 3.6) < 0.5 * 3.2
    # theta must be on the constrained scale: school means pull toward
    # mu (~4.4), not standard-normal z around 0 with unit spread
    th = np.asarray(trace["theta"])
    assert th.shape[-1] == 8
    assert 2.0 < float(th.mean()) < 8.0


def test_affine_constraint_position_both_orders():
    """Stan's constraint-before-bracket and the legacy after-bracket
    position parse to the same decl."""
    a = parse("parameters { vector<lower=0>[3] s; } model { }")
    b = parse("parameters { vector[3]<lower=0> s; } model { }")
    da, db = a["parameters"][0], b["parameters"][0]
    assert da["lower"] == db["lower"] == 0.0
    assert da["size"] == db["size"] == 3


def test_affine_rejects_bounds_combination():
    code = """
    parameters { real<lower=0, multiplier=2> x; }
    model { x ~ normal(0, 2); }
    """
    with pytest.raises(StanSyntaxError, match="offset/multiplier"):
        stan.compile(code, {})


def test_affine_unknown_ref_rejected():
    code = """
    parameters { real<offset=nope> x; }
    model { x ~ normal(0, 1); }
    """
    with pytest.raises(StanSyntaxError, match="neither data nor"):
        stan.compile(code, {})


def test_stan_binomial_and_negbin_likelihoods():
    """Round-3 dist-map additions: binomial(n, p) recovers the exact
    Beta posterior; neg_binomial_2(mu, phi) is the mu/alpha NB."""
    import numpy as np

    from exmc_tpu import stan

    code = """
    data { int N; vector[N] y; vector[N] n; }
    parameters { real<lower=0, upper=1> p; }
    model {
      p ~ beta(2, 2);
      y ~ binomial(n, p);
    }
    """
    rng = np.random.default_rng(0)
    ys = rng.binomial(20, 0.35, size=30).astype(float)
    trace, _ = stan.sample(
        code, {"N": 30, "y": ys, "n": np.full(30, 20.0)},
        num_warmup=300, num_samples=400, num_chains=2, seed=0)
    a, b = 2 + ys.sum(), 2 + 600 - ys.sum()
    assert abs(trace["p"].mean() - a / (a + b)) < 0.015

    code2 = """
    data { int N; vector[N] y; }
    parameters { real<lower=0> mu; real<lower=0> phi; }
    model {
      mu ~ gamma(2, 0.5);
      phi ~ gamma(2, 0.5);
      y ~ neg_binomial_2(mu, phi);
    }
    """
    ys2 = rng.poisson(rng.gamma(3.0, 4.0 / 3.0, size=50)).astype(float)
    trace2, _ = stan.sample(code2, {"N": 50, "y": ys2},
                            num_warmup=300, num_samples=400, num_chains=2,
                            seed=0)
    assert abs(trace2["mu"].mean() - ys2.mean()) < 1.0


def test_generated_quantities():
    """Round-4 extension: ``generated quantities`` evaluated per
    posterior draw after sampling (deterministic rows, *_rng draws with
    independent elements at the declared size, reductions, indexing,
    and rows referencing earlier rows)."""
    import numpy as np

    from exmc_tpu import stan

    code = """
    data { int N; vector[N] y; }
    parameters { real mu; real<lower=0> sigma; }
    model { mu ~ normal(0, 10); sigma ~ half_normal(2); y ~ normal(mu, sigma); }
    generated quantities {
      real mu2 = mu * 2;
      vector[4] y_rep = normal_rng(mu, sigma);
      real y_rep_mean = mean(y_rep);
      real first_y = y[1];
      real chained = mu2 + y_rep_mean;
    }
    """
    y = np.array([2.1, 1.8, 2.5, 2.0, 1.9, 2.3], np.float32)
    trace, _ = stan.sample(code, {"N": 6, "y": y}, num_chains=2,
                           num_warmup=200, num_samples=300, seed=0)
    assert trace["mu2"].shape == (2, 300)
    assert np.allclose(trace["mu2"], 2 * trace["mu"])
    assert trace["y_rep"].shape == (2, 300, 4)
    # independent element draws, not one draw replicated
    assert float(np.std(trace["y_rep"], axis=-1).mean()) > 0.01
    assert np.allclose(trace["y_rep_mean"], trace["y_rep"].mean(-1))
    assert np.allclose(trace["first_y"], y[0])
    assert np.allclose(trace["chained"],
                       trace["mu2"] + trace["y_rep_mean"])
    # posterior predictive draws center on the posterior mean
    assert abs(float(trace["y_rep"].mean() - trace["mu"].mean())) < 0.06


def test_generated_quantities_errors():
    import numpy as np
    import pytest

    from exmc_tpu import stan
    from exmc_tpu.stan import StanSyntaxError

    base = """
    data { real y; }
    parameters { real mu; }
    model { mu ~ normal(0, 10); y ~ normal(mu, 1); }
    generated quantities { %s }
    """
    with pytest.raises(StanSyntaxError, match="unknown function"):
        stan.sample(base % "real a = frobnicate(mu);", {"y": 1.0},
                    num_warmup=10, num_samples=10)
    with pytest.raises(StanSyntaxError, match="shadows"):
        stan.sample(base % "real mu = mu * 2;", {"y": 1.0},
                    num_warmup=10, num_samples=10)


def test_generated_quantities_size_equals_draws():
    """code-review r4 finding 4: a declared GQ vector size equal to
    num_samples must still produce INDEPENDENT element draws (the old
    trailing-dim heuristic matched the draws axis and replicated one
    draw per element)."""
    import numpy as np

    from exmc_tpu import stan

    code = """
    data { real y; }
    parameters { real mu; }
    model { mu ~ normal(0, 10); y ~ normal(mu, 1); }
    generated quantities { vector[5] y_rep = normal_rng(mu, 1); }
    """
    trace, _ = stan.sample(code, {"y": 1.0}, num_chains=1,
                           num_warmup=100, num_samples=5, seed=0)
    y_rep = np.asarray(trace["y_rep"])
    assert y_rep.shape == (1, 5, 5)
    # independent per element: within-draw spread strictly positive
    assert float(np.std(y_rep, axis=-1).min()) > 1e-6


def test_array_declaration_syntax():
    """Modern Stan (2.26+) array[N] int/real declarations parse and
    sample; multi-dim arrays and non-scalar elements are rejected
    with clear errors."""
    import numpy as np
    from exmc_tpu import stan
    from exmc_tpu.stan.lexer import StanSyntaxError

    code = """
    data { int N; array[N] int y; array[N] real x; }
    parameters { real beta; }
    model {
      beta ~ normal(0, 2);
      y ~ bernoulli(sigmoid(beta * x));
    }
    """
    rng = np.random.default_rng(0)
    n = 120
    x = rng.normal(size=n)
    y = (rng.uniform(size=n) < 1 / (1 + np.exp(-1.5 * x))).astype(int)
    trace, stats = stan.sample(code, data={"N": n, "y": y, "x": x},
                               num_chains=2, num_warmup=300,
                               num_samples=300, seed=0)
    assert stats["divergences"].sum() == 0
    assert 0.8 < trace["beta"].mean() < 2.3

    # constraints compose: array[N] real<lower=0> as a parameter
    code2 = """
    data { int N; array[N] real y; }
    parameters { array[N] real<lower=0> lam; }
    model {
      lam ~ exponential(1);
      y ~ normal(lam, 1);
    }
    """
    ys = np.abs(rng.normal(1.0, 0.5, 8))
    trace2, _ = stan.sample(code2, data={"N": 8, "y": ys}, num_chains=2,
                            num_warmup=200, num_samples=200, seed=0)
    assert np.all(np.asarray(trace2["lam"]) > 0)

    import pytest as _pytest
    from exmc_tpu.stan.parser import parse as stan_parse
    with _pytest.raises(StanSyntaxError, match="1-d"):
        stan_parse("data { array[N, 2] int y; } parameters { real m; } "
                   "model { m ~ normal(0, 1); }")
    with _pytest.raises(StanSyntaxError, match="element type"):
        stan_parse("data { array[N] vector[2] y; } parameters { real m; }"
                   " model { m ~ normal(0, 1); }")


def test_int_parameters_rejected():
    """stanc rejects integer parameters (HMC needs continuous
    support); so must we instead of silently sampling continuous
    values (review fix)."""
    for decl in ("int k;", "array[3] int k;"):
        with pytest.raises(StanSyntaxError, match="int is not a valid"):
            parse("parameters { %s }\nmodel { }" % decl)
    # int DATA (incl. array[N] int) stays accepted
    ast = parse("data { int N; array[2] int y; }\n"
                "parameters { real mu; }\nmodel { mu ~ normal(0, 1); }")
    assert ast["data"][1]["type"] == "vector"


def test_function_vector_local_indexed_via_data():
    code = """
    functions {
      real second_of_double(vector x) {
        vector[3] a = x + x;
        return a[2];
      }
    }
    data { vector[3] v; }
    parameters { real mu; }
    model { mu ~ normal(second_of_double(v), 1); }
    """
    ir = stan.compile(code, {"v": np.array([1.0, 2.0, 3.0], np.float32)})
    lp0, m = _lp(ir, np.zeros(1))
    import jax.numpy as jnp
    # mean is a[2] = (v+v)[2] = 4 (1-based); logp peak at mu=4
    lp4 = float(m.logp(jnp.asarray([4.0], np.float32)))
    assert lp4 > lp0

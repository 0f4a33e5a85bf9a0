"""Stan frontend tests (reference test/exmc/stan/ lexer/parser/compiler/
error coverage)."""

import numpy as np
import pytest

from exmc_tpu import compile_logp, dists
from exmc_tpu import stan
from exmc_tpu.stan.lexer import StanSyntaxError, tokenize
from exmc_tpu.stan.parser import parse

CODE = """
data { real y; }
parameters { real mu; }
model {
  mu ~ normal(0, 10);
  y ~ normal(mu, 1);
}
"""


def test_lexer():
    toks = tokenize("parameters { real<lower=0> s; }")
    kinds = [t[0] for t in toks]
    assert kinds == [
        "PARAMETERS", "LBRACE", "REAL", "LANGLE", "LOWER", "EQUALS",
        "NUMBER", "RANGLE", "IDENT", "SEMI", "RBRACE", "EOF",
    ]


def test_lexer_comments():
    toks = tokenize("// comment\nmodel /* block\ncomment */ { }")
    assert [t[0] for t in toks] == ["MODEL", "LBRACE", "RBRACE", "EOF"]


def test_parser_ast():
    ast = parse(CODE)
    assert ast["data"][0]["name"] == "y"
    assert ast["parameters"][0]["name"] == "mu"
    assert len(ast["model"]) == 2
    assert ast["model"][0] == {
        "kind": "sampling", "target": "mu", "dist": "normal",
        "args": [0.0, 10.0], "line": 5,
    }


def test_compile_basic():
    ir = stan.compile(CODE, {"y": 5.0})
    m = compile_logp(ir)
    assert m.size == 1
    names = [e.id for e in m.pm.entries]
    assert names == ["mu"]


def test_constraint_lower_zero_gets_log():
    code = """
    parameters { real<lower=0> sigma; }
    model { sigma ~ half_normal(1); }
    """
    ir = stan.compile(code)
    node = ir.nodes["sigma"]
    # explicit transform recorded on the node
    from exmc_tpu import rewrite

    rw = rewrite.apply(ir)
    assert rw.nodes["sigma"].op[3] == "log"


def test_constraint_unit_interval_gets_logit():
    code = """
    parameters { real<lower=0, upper=1> p; }
    model { p ~ beta(2, 2); }
    """
    ir = stan.compile(code)
    from exmc_tpu import rewrite

    rw = rewrite.apply(ir)
    assert rw.nodes["p"].op[3] == "logit"


def test_general_interval_constraint():
    code = """
    parameters { real<lower=-2, upper=3> x; }
    model { x ~ normal(0, 1); }
    """
    ir = stan.compile(code)
    m = compile_logp(ir)
    con = m.constrain(np.zeros(1, np.float32))
    assert -2.0 < float(con["x"]) < 3.0


def test_vector_param():
    code = """
    data { int N; }
    parameters { vector[N] theta; }
    model { theta ~ normal(0, 1); }
    """
    ir = stan.compile(code, {"N": 3})
    m = compile_logp(ir)
    assert m.size == 3


def test_data_obs_pair():
    ir = stan.compile(CODE, {"y": 5.0})
    assert any(n.op[0] == "obs" for n in ir.nodes.values())


def test_unknown_dist_error_has_line():
    code = "parameters { real x; }\nmodel { x ~ nope(1); }"
    with pytest.raises(StanSyntaxError, match="unknown distribution"):
        stan.compile(code)


def test_syntax_error_has_context():
    code = "parameters { real x }\nmodel { x ~ normal(0,1); }"
    with pytest.raises(StanSyntaxError, match="line 1"):
        stan.compile(code)


def test_arithmetic_in_dist_args():
    """EXTENSION: the reference rejects arithmetic in dist args
    (stan.ex:31-36); we compile expressions to det nodes."""
    code = """
    parameters { real x; real<lower=0> tau; }
    model {
      tau ~ half_normal(2);
      x ~ normal(1 + 2, sqrt(tau) * 2);
    }
    """
    ir = stan.compile(code)
    m = compile_logp(ir, ncp=False)
    import math
    import jax.numpy as jnp

    # constant folding: 1 + 2 -> 3.0 (no det node for it)
    rw_params = None
    from exmc_tpu import rewrite

    rw = rewrite.apply(ir, ncp=False)
    x_params = rw.nodes["x"].op[2]
    assert x_params["mu"] == 3.0
    assert isinstance(x_params["sigma"], str)  # det-node ref
    # numeric check: logp at tau_z, x
    tau_z, xv = 0.3, 0.5
    tau = math.log(1 + math.exp(tau_z))  # softplus? no: <lower=0> -> log
    # <lower=0> gives the log transform: tau = exp(tau_z)
    tau = math.exp(tau_z)
    sigma_x = math.sqrt(tau) * 2
    names = [e.id for e in m.pm.entries]
    flat = np.zeros(2, np.float32)
    flat[names.index("x")] = xv
    flat[names.index("tau")] = tau_z
    got = float(m.logp(jnp.asarray(flat)))
    half_normal = (0.5 * math.log(2 / math.pi) - math.log(2.0)
                   - 0.5 * (tau / 2.0) ** 2)
    normal = (-0.5 * ((xv - 3.0) / sigma_x) ** 2 - math.log(sigma_x)
              - 0.5 * math.log(2 * math.pi))
    expected = half_normal + tau_z + normal  # + log-transform jacobian
    assert abs(got - expected) < 1e-3


def test_negative_bounds_and_unary_minus():
    code = """
    parameters { real<lower=-2, upper=3> x; }
    model { x ~ normal(-1, 2); }
    """
    ir = stan.compile(code)
    from exmc_tpu import rewrite

    rw = rewrite.apply(ir, ncp=False)
    assert rw.nodes["x"].op[2]["mu"] == -1.0


def test_arithmetic_sampling_e2e():
    code = """
    data { real y; }
    parameters { real mu; }
    model {
      mu ~ normal(0, 5 * 2);
      y ~ normal(mu / 2, 1);
    }
    """
    trace, _ = stan.sample(code, {"y": 2.0}, num_warmup=300,
                           num_samples=300, seed=0)
    # posterior of mu: likelihood y=2 ~ N(mu/2, 1) -> mu ~ 4 (prior wide)
    assert abs(float(np.mean(trace["mu"])) - 3.96) < 0.6


def test_stan_sample_e2e():
    trace, stats = stan.sample(
        CODE, {"y": 5.0}, num_warmup=300, num_samples=300, seed=0
    )
    # posterior of mu with prior N(0,10^2), obs y=5, sigma=1:
    # mean = 5 * 100/101 ~ 4.95
    assert abs(float(np.mean(trace["mu"])) - 4.95) < 0.4


def test_uniform_unit_interval():
    """Regression (ADVICE r1, low): 'y ~ uniform(0, 1);' must compile."""
    code = """
    parameters { real p; }
    model { p ~ uniform(0, 1); }
    """
    ir = stan.compile(code)
    model = compile_logp(ir)
    # logit transform attached: unconstrained dim 1, logp finite anywhere
    import jax.numpy as jnp
    assert np.isfinite(float(model.logp(jnp.zeros(model.pm.size))))


def test_uniform_general_bounds_sampling():
    code = """
    parameters { real theta; }
    model { theta ~ uniform(2, 5); }
    """
    trace, _ = stan.sample(code, num_warmup=200, num_samples=400, seed=0)
    th = np.asarray(trace["theta"])
    assert th.min() > 2.0 and th.max() < 5.0
    assert abs(th.mean() - 3.5) < 0.4  # uniform mean (2+5)/2


def test_uniform_nonconstant_bounds_rejected():
    code = """
    parameters { real a; real theta; }
    model {
      a ~ normal(0, 1);
      theta ~ uniform(a, 5);
    }
    """
    with pytest.raises(StanSyntaxError, match="numeric constants"):
        stan.compile(code)

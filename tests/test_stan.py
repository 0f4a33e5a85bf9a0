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
        "target": "mu", "dist": "normal", "args": [0.0, 10.0], "line": 5,
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


def test_arithmetic_rejected():
    code = "parameters { real x; }\nmodel { x ~ normal(0, 1 + 2); }"
    with pytest.raises(StanSyntaxError):
        stan.compile(code)


def test_stan_sample_e2e():
    trace, stats = stan.sample(
        CODE, {"y": 5.0}, num_warmup=300, num_samples=300, seed=0
    )
    # posterior of mu with prior N(0,10^2), obs y=5, sigma=1:
    # mean = 5 * 100/101 ~ 4.95
    assert abs(float(np.mean(trace["mu"])) - 4.95) < 0.4

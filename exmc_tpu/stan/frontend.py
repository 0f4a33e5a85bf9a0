"""Stan AST -> IR compiler (reference lib/exmc/stan/compiler.ex).

Semantics preserved:
* parameters -> free RVs; ``<lower=0>`` -> log transform,
  ``<lower=0,upper=1>`` -> logit (stan/compiler.ex:61-97); other
  two-sided bounds get an interval transform (extension);
* data variables appearing on the left of ``~`` become an RV + obs pair
  (stan/compiler.ex:61-97);
* ``simplex[K]`` parameters get the Dirichlet stick-breaking treatment
  when sampled from ``dirichlet``;
* errors carry line context (stan.ex:100-110).
"""

import numpy as np

from exmc_tpu import dists
from exmc_tpu.ir import Builder
from exmc_tpu.stan.lexer import StanSyntaxError
from exmc_tpu.stan.parser import parse
from exmc_tpu.transforms import IntervalTransform

# Stan-name -> (dist, ordered param names) (reference stan/dist_map.ex:25-42)
DIST_MAP = {
    "normal": (dists.Normal, ["mu", "sigma"]),
    "gamma": (dists.Gamma, ["alpha", "beta"]),
    "exponential": (dists.Exponential, ["lambda"]),
    "beta": (dists.Beta, ["alpha", "beta"]),
    "half_normal": (dists.HalfNormal, ["sigma"]),
    "half_cauchy": (dists.HalfCauchy, ["scale"]),
    "cauchy": (dists.Cauchy, ["loc", "scale"]),
    "student_t": (dists.StudentT, ["df", "loc", "scale"]),
    "bernoulli": (dists.Bernoulli, ["p"]),
    "poisson": (dists.Poisson, ["mu"]),
    "lognormal": (dists.LogNormal, ["mu", "sigma"]),
    "truncated_normal": (dists.TruncatedNormal, ["mu", "sigma", "lower", "upper"]),
    "laplace": (dists.Laplace, ["mu", "b"]),
    "dirichlet": (dists.Dirichlet, ["alpha"]),
    "weibull": (dists.Weibull, ["k", "lambda"]),
    # Stan's uniform takes (lower, upper); constant (0,1) is the
    # reference's Uniform01, general constant bounds use the interval
    # transform (ADVICE r1)
    "uniform": (dists.Uniform, ["lower", "upper"]),
}


def _constraint_transform(decl):
    lower, upper = decl.get("lower"), decl.get("upper")
    if lower is None and upper is None:
        return None
    if lower == 0.0 and upper is None:
        return "log"
    if lower == 0.0 and upper == 1.0:
        return "logit"
    if lower is not None and upper is not None:
        return IntervalTransform(lower, upper)
    raise StanSyntaxError(
        f"unsupported constraint <lower={lower}, upper={upper}> on "
        f"{decl['name']!r}", line=decl.get("line"),
    )


def _lookup_dist(name, line):
    try:
        return DIST_MAP[name]
    except KeyError:
        supported = ", ".join(sorted(DIST_MAP))
        raise StanSyntaxError(
            f"unknown distribution {name!r}. Supported: {supported}",
            line=line,
        ) from None


def _resolve_size(size, data, int_data):
    if size is None or isinstance(size, int):
        return size
    if size in int_data:
        return int(int_data[size])
    if size in data:
        return int(np.asarray(data[size]))
    raise StanSyntaxError(f"unknown size variable {size!r}")


def compile(code: str, data=None):
    """Compile Stan code + data dict to an IR (reference Stan.compile!,
    stan.ex:52-60). Raises StanSyntaxError with line context on failure."""
    data = dict(data or {})
    ast = parse(code)

    data_names = {d["name"] for d in ast["data"]}
    int_data = {
        d["name"]: data[d["name"]]
        for d in ast["data"]
        if d["type"] == "int" and d["name"] in data
    }
    param_decls = {d["name"]: d for d in ast["parameters"]}

    ir = Builder.new_ir()
    declared_rvs = set()
    expr_counter = [0]

    _FNS = {"sqrt", "exp", "log", "abs", "softplus", "sigmoid"}

    def compile_arg(ir, expr, line):
        """Lower an argument expression AST to a constant or node ref;
        arithmetic compiles to det nodes (extension beyond the
        reference's no-arithmetic limitation, stan.ex:31-36)."""
        if isinstance(expr, float):
            return ir, expr
        if isinstance(expr, str):
            if expr in data_names:
                return ir, np.asarray(data[expr], dtype=np.float32)
            return ir, expr  # ref to another RV/det
        tag = expr[0]
        expr_counter[0] += 1
        nid = f"__expr_{expr_counter[0]}"
        if tag == "binop":
            ir, l = compile_arg(ir, expr[2], line)
            ir, r = compile_arg(ir, expr[3], line)
            ir = Builder.det(ir, nid, expr[1], [l, r])
            return ir, nid
        if tag == "neg":
            ir, x = compile_arg(ir, expr[1], line)
            ir = Builder.det(ir, nid, "neg", [x])
            return ir, nid
        if tag == "call":
            if expr[1] not in _FNS:
                raise StanSyntaxError(
                    f"unknown function {expr[1]!r} (supported: "
                    f"{', '.join(sorted(_FNS))})", line=line,
                )
            ir, x = compile_arg(ir, expr[2], line)
            ir = Builder.det(ir, nid, expr[1], [x])
            return ir, nid
        raise StanSyntaxError(f"bad expression {expr!r}", line=line)

    for stmt in ast["model"]:
        target, dist_name, args = stmt["target"], stmt["dist"], stmt["args"]
        dist, param_names = _lookup_dist(dist_name, stmt["line"])
        if len(args) != len(param_names):
            raise StanSyntaxError(
                f"{dist_name} expects {len(param_names)} args, got {len(args)}",
                line=stmt["line"],
            )
        params = {}
        for pname, arg in zip(param_names, args):
            ir, val = compile_arg(ir, arg, stmt["line"])
            params[pname] = val
        if dist_name == "dirichlet" and isinstance(params.get("alpha"), (int, float)):
            raise StanSyntaxError("dirichlet needs a vector alpha", line=stmt["line"])
        if dist_name == "uniform":
            for k in ("lower", "upper"):
                v = params.get(k)
                if isinstance(v, np.ndarray) and v.size == 1:
                    params[k] = float(v)  # scalar data bound is a constant
                elif not isinstance(v, (int, float)):
                    raise StanSyntaxError(
                        "uniform bounds must be numeric constants "
                        "(non-constant bounds would need a data-dependent "
                        "constraint transform)",
                        line=stmt["line"],
                    )

        if target in param_decls:
            decl = param_decls[target]
            transform = _constraint_transform(decl)
            shape = None
            size = _resolve_size(decl.get("size"), data, int_data)
            if size is not None:
                shape = (size,)
            if decl["type"] == "simplex":
                shape = (size,)
            ir = Builder.rv(ir, target, dist, params, transform=transform,
                            shape=shape)
            declared_rvs.add(target)
        elif target in data_names:
            # data on the left of ~ : RV + obs pair (stan/compiler.ex:61-97)
            rv_id = f"__{target}_rv"
            value = np.asarray(data[target], dtype=np.float32)
            shape = tuple(value.shape) or None
            ir = Builder.rv(ir, rv_id, dist, params, shape=shape)
            ir = Builder.obs(ir, f"{target}_obs", rv_id, value)
        else:
            raise StanSyntaxError(
                f"{target!r} is neither a declared parameter nor data",
                line=stmt["line"],
            )

    missing = set(param_decls) - declared_rvs
    if missing:
        raise StanSyntaxError(
            f"parameters without a sampling statement: {sorted(missing)}"
        )
    return ir


def compile_or_error(code, data=None):
    """Non-raising variant: returns ("ok", ir) or ("error", message)."""
    try:
        return "ok", compile(code, data)
    except (StanSyntaxError, KeyError) as e:  # pragma: no cover
        return "error", str(e)


def sample(code, data=None, **opts):
    """Compile-and-sample (reference Stan.sample, stan.ex:77)."""
    from exmc_tpu.nuts.sampler import sample as nuts_sample

    ir = compile(code, data)
    return nuts_sample(ir, **opts)

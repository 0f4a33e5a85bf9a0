"""Stan-subset frontend (reference lib/exmc/stan.ex +
src/exmc_stan_{lexer.xrl,parser.yrl}).

Pure-Python tokenizer + recursive-descent parser replacing the
reference's leex/yecc-generated Erlang (SURVEY.md §2.6), EXCEEDING the
reference's stated limits (stan.ex:31-36 "no target +=, no loops, no
transformed blocks"): arithmetic/function expressions in distribution
arguments, ``target +=`` (incl. ``_lpdf``/``_lpmf`` calls),
compile-time-vectorized ``for`` loops, ``functions`` blocks (inlined),
``transformed data`` / ``transformed parameters``, matrix data and
parameters, data-referencing and two-sided/affine
(``<offset=,multiplier=>``) constraints, ordered / positive_ordered /
cholesky_factor_corr / sum_to_zero_vector types, 26 mapped
distributions, and (round 4) ``generated quantities`` evaluated per
posterior draw after sampling (deterministic rows + ``*_rng`` draws).
Still rejected by design: ``while`` loops (no vectorized lowering) and
local variables inside functions."""

from exmc_tpu.stan.frontend import (
    StanSyntaxError,
    compile as compile,
    compile_or_error,
    generated_quantities,
    sample,
)

__all__ = ["compile", "compile_or_error", "generated_quantities",
           "sample", "StanSyntaxError"]

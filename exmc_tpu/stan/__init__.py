"""Stan-subset frontend (reference lib/exmc/stan.ex +
src/exmc_stan_{lexer.xrl,parser.yrl}).

Pure-Python tokenizer + recursive-descent parser replacing the
reference's leex/yecc-generated Erlang (SURVEY.md §2.6). Same language
subset: ``data``/``parameters``/``model`` blocks, ``~`` sampling
statements, ``<lower=,upper=>`` constraints, 14 mapped distributions —
EXTENSIONS beyond the reference's limitations (stan.ex:31-36):
arithmetic expressions and function calls (sqrt/exp/log/abs/softplus/
sigmoid) in distribution arguments compile to det nodes, and two-sided
<lower=,upper=> bounds get an interval transform. Still unsupported:
``target +=``, loops, transformed blocks."""

from exmc_tpu.stan.frontend import compile as compile, compile_or_error, sample

__all__ = ["compile", "compile_or_error", "sample"]

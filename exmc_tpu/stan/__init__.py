"""Stan-subset frontend (reference lib/exmc/stan.ex +
src/exmc_stan_{lexer.xrl,parser.yrl}).

Pure-Python tokenizer + recursive-descent parser replacing the
reference's leex/yecc-generated Erlang (SURVEY.md §2.6). Same language
subset: ``data``/``parameters``/``model`` blocks, ``~`` sampling
statements, ``<lower=,upper=>`` constraints, 14 mapped distributions —
and the same limitations (no arithmetic in dist args, no ``target +=``,
no loops/transformed blocks; stan.ex:31-36)."""

from exmc_tpu.stan.frontend import compile as compile, compile_or_error, sample

__all__ = ["compile", "compile_or_error", "sample"]

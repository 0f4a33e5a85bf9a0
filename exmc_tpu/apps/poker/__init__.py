"""Bayesian poker opponent profiling (reference lib/exmc/poker/).

Hierarchical opponent modeling via NUTS: population hyperparams +
partially-pooled per-player params, softmax action likelihood.

TPU-first redesign: the reference builds 8 + 4P scalar RVs and loops
players inside a Custom closure (opponent_model.ex:60-131); here the
per-player raws are four (P,)-vector RVs and the likelihood is ONE
vectorized (P, H, 3) log-softmax — the whole table scores in a single
fused kernel.
"""

from exmc_tpu.apps.poker.api import simulate, profile, decide, compare
from exmc_tpu.apps.poker import cards
from exmc_tpu.apps.poker.simulator import archetypes
from exmc_tpu.apps.poker.api import profile_tables
from exmc_tpu.apps.poker.table import Table, MultiTable

__all__ = ["simulate", "profile", "decide", "compare", "cards", "archetypes",
           "Table", "MultiTable", "profile_tables"]

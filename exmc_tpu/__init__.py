"""exmc_tpu — a TPU-native probabilistic programming framework in JAX.

Re-designed from scratch with the capabilities of the reference PPL eXMC
(borodark/exmc): a declarative model IR with Builder/DSL frontends and a
Stan-subset compiler, rewrite passes (automatic constraint transforms,
observation normalization, measurable-op lifting, automatic non-centered
parameterization), 21 differentiable distributions, compilation to a single
jitted log-density over a flat unconstrained vector, a multinomial NUTS
sampler with Stan-style three-phase warmup implemented as fused
``lax.scan``/``lax.while_loop`` kernels, vmapped multi-chain execution,
ADVI/SMC/Pathfinder on the same compiled log-density, and
ESS/R-hat/WAIC/LOO diagnostics as on-device reductions.

Architecture (TPU-first, cf. /root/reference layer map in SURVEY.md §1):

    Frontends        exmc_tpu.dsl (Model context manager), exmc_tpu.stan
    IR / Model       exmc_tpu.ir (IR, Node, Builder), exmc_tpu.dists
    Rewrites         exmc_tpu.rewrite (6 ordered passes)
    Compiler         exmc_tpu.compiler, exmc_tpu.point_map, exmc_tpu.transforms
    Inference        exmc_tpu.nuts, exmc_tpu.advi, exmc_tpu.smc, exmc_tpu.pathfinder
    Parallel         exmc_tpu.parallel (vmap chains, shard_map over meshes)
    Diagnostics      exmc_tpu.diagnostics, exmc_tpu.model_comparison, exmc_tpu.predictive

Unlike the reference — where the NUTS tree runs in host Elixir/Rust with
1-2 JIT dispatches + NIF calls per transition (reference tree.ex:30-35) —
the entire NUTS transition here (leapfrog, tree doubling, U-turn checks,
multinomial merges, adaptation) is ONE jitted XLA program, vmapped over
thousands of chains per chip.
"""

from exmc_tpu import dists
from exmc_tpu.ir import IR, Node, Builder
from exmc_tpu.dsl import Model
from exmc_tpu.compiler import compile_logp, compile_for_sampling, compile_pointwise
from exmc_tpu.point_map import PointMap
from exmc_tpu.nuts import sample, sample_chains, sample_stream
from exmc_tpu.chees import sample_chees, sample_snaper
from exmc_tpu.meads import sample_meads
from exmc_tpu.advi import advi_fit
from exmc_tpu.flows import flow_fit, sample_neutra
from exmc_tpu import gp
from exmc_tpu import hmm
from exmc_tpu import glm
from exmc_tpu.smc import smc_sample
from exmc_tpu.pathfinder import pathfinder_fit
from exmc_tpu.optimize import fit_map, laplace
from exmc_tpu.psir import psir
from exmc_tpu import diagnostics
from exmc_tpu import log_prob
from exmc_tpu import model_comparison
from exmc_tpu import predictive
from exmc_tpu import sbc
from exmc_tpu import stan
from exmc_tpu import transforms

__version__ = "0.1.0"

__all__ = [
    "IR",
    "Node",
    "Builder",
    "Model",
    "PointMap",
    "compile_logp",
    "compile_for_sampling",
    "compile_pointwise",
    "sample",
    "sample_chains",
    "sample_chees",
    "sample_snaper",
    "sample_meads",
    "sample_stream",
    "advi_fit",
    "flow_fit",
    "gp",
    "hmm",
    "glm",
    "sample_neutra",
    "smc_sample",
    "pathfinder_fit",
    "fit_map",
    "laplace",
    "psir",
    "dists",
    "diagnostics",
    "log_prob",
    "model_comparison",
    "predictive",
    "sbc",
    "stan",
    "transforms",
]

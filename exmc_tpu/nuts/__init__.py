"""NUTS engine: the entire transition (leapfrog, iterative multinomial
tree doubling, U-turn checks, merges, adaptation) is ONE jitted XLA
program, vmapped over chains.

Contrast with the reference (SURVEY.md §3.1 hot loop): per NUTS step it
paid 1-2 JIT dispatches + 0-k Rust-NIF calls + device->host copies of
bulk leapfrog buffers (reference tree.ex:30-35, ~250us per crossing,
DECISIONS D39/D40). All of that engineering — speculative buffers,
atomics-counter caches, full-tree NIF, Vulkan fused chains — existed to
amortize boundary crossings that do not exist here.
"""

from exmc_tpu.nuts.sampler import sample, sample_chains, sample_stream
from exmc_tpu.nuts.tree import build_nuts_kernel
from exmc_tpu.nuts.step_size import DualAveragingState, da_init, da_update, find_reasonable_epsilon
from exmc_tpu.nuts.mass_matrix import WelfordState, welford_init, welford_update, welford_finalize

__all__ = [
    "sample",
    "sample_chains",
    "sample_stream",
    "build_nuts_kernel",
    "DualAveragingState",
    "da_init",
    "da_update",
    "find_reasonable_epsilon",
    "WelfordState",
    "welford_init",
    "welford_update",
    "welford_finalize",
]

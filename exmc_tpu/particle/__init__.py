"""Particle-filter stack: bootstrap PF -> PMCMC -> SMC^2.

The TPU-native counterpart of the reference's extracted ``smc_ex``
library (reference DECISIONS D72/D73/D76: ParticleFilter, PMCMC,
OnlineSMC2 — Chopin et al. 2013): intractable-likelihood state-space
models (discrete transitions, SEIR, regime switching) where NUTS cannot
run because the marginal likelihood has no closed form.

Where the reference fans BEAM processes over theta-particles
(Task.async_stream, 88 cores), here the WHOLE stack is nested
vectorization inside one XLA program: ``vmap`` over theta-particles,
each carrying ``n_x`` state particles, with systematic resampling as a
gather — thousands of particle filters advance per device step.
"""

from exmc_tpu.particle.filter import particle_filter, systematic_resample
from exmc_tpu.particle.pmcmc import pmcmc
from exmc_tpu.particle.smc2 import smc2

__all__ = ["particle_filter", "systematic_resample", "pmcmc", "smc2"]

from exmc_tpu.apps.physics.heat_2d import solve as heat2d_solve, read_sensors
from exmc_tpu.apps.physics.level_set import (
    smooth_heaviside,
    material_field,
    laplacian_prior_logpdf,
    build_inverse_model,
)

__all__ = [
    "heat2d_solve",
    "read_sensors",
    "smooth_heaviside",
    "material_field",
    "laplacian_prior_logpdf",
    "build_inverse_model",
]

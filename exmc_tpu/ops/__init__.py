from exmc_tpu.ops.fused_leapfrog import fused_leapfrog_gaussian

__all__ = ["fused_leapfrog_gaussian"]

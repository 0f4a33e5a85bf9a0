from exmc_tpu.utils.fault_injector import FaultInjector
from exmc_tpu.utils.checkpoint import save_checkpoint, load_checkpoint
from exmc_tpu.utils.profiling import trace_profile

__all__ = ["FaultInjector", "save_checkpoint", "load_checkpoint", "trace_profile"]

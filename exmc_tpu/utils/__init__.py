from exmc_tpu.utils.fault_injector import FaultInjector
from exmc_tpu.utils.checkpoint import save_checkpoint, load_checkpoint
from exmc_tpu.utils.trace_store import TraceStore
from exmc_tpu.utils.profiling import (annotate, annotated_run,
                                      phase_report, trace_profile)

__all__ = ["FaultInjector", "save_checkpoint", "load_checkpoint", "trace_profile",
           "annotate", "annotated_run", "phase_report", "TraceStore"]

from exmc_tpu.benchmarks.suite import MODELS, build_model, run_model, run_suite

__all__ = ["MODELS", "build_model", "run_model", "run_suite"]

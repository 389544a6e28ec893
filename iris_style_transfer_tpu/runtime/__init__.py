"""Runtime: config, logging, checkpointing, profiling, benchmarking."""

from .config import WorkloadConfig, add_common_args
from .logging import MetricLogger
from .checkpoint import (
    save_checkpoint,
    restore_checkpoint,
    restore_checkpoint_file,
    restore_params,
    latest_step,
    save_state,
    restore_state,
    latest_state_step,
)
from .profiler import StepTimer, trace
from .cache import enable_compile_cache

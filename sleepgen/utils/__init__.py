from sleepgen.utils.checkpoint import CheckpointManager
from sleepgen.utils.initutil import jit_init
from sleepgen.utils.logging import MetricsLogger, log_reconstruction_arrays, setup_run_dir

__all__ = [
    "CheckpointManager",
    "jit_init",
    "MetricsLogger",
    "log_reconstruction_arrays",
    "setup_run_dir",
]

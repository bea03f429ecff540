from sleepgen.utils.checkpoint import CheckpointManager
from sleepgen.utils.logging import MetricsLogger, log_reconstruction_arrays, setup_run_dir

__all__ = [
    "CheckpointManager",
    "MetricsLogger",
    "log_reconstruction_arrays",
    "setup_run_dir",
]

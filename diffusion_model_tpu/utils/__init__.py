from .env import pallas_supported, timestamp_dir_name, timestamp_run_name
from .profiling import StepTimer, annotate, trace

__all__ = [
    "pallas_supported", "timestamp_dir_name", "timestamp_run_name",
    "StepTimer", "annotate", "trace",
]

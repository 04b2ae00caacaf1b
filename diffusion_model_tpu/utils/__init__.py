from .env import pallas_supported, timestamp_dir_name, timestamp_run_name

__all__ = ["pallas_supported", "timestamp_dir_name", "timestamp_run_name"]

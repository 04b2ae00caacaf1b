from .schedule import DiffusionSchedule
from .sampling import (
    q_sample,
    ddpm_posterior_step,
    cfg_eps,
    sample_loop,
    sample_loop_with_snapshots,
)

__all__ = [
    "DiffusionSchedule",
    "q_sample",
    "ddpm_posterior_step",
    "cfg_eps",
    "sample_loop",
    "sample_loop_with_snapshots",
]

from .schedule import DiffusionSchedule
from .sampling import (
    q_sample,
    ddpm_posterior_step,
    ddim_step,
    ddim_timesteps,
    cfg_eps,
    sample_loop,
    sample_loop_ddim,
    sample_loop_encoder_cached,
    sample_loop_dpmpp,
    sample_loop_with_snapshots,
)
from .parallel_sampling import sample_loop_ddim_parallel

__all__ = [
    "DiffusionSchedule",
    "q_sample",
    "ddpm_posterior_step",
    "ddim_step",
    "ddim_timesteps",
    "cfg_eps",
    "sample_loop",
    "sample_loop_ddim",
    "sample_loop_encoder_cached",
    "sample_loop_dpmpp",
    "sample_loop_ddim_parallel",
    "sample_loop_with_snapshots",
]

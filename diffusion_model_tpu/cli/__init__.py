"""CLI entry points mirroring the reference scripts (SURVEY.md §1 L5):

  python -m diffusion_model_tpu.cli.train_vae          (train_vae.py)
  python -m diffusion_model_tpu.cli.train_latent_cond  (train_latent_cond.py)
  python -m diffusion_model_tpu.cli.generate_cond      (generate_cond.py)
  python -m diffusion_model_tpu.cli.generate_steps     (generate_steps.py)
  python -m diffusion_model_tpu.cli.eval_iou_noise     (eval_iou_noise.py)
  python -m diffusion_model_tpu.cli.image_tools        (image_tools.py)
  python -m diffusion_model_tpu.cli.vae_recon_check    (vae_recon_check.py)
  python -m diffusion_model_tpu.cli.make_dataset       (no reference
      counterpart: the synthetic line/circle/arc dataset generator the
      reference never shipped)
  python -m diffusion_model_tpu.cli.generate_uncond    (Utils.generate
      parity: unconditional pixel-space sampling)
  python -m diffusion_model_tpu.cli.serve              (no reference
      counterpart: warm-pipeline HTTP inference server)
  python -m diffusion_model_tpu.cli.distill            (no reference
      counterpart: progressive guided distillation to few-step samplers)
  python -m diffusion_model_tpu.cli.convert_checkpoint (no reference
      counterpart: import reference-trained torch .pth state_dicts as
      framework msgpack checkpoints)

Every CLI gets JAX's persistent compilation cache (default
``/tmp/jax_cache``, override/disable via
``DIFFUSION_TPU_COMPILE_CACHE_DIR``): under the remote axon compiler a
cold compile of a big training/sampling program costs tens of minutes,
and a killed-and-retried run must not pay it twice.
"""
import os as _os

import jax as _jax

_cache_dir = _os.environ.get("DIFFUSION_TPU_COMPILE_CACHE_DIR",
                             "/tmp/jax_cache")
if _cache_dir:
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

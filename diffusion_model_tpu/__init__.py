"""diffusion_model_tpu — a TPU-native (JAX/XLA/Pallas/pjit) two-stage conditional
latent-diffusion framework for geometric line drawings.

Re-implements the full capability surface of the reference
S-Taichiii/diffusion-model (PyTorch, single-GPU) as a TPU-first design:

- NHWC tensor layout (TPU-native convolutions on the MXU)
- pure-functional diffusion core; the T-step CFG sampler is a single jitted
  ``lax.scan`` with classifier-free guidance batched as one 2B forward
- data-parallel (and optional tensor-parallel) execution over a
  ``jax.sharding.Mesh`` with XLA collectives over ICI
- Pallas fused kernels for GroupNorm(+GELU) and the spatial attention block
- a native C++ Euclidean-distance-transform + mask-metric module for the
  host-side evaluator (the reference leaned on scipy/OpenCV native code)

Subpackages
-----------
- ``diffusion``: noise schedule, q-sample, DDPM posterior step, scan samplers
- ``models``:    VAE, UNet, conditional UNet with geometry-regression head
- ``ops``:       Pallas kernels + XLA fallbacks (groupnorm, attention, resize)
- ``parallel``:  mesh construction, sharding rules, multi-chip helpers
- ``data``:      geometry normalization, datasets, loaders, synthetic renderer
- ``train``:     jitted train steps, early stopping, checkpointing, recorders
- ``eval``:      IoU / far-noise / gaussian-recall metrics and report pipeline
- ``tools``:     image tiling / video / recon-check visual tooling
- ``cli``:       entry points mirroring the reference scripts
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("DIFFUSION_TPU_PLATFORM"):
    # Hard backend override (e.g. DIFFUSION_TPU_PLATFORM=cpu). Needed
    # because out-of-tree PJRT plugins (like the axon TPU tunnel) can
    # register themselves regardless of JAX_PLATFORMS, so the standard env
    # var silently fails to keep a side job off the TPU. Setting the config
    # key here is early enough: JAX initializes backends lazily on first
    # device use, which is always after package import.
    import jax as _jax

    _jax.config.update("jax_platforms",
                       _os.environ["DIFFUSION_TPU_PLATFORM"])

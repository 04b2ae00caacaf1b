"""Benchmark: conditional-generation throughput at the reference workload.

North-star metric (BASELINE.md): images/sec/chip for 1000-step DDPM reverse
sampling with classifier-free guidance on the flagship conditional latent
U-Net (reference-size: base_ch=64, time_dim=256, ~23M params, 28×28×4
latents) INCLUDING the VAE decode to 224×224 images.

Baseline denominator: the PyTorch reference measured on CPU in this image
(B=8, torch 2.x, eager): 0.0110 images/sec — see BASELINE.md.

Prints exactly one JSON line:
  {"metric": "cond_gen_images_per_sec", "value": N, "unit": "images/sec/chip",
   "vs_baseline": N / 0.0110, ...extras}
"""
from __future__ import annotations

import json
import os
import time

import jax

# persistent compilation cache: the T=1000 scan costs ~3 min to compile
# cold; cached reruns start in seconds
os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

BASELINE_CPU_IMAGES_PER_SEC = 0.0110  # PyTorch reference, CPU, B=8 (BASELINE.md)


def build_pipeline(batch: int):
    from diffusion_model_tpu.diffusion import DiffusionSchedule
    from diffusion_model_tpu.models import (
        VAE, VAEConfig, CondUNet, UNetConfig,
    )
    from diffusion_model_tpu.pipeline import DiffusionPipeline

    rng = jax.random.PRNGKey(0)
    unet = CondUNet(UNetConfig(
        in_ch=4, time_dim=256, num_classes=3, geom_dim=12,
        with_geom_head=True, base_ch=64, dtype=jnp.bfloat16,
    ))
    vae = VAE(VAEConfig(base_channels=64, dtype=jnp.bfloat16))

    z = jnp.zeros((1, 28, 28, 4))
    unet_params = unet.init(
        rng, z, jnp.ones((1,), jnp.int32), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 12)), jnp.zeros((1, 12)),
    )["params"]
    vae_params = vae.init(
        {"params": rng, "sample": rng}, jnp.zeros((1, 224, 224, 3))
    )["params"]
    schedule = DiffusionSchedule.create(1000)
    return DiffusionPipeline(
        unet=unet, unet_params=unet_params, vae=vae, vae_params=vae_params,
        schedule=schedule,
    )


def main():
    batch = 64
    pipe = build_pipeline(batch)
    key = jax.random.PRNGKey(1)

    def run(k):
        return pipe.sample_latent_cond(
            (1, batch), guidance_scale=3.0, key=k, to_pil=False,
            image_hw=(224, 224),
        )

    # compile + warmup
    t0 = time.time()
    run(key)
    compile_s = time.time() - t0

    reps = 3
    t0 = time.time()
    for i in range(reps):
        run(jax.random.fold_in(key, i + 2))
    elapsed = (time.time() - t0) / reps

    n_chips = max(1, len(jax.devices()))
    ips_per_chip = batch / elapsed / n_chips
    print(json.dumps({
        "metric": "cond_gen_images_per_sec",
        "value": round(ips_per_chip, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips_per_chip / BASELINE_CPU_IMAGES_PER_SEC, 1),
        "batch": batch,
        "num_timesteps": 1000,
        "guidance_scale": 3.0,
        "chips": n_chips,
        "compile_s": round(compile_s, 1),
        "run_s": round(elapsed, 2),
    }))


if __name__ == "__main__":
    main()

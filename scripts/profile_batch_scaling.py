"""Attribute the sampler's batch-scaling behavior (VERDICT r1 weak #5).

Round 1 measured img/s DROPPING with batch (6.03 @ 64 → 4.76 @ 256) — the
opposite of a compute-bound program. This script isolates the suspects with
end-to-end ablations (per docs/PERFORMANCE.md methodology, op-level numbers
are untrustworthy through the axon tunnel):

  A. full pipeline (scan + CFG + decode)     — the headline path
  B. decode=False                            — remove the VAE decode tail
  C. guidance_scale=0                        — halve the per-step batch (no CFG)
  D. DIFFUSION_TPU_DISABLE_PALLAS=1 variant  — run separately to compare the
     XLA path's scaling (env must be set before import)

Usage (TPU):  python scripts/profile_batch_scaling.py [--batches 64 128 256]
              [--reps 3] [--timesteps 1000] [--trace_dir DIR]
With --trace_dir a jax.profiler trace of one B=max run at T=50 is captured
for op-level inspection (small enough to open).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.makedirs("/tmp/jax_cache", exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def build(timesteps: int):
    from diffusion_model_tpu.diffusion import DiffusionSchedule
    from diffusion_model_tpu.models import VAE, VAEConfig, CondUNet, UNetConfig
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
    return DiffusionPipeline(
        unet=unet, unet_params=unet_params, vae=vae, vae_params=vae_params,
        schedule=DiffusionSchedule.create(timesteps),
    )


def timed(pipe, batch, reps, guidance, decode, key, quantize=False):
    def run(k):
        return pipe.sample_latent_cond(
            (1, batch), guidance_scale=guidance, key=k, to_pil=False,
            decode=decode, image_hw=(224, 224), quantize=quantize,
        )

    t0 = time.time()
    run(key)
    compile_s = time.time() - t0
    ts = []
    for i in range(reps):
        t0 = time.time()
        run(jax.random.fold_in(key, i + 1))
        ts.append(time.time() - t0)
    ts = np.asarray(ts)
    return {"compile_s": round(compile_s, 1),
            "mean_s": round(float(ts.mean()), 3),
            "min_s": round(float(ts.min()), 3),
            "ips": round(batch / float(ts.mean()), 3)}


def timed_nofetch(pipe, batch, reps, guidance, key):
    """Full pipeline (scan + CFG + decode + on-device uint8) with the
    device→host fetch EXCLUDED: the output stays on device and we block on
    it, transferring nothing but completion. Splits the axon tunnel's
    ~21 MB/s fetch term out of the batch-scaling curve (VERDICT r2 #6) —
    this is the number a directly-attached TPU host would see."""
    run = pipe._sampler(guidance, True, snapshots=False, method="ddpm",
                        num_inference_steps=0, eta=0.0, quantize=True)

    def go(k):
        x_init = jax.random.normal(k, (batch, 28, 28, 4), dtype=jnp.float32)
        y = jnp.ones((batch,), jnp.int32)
        vals = jnp.zeros((batch, 12))
        mask = jnp.zeros((batch, 12))
        out = run(pipe.unet_params, pipe.vae_params, x_init,
                  jax.random.fold_in(k, 1), y, vals, mask)
        jax.block_until_ready(out)

    t0 = time.time()
    go(key)
    compile_s = time.time() - t0
    ts = []
    for i in range(reps):
        t0 = time.time()
        go(jax.random.fold_in(key, i + 1))
        ts.append(time.time() - t0)
    ts = np.asarray(ts)
    return {"compile_s": round(compile_s, 1),
            "mean_s": round(float(ts.mean()), 3),
            "min_s": round(float(ts.min()), 3),
            "ips": round(batch / float(ts.mean()), 3)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[64, 128, 256])
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--timesteps", type=int, default=1000)
    ap.add_argument("--trace_dir", default=None)
    ap.add_argument("--skip_ablations", action="store_true")
    ap.add_argument("--no_fetch", action="store_true",
                    help="add the fetch-excluded full-pipeline ablation")
    args = ap.parse_args()

    pipe = build(args.timesteps)
    key = jax.random.PRNGKey(7)
    out = {
        "pallas_disabled": os.environ.get(
            "DIFFUSION_TPU_DISABLE_PALLAS", "0"),
        "timesteps": args.timesteps,
    }

    for b in args.batches:
        row = {"A_full": timed(pipe, b, args.reps, 3.0, True,
                               jax.random.fold_in(key, b))}
        if args.no_fetch:
            row["E_no_fetch"] = timed_nofetch(pipe, b, args.reps, 3.0,
                                              jax.random.fold_in(key, b + 3))
        if not args.skip_ablations:
            row["A_quantized"] = timed(pipe, b, args.reps, 3.0, True,
                                       jax.random.fold_in(key, b),
                                       quantize=True)
            row["B_no_decode"] = timed(pipe, b, args.reps, 3.0, False,
                                       jax.random.fold_in(key, b + 1))
            row["C_no_cfg"] = timed(pipe, b, args.reps, 0.0, True,
                                    jax.random.fold_in(key, b + 2))
        out[f"batch_{b}"] = row
        print(json.dumps({f"batch_{b}": row}), flush=True)

    if args.trace_dir:
        short = build(50)
        bmax = max(args.batches)
        short.sample_latent_cond((1, bmax), guidance_scale=3.0,
                                 key=key, to_pil=False)  # compile
        with jax.profiler.trace(args.trace_dir):
            short.sample_latent_cond((1, bmax), guidance_scale=3.0,
                                     key=jax.random.fold_in(key, 1),
                                     to_pil=False)
        out["trace_dir"] = args.trace_dir
        print(f"trace written to {args.trace_dir}", flush=True)

    print("FINAL " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()

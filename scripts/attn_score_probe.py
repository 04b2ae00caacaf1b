"""Exact-f32 attention score-magnitude probe for a trained checkpoint.

The bf16-scores attention kernel elides softmax max-subtraction with a
clip at ±80 (ops/attention.py `_block_body_batched`): the optimization is
only exact while the checkpoint keeps max |scaled score| well below the
clip. This probe measures the actual maximum over every attention call of
a short guided DDIM generation and writes it as JSON.

Runs on the **CPU backend** by design: the probe instruments the kernels
via ``jax.debug.callback`` (DIFFUSION_TPU_ATTN_SCORE_PROBE=1), which the
axon remote-TPU PJRT client does not support (no host send/recv
callbacks). Score magnitude is a property of the checkpoint + sampler
trajectory, not of the device, so a CPU measurement certifies the TPU
fast path. Invoked as a subprocess by scripts/attn_bf16_cert.py.

Usage (cwd = quality root):
  python scripts/attn_score_probe.py --ckpt ./model_para/x.msgpack \
      --out probe.json [--count 4] [--steps 50]
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["DIFFUSION_TPU_ATTN_SCORE_PROBE"] = "1"
# Pallas kernels can't host the probe's f32 einsum reference on CPU
# interpret mode at full speed; the probe path itself is pure XLA, but
# force the whole run onto CPU before any device is touched.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--vae_ckpt", default=None,
                    help="default: newest ./vae/*/vae_best.msgpack")
    ap.add_argument("--out", required=True)
    ap.add_argument("--count", type=int, default=4)
    ap.add_argument("--steps", type=int, default=50,
                    help="DDIM steps (spread over the full t range; the "
                         "probe needs trajectory coverage, not quality)")
    ap.add_argument("--guidance", type=float, default=3.0)
    ap.add_argument("--image_size", type=int, default=224)
    args = ap.parse_args()

    from diffusion_model_tpu.config import LatentTrainConfig
    from diffusion_model_tpu.diffusion import DiffusionSchedule
    from diffusion_model_tpu.ops import attention as _attn
    from diffusion_model_tpu.pipeline import (
        CsvConditionSampler, DiffusionPipeline,
    )
    from diffusion_model_tpu.train.train_latent import build_models

    hw = (args.image_size, args.image_size)
    sfx = f"{hw[0]}x{hw[1]}"
    vae_ckpt = args.vae_ckpt or sorted(
        glob.glob("./vae/*/vae_best.msgpack"))[-1]
    vae, unet = build_models(LatentTrainConfig())
    pipe = DiffusionPipeline.from_checkpoints(
        unet_ckpt=args.ckpt, vae_ckpt=vae_ckpt, unet=unet, vae=vae,
        schedule=DiffusionSchedule.create(1000),
        latent_hw=(hw[0] // 8, hw[1] // 8), image_hw=hw,
    )
    sampler = CsvConditionSampler(pipe, class_id=1, image_hw=hw)
    d1 = f"./data/line_{sfx}_test"
    sampler.sample(f"{d1}/line_{sfx}_test.csv", count=args.count,
                   guidance_scale=args.guidance, method="ddim",
                   num_inference_steps=args.steps, to_pil=False,
                   key=jax.random.PRNGKey(7))
    jax.effects_barrier()
    obs = _attn.SCORE_PROBE_MAX
    score_max = max(obs) if obs else None
    result = {
        "max_abs_score": round(score_max, 3) if score_max else None,
        "clip": 80.0,
        "n_observations": len(obs),
        "within_clip_margin": bool(score_max is not None and score_max < 40),
        "probe": {"method": "ddim", "steps": args.steps,
                  "count": args.count, "backend": "cpu"},
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()

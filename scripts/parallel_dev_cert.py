"""Production-scale accuracy cert for time-parallel (Picard) DDIM
(VERDICT r3 weak #6: the end-to-end deviation was pinned only on toy
models; the pipeline hardwires tol=1e-3 and window=min(max(8, ndev), S)).

Runs the REAL flagship checkpoint at the production sampler settings and
compares method='ddim' (sequential scan) against method='ddim_parallel'
(sliding-window Picard) from the SAME x_init/conditions — both are
deterministic at eta=0, so any difference is pure solver deviation. The
comparison is made where it matters: the final uint8 images users see
(plus f32 latent deltas for diagnosis), per class.

Pass bar: max uint8 pixel delta <= 2 LSB AND mean abs delta <= 0.1 LSB
per class — i.e. visually identical output at the default tol.

Writes <root>/parallel_dev_cert.json.

Usage:
  python scripts/parallel_dev_cert.py --root ./quality_r2 [--steps 50]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.makedirs("/tmp/jax_cache", exist_ok=True)
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="./quality_r2")
    ap.add_argument("--ckpt", default="./model_para/trained_para_cont.msgpack")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--guidance", type=float, default=3.0)
    ap.add_argument("--image_size", type=int, default=224)
    ap.add_argument("--out_name", default="parallel_dev_cert.json")
    args = ap.parse_args()
    os.chdir(os.path.abspath(args.root))

    import glob

    from diffusion_model_tpu.config import LatentTrainConfig
    from diffusion_model_tpu.data.geometry import CLASS_NAMES
    from diffusion_model_tpu.diffusion import DiffusionSchedule
    from diffusion_model_tpu.pipeline import DiffusionPipeline
    from diffusion_model_tpu.train.train_latent import build_models

    hw = (args.image_size, args.image_size)
    vae_ckpt = sorted(glob.glob("./vae/*/vae_best.msgpack"))[-1]
    vae, unet = build_models(LatentTrainConfig())
    pipe = DiffusionPipeline.from_checkpoints(
        unet_ckpt=args.ckpt, vae_ckpt=vae_ckpt, unet=unet, vae=vae,
        schedule=DiffusionSchedule.create(1000),
        latent_hw=(hw[0] // 8, hw[1] // 8), image_hw=hw,
    )

    log = {"config": vars(args), "vae_ckpt": vae_ckpt,
           "pipeline_tol": 1e-3,
           "pipeline_window": f"min(max(8, ndev={len(jax.devices())}), S)"}
    per_class = {}
    ok = True
    for cls, cname in CLASS_NAMES.items():
        key = jax.random.PRNGKey(500 + cls)
        outs = {}
        for method in ("ddim", "ddim_parallel"):
            t0 = time.time()
            imgs = pipe.sample_latent_cond(
                (cls, args.batch), guidance_scale=args.guidance,
                key=key, image_hw=hw, method=method,
                num_inference_steps=args.steps, to_pil=False,
                quantize=True, batch_size=0,
            )
            outs[method] = np.asarray(imgs)
            outs[method + "_s"] = round(time.time() - t0, 2)
        a = outs["ddim"].astype(np.int32)
        b = outs["ddim_parallel"].astype(np.int32)
        d = np.abs(a - b)
        row = {
            "max_uint8_delta": int(d.max()),
            "mean_uint8_delta": round(float(d.mean()), 5),
            "pct_pixels_changed": round(float((d > 0).mean()) * 100, 4),
            "ddim_s": outs["ddim_s"],
            "ddim_parallel_s": outs["ddim_parallel_s"],
        }
        row["pass"] = bool(row["max_uint8_delta"] <= 2
                           and row["mean_uint8_delta"] <= 0.1)
        ok = ok and row["pass"]
        per_class[cname] = row
        print(f"{cname}: {row}", flush=True)
    log["per_class"] = per_class
    log["pass"] = ok
    with open(args.out_name, "w") as f:
        json.dump(log, f, indent=2)
    print(f"wrote {args.out_name} pass={ok}", flush=True)


if __name__ == "__main__":
    main()

"""CLI: reverse-diffusion step visualization
(reference entry /root/reference/generate_steps.py:72-249).

For one CSV row, runs conditional reverse diffusion and writes, for each
selected step, the VAE-decoded pixel image ``pixel/t{i}.png`` and per-channel
min-max-normalized latent grayscales ``latent/chNN/t{i}.png`` under
``<out_root>/<run_name>/``. Snapshots capture x_t BEFORE the denoise step —
``t1000.png`` is pure noise, ``t1.png`` is one step before the final x_0
(generate_steps.py:158-174 convention).

TPU-native: snapshots are accumulated on device inside the scan and fetched
once (pipeline.sample_latent_cond_with_steps), instead of a device→host sync
every step.
"""
from __future__ import annotations

import argparse
import os

import jax
import numpy as np
from PIL import Image

from ..data.geometry import CLASS_NAMES
from ..pipeline import CsvConditionSampler, to_uint8
from .generate_cond import build_pipeline_from_args


def save_latent_channels(z: np.ndarray, step: int, latent_root: str) -> None:
    """(C-last) latent → per-channel min-max grayscale PNGs
    (generate_steps.py:36-66)."""
    z = np.asarray(z)  # (h, w, C)
    for c in range(z.shape[-1]):
        ch_dir = os.path.join(latent_root, f"ch{c:02d}")
        os.makedirs(ch_dir, exist_ok=True)
        ch = z[..., c]
        vmin, vmax = ch.min(), ch.max()
        norm = (ch - vmin) / (vmax - vmin) if vmax > vmin else np.zeros_like(ch)
        Image.fromarray((norm * 255).astype(np.uint8), mode="L").save(
            os.path.join(ch_dir, f"t{step}.png")
        )


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description="Reverse-diffusion step dumps")
    ap.add_argument("--unet_ckpt", type=str, required=True)
    ap.add_argument("--vae_ckpt", type=str, required=True)
    ap.add_argument("--csv_path", type=str, required=True)
    ap.add_argument("--row_index", type=int, default=0)
    ap.add_argument("--class_id", type=int, required=True,
                    help="1=line 2=circle 3=arc")
    ap.add_argument("--num_timesteps", type=int, default=0,
                    help="0 = from checkpoint sidecar, else 1000")
    ap.add_argument("--schedule", choices=["linear", "cosine"], default=None,
                    help="beta schedule; default = the checkpoint's "
                         ".arch.json sidecar, falling back to linear")
    ap.add_argument("--prediction_type", choices=["epsilon", "v"],
                    default=None,
                    help="what the checkpoint predicts; default = the "
                         "sidecar's record, falling back to epsilon")
    ap.add_argument("--guidance_scale", type=float, default=3.0)
    ap.add_argument("--save_every", type=int, default=None,
                    help="e.g. 50 -> 1000,950,...,50,1")
    ap.add_argument("--save_steps", type=int, nargs="*", default=None,
                    help="explicit step list")
    ap.add_argument("--run_name", type=str, default=None)
    ap.add_argument("--out_root", type=str, default="./step_images")
    ap.add_argument("--base_wh", type=float, nargs=2, default=(400, 400))
    ap.add_argument("--base_ch", type=int, default=64)
    ap.add_argument("--time_dim", type=int, default=256)
    ap.add_argument("--z_channels", type=int, default=4)
    ap.add_argument("--vae_base_channels", type=int, default=64)
    ap.add_argument("--geom_dim", type=int, default=12)
    ap.add_argument("--image_size", type=int, nargs=2, default=(224, 224))
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--no_bf16", action="store_true")
    return ap


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    pipe = build_pipeline_from_args(args)
    T = pipe.schedule.num_timesteps  # flag > sidecar > 1000 (see builder)

    if args.save_steps:
        steps = sorted({int(s) for s in args.save_steps}, reverse=True)
    elif args.save_every:
        steps = sorted(
            set(range(T, 0, -max(1, args.save_every))) | {1}, reverse=True
        )
    else:
        steps = list(range(T, 0, -1))  # all steps (heavy)

    run_name = args.run_name or (
        f"class_{CLASS_NAMES[args.class_id]}_row{args.row_index:05d}"
    )
    out_dir = os.path.join(args.out_root, run_name)
    pixel_dir = os.path.join(out_dir, "pixel")
    latent_dir = os.path.join(out_dir, "latent")
    os.makedirs(pixel_dir, exist_ok=True)
    os.makedirs(latent_dir, exist_ok=True)

    sampler = CsvConditionSampler(
        pipe, class_id=args.class_id, base_wh=tuple(args.base_wh),
        image_hw=tuple(args.image_size),
    )
    vals, mask = sampler.load_cond(args.csv_path, count=1,
                                   start=args.row_index)

    _, snaps = pipe.sample_latent_cond_with_steps(
        args.class_id, vals, mask, snapshot_ts=steps,
        guidance_scale=args.guidance_scale,
        key=jax.random.PRNGKey(args.seed),
        image_hw=tuple(args.image_size),
    )  # snaps: (S, 1, h, w, C)

    # decode all snapshots in one batched call, then write PNGs host-side
    imgs = pipe.decode_latents(snaps[:, 0])  # (S, H, W, 3)
    imgs8 = to_uint8(np.clip(imgs, 0.0, 1.0))
    for s_idx, step in enumerate(steps):
        Image.fromarray(imgs8[s_idx]).save(
            os.path.join(pixel_dir, f"t{step}.png")
        )
        save_latent_channels(snaps[s_idx, 0], step, latent_dir)

    print(f"[DONE] saved -> {out_dir} ({len(steps)} steps)")


if __name__ == "__main__":
    main()

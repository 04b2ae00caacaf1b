"""CLI: batch conditional generation
(reference entry /root/reference/generate_cond.py:19-77).

Generates ``image_count`` images per entity class from test CSVs into
``<out_dir>/<run_name>/{line,circle,arc}/pic*.png`` with CFG guidance 3.0 at
T=1000 — the reference's output-directory contract — but with the whole
reverse diffusion as jitted scans on device (see pipeline.py).
"""
from __future__ import annotations

import argparse
import os
import time

import jax

from ..data.geometry import CLASS_NAMES
from ..diffusion import DiffusionSchedule
from ..models import VAE, VAEConfig, CondUNet, UNetConfig
from ..pipeline import CsvConditionSampler, DiffusionPipeline
from ..train.recorder import save_images
from ..utils.env import timestamp_dir_name


def _arch_sidecar(ckpt_path: str) -> dict:
    """``convert_checkpoint`` writes ``<ckpt>.arch.json`` with the inferred
    constructor kwargs; when present it overrides the shape flags so
    imported reference checkpoints need no manual ``--base_ch``/... ."""
    import json

    try:
        with open(ckpt_path + ".arch.json") as f:
            meta = json.load(f)
        print(f"[arch] using {ckpt_path}.arch.json: {meta}")
        return meta
    except OSError:
        return {}


def build_pipeline_from_args(args) -> DiffusionPipeline:
    import jax.numpy as jnp

    dt = jnp.bfloat16 if not args.no_bf16 else jnp.float32
    ua = _arch_sidecar(args.unet_ckpt)
    va = _arch_sidecar(args.vae_ckpt)
    unet = CondUNet(UNetConfig(
        in_ch=ua.get("in_ch", args.z_channels),
        time_dim=ua.get("time_dim", args.time_dim),
        num_classes=ua.get("num_classes", 3),
        geom_dim=ua.get("geom_dim", args.geom_dim),
        with_geom_head=ua.get("with_geom_head", True),
        base_ch=ua.get("base_ch", args.base_ch),
        remove_deep_conv=ua.get("remove_deep_conv", False),
        dtype=dt,
    ))
    vae = VAE(VAEConfig(
        z_channels=va.get("z_channels", args.z_channels),
        base_channels=va.get("base_channels", args.vae_base_channels),
        dtype=dt,
    ))
    ih, iw = args.image_size
    # Sampling-critical settings: explicit flag > checkpoint sidecar >
    # reference default. The trainer records schedule_kind/num_timesteps/
    # prediction_type in <ckpt>.arch.json (ADVICE r3: a cosine-trained
    # checkpoint sampled with linear betas silently degrades).
    schedule_kind = (getattr(args, "schedule", None)
                     or ua.get("schedule_kind", "linear"))
    num_timesteps = (getattr(args, "num_timesteps", 0)
                     or ua.get("num_timesteps", 1000))
    prediction_type = (getattr(args, "prediction_type", None)
                       or ua.get("prediction_type", "epsilon"))
    pipe = DiffusionPipeline.from_checkpoints(
        args.unet_ckpt, args.vae_ckpt, unet, vae,
        schedule=DiffusionSchedule.create(num_timesteps, kind=schedule_kind),
        latent_hw=(ih // 8, iw // 8), image_hw=(ih, iw),
    )
    pipe.prediction_type = prediction_type
    return pipe


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description="Conditional batch generation")
    ap.add_argument("--unet_ckpt", type=str, required=True)
    ap.add_argument("--vae_ckpt", type=str, required=True)
    ap.add_argument("--line_csv", type=str, default=None)
    ap.add_argument("--circle_csv", type=str, default=None)
    ap.add_argument("--arc_csv", type=str, default=None)
    ap.add_argument("--image_count", type=int, default=500)
    ap.add_argument("--guidance_scale", type=float, default=3.0)
    ap.add_argument("--num_timesteps", type=int, default=0,
                    help="0 = from checkpoint sidecar, else 1000")
    ap.add_argument("--schedule", choices=["linear", "cosine"], default=None,
                    help="beta schedule; default = the checkpoint's "
                         ".arch.json sidecar (written by the trainer), "
                         "falling back to linear (reference)")
    ap.add_argument("--out_dir", type=str, default="./generated_by_cond")
    ap.add_argument("--run_name", type=str, default=None)
    ap.add_argument("--batch_size", type=int, default=0,
                    help="scan chunk size; 0 = whole class in one scan")
    ap.add_argument("--base_ch", type=int, default=64)
    ap.add_argument("--time_dim", type=int, default=256)
    ap.add_argument("--z_channels", type=int, default=4)
    ap.add_argument("--vae_base_channels", type=int, default=64)
    ap.add_argument("--geom_dim", type=int, default=12)
    ap.add_argument("--image_size", type=int, nargs=2, default=(224, 224))
    ap.add_argument("--base_wh", type=float, nargs=2, default=(400, 400),
                    help="drawing canvas; pass -1 -1 to infer per CSV")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--no_bf16", action="store_true")
    ap.add_argument("--prediction_type", choices=["epsilon", "v"],
                    default=None,
                    help="what the checkpoint predicts; default = the "
                         "sidecar's record, falling back to epsilon")
    ap.add_argument("--sampler",
                    choices=["ddpm", "ddim", "dpmpp", "ddpm_cached"],
                    default="ddpm",
                    help="ddim/dpmpp = fast samplers (beyond-reference); "
                         "ddpm_cached = full-T DDPM, encoder reused "
                         "across steps; "
                         "dpmpp is 2nd-order DPM-Solver++(2M)")
    ap.add_argument("--num_inference_steps", type=int, default=50,
                    help="model evaluations when --sampler ddim")
    ap.add_argument("--timestep_spacing",
                    choices=["linear", "trailing", "karras"],
                    default="linear",
                    help="fast-sampler step grid: uniform-from-t=1, "
                         "uniform-from-t=T (REQUIRED for distilled "
                         "checkpoints), or EDM rho=7 sigma spacing "
                         "(ddim/dpmpp only)")
    ap.add_argument("--eta", type=float, default=0.0,
                    help="DDIM stochasticity (0 = deterministic)")
    ap.add_argument("--cache_interval", type=int, default=2,
                    help="encoder recompute cadence for --sampler "
                         "ddpm_cached (1 = plain DDPM)")
    return ap


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    run_name = args.run_name or timestamp_dir_name()
    out_root = os.path.join(args.out_dir, run_name)
    os.makedirs(out_root, exist_ok=True)

    pipe = build_pipeline_from_args(args)
    base_wh = None if tuple(args.base_wh) == (-1, -1) else tuple(args.base_wh)
    sampler = CsvConditionSampler(pipe, class_id=1, base_wh=base_wh,
                                  image_hw=tuple(args.image_size))

    csvs = {1: args.line_csv, 2: args.circle_csv, 3: args.arc_csv}
    key = jax.random.PRNGKey(args.seed)
    for cls, csv_path in csvs.items():
        if not csv_path:
            continue
        cname = CLASS_NAMES[cls]
        cls_dir = os.path.join(out_root, cname)
        os.makedirs(cls_dir, exist_ok=True)
        sampler.set_class_id(cls)
        print(f"Making {args.image_count} {cname} images")
        tic = time.time()
        images = sampler.sample(
            csv_path, count=args.image_count,
            guidance_scale=args.guidance_scale,
            key=jax.random.fold_in(key, cls),
            batch_size=args.batch_size,
            method=args.sampler,
            num_inference_steps=args.num_inference_steps,
            cache_interval=args.cache_interval,
            eta=args.eta,
            timestep_spacing=args.timestep_spacing,
        )
        dt = time.time() - tic
        save_images(cls_dir, images)
        print(f"[OK] {cname}: {len(images)} images in {dt:.1f}s "
              f"({len(images) / dt:.2f} img/s) -> {cls_dir}")
    print(f"[OK] output root: {out_root}")


if __name__ == "__main__":
    main()

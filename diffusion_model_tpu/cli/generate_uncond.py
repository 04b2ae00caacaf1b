"""CLI: unconditional pixel-space generation.

Parity with the reference's legacy entry ``Utils.generate``
(/root/reference/utils.py:242-257): load a pixel-space U-Net checkpoint,
sample N images via the full DDPM reverse loop, save ``pic{i+1}.png`` under
``generate_pic/generated_pic/``.
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp

from ..diffusion import DiffusionSchedule
from ..models import CondUNet, UNetConfig
from ..pipeline import DiffusionPipeline
from ..train.checkpoints import load_params
from ..train.recorder import save_images


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description="Unconditional pixel generation")
    ap.add_argument("--unet_ckpt", type=str, required=True)
    ap.add_argument("--num", type=int, default=500)
    ap.add_argument("--size", type=int, nargs=2, default=(32, 32))
    ap.add_argument("--channels", type=int, default=3)
    ap.add_argument("--num_timesteps", type=int, default=1000)
    ap.add_argument("--schedule", choices=["linear", "cosine"],
                    default="linear",
                    help="beta schedule; must match training")
    ap.add_argument("--out_dir", type=str, default="./generate_pic")
    ap.add_argument("--base_ch", type=int, default=64)
    ap.add_argument("--time_dim", type=int, default=256)
    ap.add_argument("--remove_deep_conv", action="store_true")
    ap.add_argument("--batch_size", type=int, default=0)
    ap.add_argument("--seed", type=int, default=0)
    return ap


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    unet = CondUNet(UNetConfig(
        in_ch=args.channels, time_dim=args.time_dim, num_classes=None,
        with_geom_head=False, base_ch=args.base_ch,
        remove_deep_conv=args.remove_deep_conv, dtype=jnp.bfloat16,
    ))
    rng = jax.random.PRNGKey(0)
    h, w = args.size
    dummy = jnp.zeros((1, h, w, args.channels))
    target = unet.init(rng, dummy, jnp.ones((1,), jnp.int32))["params"]
    params = load_params(args.unet_ckpt, target)
    pipe = DiffusionPipeline(
        unet=unet, unet_params=params, vae=None, vae_params=None,
        schedule=DiffusionSchedule.create(args.num_timesteps,
                                          kind=args.schedule),
    )
    image_dir = os.path.join(args.out_dir, "generated_pic")
    os.makedirs(image_dir, exist_ok=True)
    step = args.batch_size or args.num
    images = []
    for s in range(0, args.num, step):
        n = min(step, args.num - s)
        images += pipe.sample_pixel(
            (n, h, w, args.channels),
            key=jax.random.fold_in(jax.random.PRNGKey(args.seed), s),
        )
    save_images(image_dir, images)
    print(f"[OK] {len(images)} images -> {image_dir}")


if __name__ == "__main__":
    main()

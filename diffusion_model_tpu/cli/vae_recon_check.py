"""CLI: VAE reconstruction check (fixes the broken reference script
/root/reference/vae_recon_check.py — see eval/recon_check.py)."""
from __future__ import annotations

import argparse

import jax.numpy as jnp

from ..data import LabelDataset
from ..eval import recon_check
from ..models import VAE, VAEConfig
from ..train.checkpoints import load_params
from .train_vae import parse_items


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description="VAE reconstruction check")
    ap.add_argument("--vae_ckpt", type=str, required=True)
    ap.add_argument("--items", action="append", required=True,
                    help="csv,image_dir,class_id (repeatable)")
    ap.add_argument("--out_dir", type=str, default="recon_check")
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--max_batches", type=int, default=4)
    ap.add_argument("--base_channels", type=int, default=64)
    ap.add_argument("--z_channels", type=int, default=4)
    ap.add_argument("--image_size", type=int, nargs=2, default=(224, 224))
    return ap


def main(argv=None) -> None:
    import jax

    args = build_parser().parse_args(argv)
    vae = VAE(VAEConfig(z_channels=args.z_channels,
                        base_channels=args.base_channels))
    ih, iw = args.image_size
    rng = jax.random.PRNGKey(0)
    target = vae.init({"params": rng, "sample": rng},
                      jnp.zeros((1, ih, iw, 3)))["params"]
    params = load_params(args.vae_ckpt, target)
    ds = LabelDataset(parse_items(args.items), image_size=(ih, iw))
    recon_check(vae, params, ds, out_dir=args.out_dir,
                batch_size=args.batch_size, max_batches=args.max_batches)


if __name__ == "__main__":
    main()

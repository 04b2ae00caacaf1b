"""CLI: stage-1 VAE training (reference entry /root/reference/train_vae.py).

The reference hardcodes its config (epochs=100, lr=1e-3, bs=64, Windows data
paths); here everything is a flag with those defaults, and with no
``--items`` the synthetic renderer provides data.
"""
from __future__ import annotations

import argparse

from ..config import DataConfig, VAETrainConfig
from ..train import train_vae


def parse_items(specs):
    """--items csv,image_dir,class_id (repeatable) → triples."""
    items = []
    for s in specs or []:
        parts = s.split(",")
        if len(parts) != 3:
            raise argparse.ArgumentTypeError(
                f"--items expects csv,image_dir,class_id; got {s!r}"
            )
        items.append((parts[0], parts[1], int(parts[2])))
    return items


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description="Train the stage-1 VAE")
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--patience", type=int, default=8)
    ap.add_argument("--min_delta", type=float, default=5e-7)
    ap.add_argument("--base_channels", type=int, default=64)
    ap.add_argument("--z_channels", type=int, default=4)
    ap.add_argument("--save_dir", type=str, default="./vae")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--no_bf16", action="store_true")
    ap.add_argument("--items", action="append", default=None,
                    help="train data: csv,image_dir,class_id (repeatable)")
    ap.add_argument("--val_items", action="append", default=None)
    ap.add_argument("--image_size", type=int, nargs=2, default=(224, 224))
    ap.add_argument("--synthetic_root", type=str, default="./data")
    ap.add_argument("--synthetic_count", type=int, default=256)
    ap.add_argument("--tp", type=int, default=1,
                    help="tensor-parallel width over the mesh 'model' axis")
    ap.add_argument("--fsdp", action="store_true",
                    help="ZeRO-style param+optimizer sharding over 'data'")
    ap.add_argument("--distributed", action="store_true",
                    help="multi-host: jax.distributed.initialize at startup")
    return ap


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    cfg = VAETrainConfig(
        epochs=args.epochs, lr=args.lr, batch_size=args.batch_size,
        patience=args.patience, min_delta=args.min_delta,
        base_channels=args.base_channels, z_channels=args.z_channels,
        save_dir=args.save_dir, seed=args.seed, bf16=not args.no_bf16,
        tp=args.tp, fsdp=args.fsdp, distributed=args.distributed,
        data=DataConfig(
            train_items=parse_items(args.items),
            val_items=parse_items(args.val_items),
            synthetic_root=args.synthetic_root,
            synthetic_count=args.synthetic_count,
            image_size=tuple(args.image_size),
        ),
    )
    res = train_vae(cfg)
    print(f"[OK] best checkpoint: {res['ckpt_path']}")


if __name__ == "__main__":
    main()

"""CLI: stage-2 conditional latent diffusion training
(reference entry /root/reference/train_latent_cond.py; defaults bs=32,
epochs=200, lr=1e-4, T=1000, cfg_drop=0.1; geom_lambda defaults to 0.01
from the completed 4-λ sweep — see LatentTrainConfig.geom_lambda — where
the reference default is 0)."""
from __future__ import annotations

import argparse

from ..config import DataConfig, LatentTrainConfig
from ..train import train_latent_cond
from .train_vae import parse_items


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        description="Train the conditional latent U-Net with geometry head"
    )
    ap.add_argument("--vae_ckpt", type=str, required=True,
                    help="stage-1 vae_best.msgpack")
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--epochs", type=int, default=200)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--num_timesteps", type=int, default=1000)
    ap.add_argument("--z_channels", type=int, default=4)
    ap.add_argument("--cfg_drop_prob", type=float, default=0.1)
    ap.add_argument("--geom_lambda", type=float, default=0.01,
                    help="geometry-head loss weight; 0.01 won the 4-λ "
                         "sweep (pass 0 for reference behavior)")
    ap.add_argument("--geom_dim", type=int, default=12)
    ap.add_argument("--val_interval", type=int, default=5)
    ap.add_argument("--base_ch", type=int, default=64)
    ap.add_argument("--time_dim", type=int, default=256)
    ap.add_argument("--vae_base_channels", type=int, default=64)
    ap.add_argument("--model_para_dir", type=str, default="./model_para")
    ap.add_argument("--result_root", type=str, default="./result")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--no_bf16", action="store_true")
    ap.add_argument("--post_train_samples", type=int, default=100)
    ap.add_argument("--items", action="append", default=None,
                    help="train data: csv,image_dir,class_id (repeatable)")
    ap.add_argument("--val_items", action="append", default=None)
    ap.add_argument("--image_size", type=int, nargs=2, default=(224, 224))
    ap.add_argument("--synthetic_root", type=str, default="./data")
    ap.add_argument("--synthetic_count", type=int, default=256)
    ap.add_argument("--tp", type=int, default=1,
                    help="tensor-parallel width over the mesh 'model' axis")
    ap.add_argument("--prediction_type", choices=["epsilon", "v"],
                    default="epsilon",
                    help="denoising target; v-trained checkpoints need "
                         "--prediction_type v at generation too")
    ap.add_argument("--schedule", choices=["linear", "cosine"],
                    default="linear", help="noise schedule")
    ap.add_argument("--loss_weighting", choices=["uniform", "min_snr"],
                    default="uniform",
                    help="timestep loss weighting: min_snr = min-SNR-γ "
                         "(Hang et al. 2023); uniform = reference MSE")
    ap.add_argument("--snr_gamma", type=float, default=5.0,
                    help="γ for --loss_weighting min_snr")
    ap.add_argument("--class_balanced", action="store_true",
                    help="equal per-class share in every batch (protects "
                         "thin classes from the global objective)")
    ap.add_argument("--ema_decay", type=float, default=0.0,
                    help="EMA of U-Net weights (e.g. 0.999); also writes "
                         "trained_para_ema.msgpack")
    ap.add_argument("--fsdp", action="store_true",
                    help="ZeRO-style param+optimizer sharding over 'data'")
    ap.add_argument("--remat", action="store_true",
                    help="jax.checkpoint the U-Net training forward "
                         "(recompute activations in backward; HBM headroom)")
    ap.add_argument("--distributed", action="store_true",
                    help="multi-host: jax.distributed.initialize at startup")
    return ap


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    cfg = LatentTrainConfig(
        batch_size=args.batch_size, epochs=args.epochs, lr=args.lr,
        num_timesteps=args.num_timesteps, z_channels=args.z_channels,
        cfg_drop_prob=args.cfg_drop_prob, geom_lambda=args.geom_lambda,
        geom_dim=args.geom_dim, val_interval=args.val_interval,
        vae_ckpt=args.vae_ckpt, vae_base_channels=args.vae_base_channels,
        base_ch=args.base_ch, time_dim=args.time_dim,
        model_para_dir=args.model_para_dir, result_root=args.result_root,
        seed=args.seed, bf16=not args.no_bf16,
        post_train_samples=args.post_train_samples,
        tp=args.tp, fsdp=args.fsdp, remat=args.remat,
        distributed=args.distributed,
        ema_decay=args.ema_decay,
        prediction_type=args.prediction_type, schedule_kind=args.schedule,
        loss_weighting=args.loss_weighting, snr_gamma=args.snr_gamma,
        class_balanced=args.class_balanced,
        data=DataConfig(
            train_items=parse_items(args.items),
            val_items=parse_items(args.val_items),
            synthetic_root=args.synthetic_root,
            synthetic_count=args.synthetic_count,
            image_size=tuple(args.image_size),
        ),
    )
    res = train_latent_cond(cfg)
    print(f"[OK] run dir: {res['run_dir']}")
    print(f"[OK] rolling checkpoint: {res['rolling_ckpt']}")


if __name__ == "__main__":
    main()

"""Dataclass configs for every entry point, defaults = reference constants.

The reference hardcodes configuration at the top of each script (SURVEY.md
§5 "Config / flag system"), including absolute Windows paths; here each entry
point takes one dataclass with CLI overrides. Defaults trace to:
train_vae.py:55-57 (epochs=100, lr=1e-3, bs=64, patience=8, delta=5e-7),
train_latent_cond.py:29-41 (bs=32, epochs=200, lr=1e-4, T=1000, z_ch=4,
cfg_drop=0.1, geom_lambda=0, geom_dim=12, val_interval=5),
generate_cond.py:47-51 (T=1000, 500 images/class, guidance 3.0),
eval_iou_noise.py:304-313 (threshold=128, sigma=2.0).
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple


@dataclasses.dataclass
class DataConfig:
    """Where the (csv, image_dir, class_id) triples come from.

    If ``train_items`` is empty, a synthetic dataset is generated under
    ``synthetic_root`` (the reference's private dataset never shipped; the
    renderer in data/synthetic.py replaces it)."""

    train_items: List[Tuple[str, str, int]] = dataclasses.field(default_factory=list)
    val_items: List[Tuple[str, str, int]] = dataclasses.field(default_factory=list)
    synthetic_root: str = "./data"
    synthetic_count: int = 256
    synthetic_val_count: int = 64
    image_size: Tuple[int, int] = (224, 224)
    drawing_size: Tuple[float, float] = (400.0, 400.0)
    cache_images: bool = True  # decode each image once (uint8 in RAM)


@dataclasses.dataclass
class VAETrainConfig:
    epochs: int = 100
    lr: float = 1e-3
    batch_size: int = 64
    patience: int = 8
    min_delta: float = 5e-7
    base_channels: int = 64
    z_channels: int = 4
    save_dir: str = "./vae"
    seed: int = 0
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    bf16: bool = True
    resume_dir: Optional[str] = None   # Orbax dir to resume from / save to
    profile_dir: Optional[str] = None  # jax.profiler trace output
    tp: int = 1                        # tensor-parallel width (model axis)
    tp_min_dim: int = 256              # smallest feature dim worth sharding
    fsdp: bool = False                 # ZeRO-style param+opt sharding (data axis)
    fsdp_min_size: int = 1 << 16       # smallest leaf (elements) FSDP shards
    distributed: bool = False          # jax.distributed.initialize at start
    # Orbax save cadence; the early-stopping best-val msgpack is unaffected.
    # See LatentTrainConfig.ckpt_interval for why per-epoch saves are costly.
    ckpt_interval: int = 10


@dataclasses.dataclass
class LatentTrainConfig:
    batch_size: int = 32
    epochs: int = 200
    lr: float = 1e-4
    num_timesteps: int = 1000
    z_channels: int = 4
    cfg_drop_prob: float = 0.1
    # Geometry-head loss weight. Reference default is 0 with λ ∈ {0, 0.01,
    # 0.05, 0.1} as the thesis sweep (train_latent_cond.py:151-159,
    # image_tools.py:470-478). Our completed 4-λ sweep
    # (quality_r2/lambda_sweep/sweep_summary.json, 96px/200 epochs/200
    # gen images/class) picks 0.01: val geom MAE drops 1.02 → 0.0137
    # (75×, the head actually learns) while generation quality is the
    # best of the four (line recall 0.57 → 0.69, line far-noise
    # 0.51 → 0.38; circle unchanged; arc −0.11 recall is the one cost).
    # λ=0.05 buys only MAE 0.0137 → 0.0079 but loses circle AND arc
    # (recall −0.09/−0.13 vs λ=0); λ=0.1 is dominated everywhere.
    geom_lambda: float = 0.01
    geom_dim: int = 12
    val_interval: int = 5
    # Regression target: "epsilon" (reference semantics) or "v"
    # (Salimans & Ho 2022). Samplers convert v->eps exactly at inference.
    prediction_type: str = "epsilon"
    # Noise schedule: "linear" (reference) or "cosine" (improved DDPM).
    schedule_kind: str = "linear"
    # Timestep loss weighting: "uniform" (reference plain MSE) or
    # "min_snr" (Hang et al. 2023 min-SNR-γ — clamps easy high-SNR steps
    # so they can't dominate the multi-task objective). Training only;
    # the reported val loss stays uniform so runs are comparable.
    loss_weighting: str = "uniform"
    snr_gamma: float = 5.0
    # Class-balanced batches (device-resident path): every batch carries an
    # equal share of each class — prevents thin classes (line) being traded
    # away by the global objective (round-2 continuation regression).
    class_balanced: bool = False
    # EMA of the U-Net weights (0 = off). When on, the rolling/final saves
    # also write trained_para_ema.msgpack — usually the better sampling
    # checkpoint (standard diffusion practice the reference lacks).
    ema_decay: float = 0.0
    # Checkpoint cadence (rolling best msgpack + Orbax resume state). Every
    # save fetches the full TrainState (params + Adam moments ≈ 280 MB for
    # the flagship U-Net) device→host — through the axon tunnel's ~21 MB/s
    # that is ~13 s, which at small datasets dominated the epoch (measured:
    # 96px/1.5k-image parity run spent 15 s/epoch on a 0.4 s train scan).
    # The final epoch always saves regardless of the interval.
    ckpt_interval: int = 10
    vae_ckpt: str = ""            # path to vae_best.msgpack
    vae_base_channels: int = 64
    base_ch: int = 64
    time_dim: int = 256
    model_para_dir: str = "./model_para"
    result_root: str = "./result"
    seed: int = 0
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    bf16: bool = True
    post_train_samples: int = 100  # sampled as class 1 after training
    resume_dir: Optional[str] = None   # Orbax dir to resume from / save to
    profile_dir: Optional[str] = None  # jax.profiler trace output
    tp: int = 1                        # tensor-parallel width (model axis)
    tp_min_dim: int = 256              # smallest feature dim worth sharding
    fsdp: bool = False                 # ZeRO-style param+opt sharding (data axis)
    fsdp_min_size: int = 1 << 16       # smallest leaf (elements) FSDP shards
    remat: bool = False                # jax.checkpoint the U-Net train fwd
    distributed: bool = False          # jax.distributed.initialize at start


@dataclasses.dataclass
class GenerateConfig:
    unet_ckpt: str = ""
    vae_ckpt: str = ""
    num_timesteps: int = 1000
    image_count: int = 500
    guidance_scale: float = 3.0
    out_dir: str = "./generated_by_cond"
    run_name: Optional[str] = None
    batch_size: int = 0           # 0 = whole class batch in one scan
    base_ch: int = 64
    time_dim: int = 256
    z_channels: int = 4
    vae_base_channels: int = 64
    geom_dim: int = 12
    seed: int = 0
    bf16: bool = True

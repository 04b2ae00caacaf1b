"""Stage-2 latent conditional diffusion training (the core training entry).

Capability parity with /root/reference/train_latent_cond.py:22-261, TPU-first:
the ENTIRE per-batch body — frozen-VAE encode, t ~ U[1, T], q-sample, external
CFG dropout (class label → 0 AND vals/mask zeroed for dropped samples,
train_latent_cond.py:140-145), UNet forward, ε-MSE + λ·masked-geom-MSE, grads,
Adam update — is ONE jitted XLA program with donated state (SURVEY.md §3.2:
"the thing to fuse into one jitted TPU step function"). No micro-batched VAE
encode (train_latent_cond.py:127-133): XLA schedules the whole batch.

Reference bugs consciously fixed (SURVEY.md §7):
- per-epoch reset of the best-loss guard (train_latent_cond.py:112) → the
  rolling ``model_para`` checkpoint tracks the global best batch loss;
- internal vs external cond dropout is unambiguous: the module never drops.
"""
from __future__ import annotations

import functools
import time
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state

from ..config import LatentTrainConfig
from ..data import LabelDataset, PrefetchLoader
from ..data.synthetic import generate_all_classes
from ..diffusion import DiffusionSchedule, q_sample
from ..diffusion.sampling import v_target
from ..models import VAE, VAEConfig, CondUNet, UNetConfig
from ..parallel import (replicate, reshard_train_state, shard_batch,
                        shard_params, training_mesh)
from .checkpoints import load_params, save_params
from .ema import make_train_state
from .losses import (masked_geom_mae, masked_geom_mse, per_class_noise_loss,
                     snr_loss_weights, weighted_noise_mse)
from .recorder import MetricsLogger, record_result


def build_models(cfg: LatentTrainConfig) -> Tuple[VAE, CondUNet]:
    dt = jnp.bfloat16 if cfg.bf16 else jnp.float32
    vae = VAE(VAEConfig(
        z_channels=cfg.z_channels,
        base_channels=cfg.vae_base_channels,
        dtype=dt,
    ))
    unet = CondUNet(UNetConfig(
        in_ch=cfg.z_channels,
        time_dim=cfg.time_dim,
        num_classes=3,
        geom_dim=cfg.geom_dim,
        with_geom_head=True,
        base_ch=cfg.base_ch,
        dtype=dt,
    ))
    return vae, unet


def create_latent_state(
    rng: jax.Array, cfg: LatentTrainConfig, unet: CondUNet,
    latent_hw: Tuple[int, int],
) -> train_state.TrainState:
    B = 2
    dummy_z = jnp.zeros((B, latent_hw[0], latent_hw[1], cfg.z_channels))
    variables = unet.init(
        rng, dummy_z, jnp.ones((B,), jnp.int32), jnp.zeros((B,), jnp.int32),
        jnp.zeros((B, cfg.geom_dim)), jnp.zeros((B, cfg.geom_dim)),
    )
    return make_train_state(
        unet.apply, variables["params"], optax.adam(cfg.lr),
        ema_decay=getattr(cfg, "ema_decay", 0.0),
    )


def _unet_apply(unet: CondUNet, remat: bool):
    """The U-Net forward used inside loss functions; ``remat=True`` wraps
    it in ``jax.checkpoint`` so the backward recomputes activations instead
    of keeping them live — trades ~1/3 more FLOPs for activation memory
    (headroom for batches/models beyond one chip's HBM; standard TPU
    practice, composes with FSDP)."""
    def apply(params, z, t, y, vals, mask):
        return unet.apply({"params": params}, z, t, y, vals, mask)

    return jax.checkpoint(apply) if remat else apply


def _noise_target(schedule: DiffusionSchedule, prediction_type: str,
                  z: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray):
    """The denoising regression target: ε (reference semantics) or v
    (Salimans & Ho 2022; opt-in via cfg.prediction_type="v"). Sampling
    converts v→ε exactly (diffusion.sampling.v_to_eps), so checkpoints
    trained either way run on every sampler."""
    if prediction_type == "v":
        return v_target(schedule, z, t, noise)
    return noise


def _weighted_noise_loss(schedule: DiffusionSchedule, prediction_type: str,
                         weighting: str, snr_gamma: float,
                         eps_pred: jnp.ndarray, target: jnp.ndarray,
                         t: jnp.ndarray) -> jnp.ndarray:
    """Noise-regression loss with optional min-SNR-γ timestep weighting
    (losses.snr_loss_weights). ``weighting`` is static, so the uniform
    default traces to the reference's exact plain-MSE program — the
    weighted path only exists in jaxprs that asked for it."""
    if weighting == "uniform":
        return jnp.mean(jnp.square(eps_pred - target))
    w = snr_loss_weights(schedule, t, prediction_type, weighting, snr_gamma)
    return weighted_noise_mse(eps_pred, target, w)


def make_latent_train_step(
    unet: CondUNet, vae: VAE, schedule: DiffusionSchedule,
    cfg_drop_prob: float, geom_lambda: float, remat: bool = False,
    prediction_type: str = "epsilon", loss_weighting: str = "uniform",
    snr_gamma: float = 5.0,
):
    T = schedule.num_timesteps
    unet_fwd = _unet_apply(unet, remat)

    @functools.partial(jax.jit, donate_argnums=0)
    def step(state: train_state.TrainState, vae_params, batch, key):
        k_vae, k_t, k_noise, k_drop = jax.random.split(key, 4)

        # frozen VAE encode (no grads flow: params are a closure-free arg
        # and the loss never differentiates w.r.t. them)
        z, _ = vae.apply(
            {"params": vae_params}, batch["image"], method=VAE.encode,
            rngs={"sample": k_vae},
        )
        B = z.shape[0]
        t = jax.random.randint(k_t, (B,), 1, T + 1)
        noise = jax.random.normal(k_noise, z.shape, dtype=z.dtype)
        z_noisy = q_sample(schedule, z, t, noise)
        target = _noise_target(schedule, prediction_type, z, t, noise)

        # external CFG dropout (class + numeric together)
        drop = jax.random.uniform(k_drop, (B,)) < cfg_drop_prob
        y_used = jnp.where(drop, 0, batch["y"]).astype(jnp.int32)
        keep = (~drop).astype(jnp.float32)[:, None]
        vals_used = batch["vals"] * keep
        mask_used = batch["mask"] * keep

        def loss_fn(params):
            eps_pred, geom_pred = unet_fwd(
                params, z_noisy, t, y_used, vals_used, mask_used
            )
            loss_noise = _weighted_noise_loss(
                schedule, prediction_type, loss_weighting, snr_gamma,
                eps_pred, target, t)
            # geom supervision targets the TRUE vals, masked by keep
            loss_geom = masked_geom_mse(
                geom_pred, batch["vals"], batch["mask"] * keep
            )
            loss = loss_noise + geom_lambda * loss_geom
            return loss, {"loss_noise": loss_noise, "loss_geom": loss_geom}

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        state = state.apply_gradients(grads=grads)
        return state, {"loss": loss, **aux}

    return step


def make_latent_train_step_indexed(
    unet: CondUNet, vae: VAE, schedule: DiffusionSchedule,
    cfg_drop_prob: float, geom_lambda: float, remat: bool = False,
    prediction_type: str = "epsilon", loss_weighting: str = "uniform",
    snr_gamma: float = 5.0,
):
    """Device-resident data path: gathers (image, vals, mask, y) from
    HBM-resident arrays by int32 indices inside the jitted step."""
    T = schedule.num_timesteps
    unet_fwd = _unet_apply(unet, remat)

    @functools.partial(jax.jit, donate_argnums=0)
    def step(state: train_state.TrainState, vae_params, data, idx, key):
        k_vae, k_t, k_noise, k_drop = jax.random.split(key, 4)
        images = jnp.take(data["image_u8"], idx, axis=0).astype(
            jnp.float32) / 255.0
        vals_b = jnp.take(data["vals"], idx, axis=0)
        mask_b = jnp.take(data["mask"], idx, axis=0)
        y_b = jnp.take(data["y"], idx, axis=0)

        z, _ = vae.apply(
            {"params": vae_params}, images, method=VAE.encode,
            rngs={"sample": k_vae},
        )
        B = z.shape[0]
        t = jax.random.randint(k_t, (B,), 1, T + 1)
        noise = jax.random.normal(k_noise, z.shape, dtype=z.dtype)
        z_noisy = q_sample(schedule, z, t, noise)
        target = _noise_target(schedule, prediction_type, z, t, noise)

        drop = jax.random.uniform(k_drop, (B,)) < cfg_drop_prob
        y_used = jnp.where(drop, 0, y_b).astype(jnp.int32)
        keep = (~drop).astype(jnp.float32)[:, None]
        vals_used = vals_b * keep
        mask_used = mask_b * keep

        def loss_fn(params):
            eps_pred, geom_pred = unet_fwd(
                params, z_noisy, t, y_used, vals_used, mask_used
            )
            loss_noise = _weighted_noise_loss(
                schedule, prediction_type, loss_weighting, snr_gamma,
                eps_pred, target, t)
            loss_geom = masked_geom_mse(geom_pred, vals_b, mask_b * keep)
            loss = loss_noise + geom_lambda * loss_geom
            return loss, {"loss_noise": loss_noise, "loss_geom": loss_geom}

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        state = state.apply_gradients(grads=grads)
        return state, {"loss": loss, **aux}

    return step


def make_latent_eval_step_indexed(
    unet: CondUNet, vae: VAE, schedule: DiffusionSchedule,
    geom_lambda: float, prediction_type: str = "epsilon",
):
    T = schedule.num_timesteps

    @jax.jit
    def step(params, vae_params, data, idx, key):
        k_vae, k_t, k_noise = jax.random.split(key, 3)
        images = jnp.take(data["image_u8"], idx, axis=0).astype(
            jnp.float32) / 255.0
        vals_b = jnp.take(data["vals"], idx, axis=0)
        mask_b = jnp.take(data["mask"], idx, axis=0)
        y_b = jnp.take(data["y"], idx, axis=0).astype(jnp.int32)
        z, _ = vae.apply(
            {"params": vae_params}, images, method=VAE.encode,
            rngs={"sample": k_vae},
        )
        B = z.shape[0]
        t = jax.random.randint(k_t, (B,), 1, T + 1)
        noise = jax.random.normal(k_noise, z.shape, dtype=z.dtype)
        z_noisy = q_sample(schedule, z, t, noise)
        target = _noise_target(schedule, prediction_type, z, t, noise)
        eps_pred, geom_pred = unet.apply(
            {"params": params}, z_noisy, t, y_b, vals_b, mask_b
        )
        loss_noise = jnp.mean(jnp.square(eps_pred - target))
        loss_geom = masked_geom_mse(geom_pred, vals_b, mask_b)
        # same extras as the fused eval scan body so the stepped (CPU)
        # mode reports identical metrics.jsonl fields
        cls_sum, cls_cnt = per_class_noise_loss(eps_pred, target, y_b)
        return {"loss": loss_noise + geom_lambda * loss_geom,
                "loss_noise": loss_noise, "loss_geom": loss_geom,
                "geom_mae": masked_geom_mae(geom_pred, vals_b, mask_b),
                "cls_sum": cls_sum, "cls_cnt": cls_cnt}

    return step


def make_latent_epoch_fn(
    unet: CondUNet, vae: VAE, schedule: DiffusionSchedule,
    cfg_drop_prob: float, geom_lambda: float, remat: bool = False,
    prediction_type: str = "epsilon", loss_weighting: str = "uniform",
    snr_gamma: float = 5.0,
):
    """A full stage-2 training epoch as ONE jitted program (lax.scan over
    index batches of the HBM-resident dataset): frozen-VAE encode, q-sample,
    CFG dropout, UNet fwd/bwd, Adam — ×S steps — in a single dispatch."""
    T = schedule.num_timesteps
    unet_fwd = _unet_apply(unet, remat)

    @functools.partial(jax.jit, donate_argnums=0)
    def epoch_fn(state: train_state.TrainState, vae_params, data,
                 idx_matrix: jnp.ndarray, key: jax.Array):
        def body(state, inp):
            i, idx = inp
            k = jax.random.fold_in(key, i)
            k_vae, k_t, k_noise, k_drop = jax.random.split(k, 4)
            images = jnp.take(data["image_u8"], idx, axis=0).astype(
                jnp.float32) / 255.0
            vals_b = jnp.take(data["vals"], idx, axis=0)
            mask_b = jnp.take(data["mask"], idx, axis=0)
            y_b = jnp.take(data["y"], idx, axis=0)

            z, _ = vae.apply(
                {"params": vae_params}, images, method=VAE.encode,
                rngs={"sample": k_vae},
            )
            B = z.shape[0]
            t = jax.random.randint(k_t, (B,), 1, T + 1)
            noise = jax.random.normal(k_noise, z.shape, dtype=z.dtype)
            z_noisy = q_sample(schedule, z, t, noise)
            target = _noise_target(schedule, prediction_type, z, t, noise)

            drop = jax.random.uniform(k_drop, (B,)) < cfg_drop_prob
            y_used = jnp.where(drop, 0, y_b).astype(jnp.int32)
            keep = (~drop).astype(jnp.float32)[:, None]

            def loss_fn(params):
                eps_pred, geom_pred = unet_fwd(
                    params, z_noisy, t, y_used,
                    vals_b * keep, mask_b * keep,
                )
                loss_noise = _weighted_noise_loss(
                    schedule, prediction_type, loss_weighting, snr_gamma,
                    eps_pred, target, t)
                loss_geom = masked_geom_mse(geom_pred, vals_b, mask_b * keep)
                return loss_noise + geom_lambda * loss_geom

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            return state.apply_gradients(grads=grads), loss

        S = idx_matrix.shape[0]
        state, losses = jax.lax.scan(
            body, state, (jnp.arange(S), idx_matrix)
        )
        return state, losses

    return epoch_fn


def make_latent_eval_epoch_fn(
    unet: CondUNet, vae: VAE, schedule: DiffusionSchedule,
    geom_lambda: float, prediction_type: str = "epsilon",
):
    """Validation epoch as one jitted scan. Besides the scalar loss it
    reports geom-head masked MAE and PER-CLASS ε-MSE (VERDICT r2: the
    line-class regression was invisible to the global objective)."""
    T = schedule.num_timesteps

    @jax.jit
    def epoch_fn(params, vae_params, data, idx_matrix, key):
        def body(_, inp):
            i, idx = inp
            k = jax.random.fold_in(key, i)
            k_vae, k_t, k_noise = jax.random.split(k, 3)
            images = jnp.take(data["image_u8"], idx, axis=0).astype(
                jnp.float32) / 255.0
            vals_b = jnp.take(data["vals"], idx, axis=0)
            mask_b = jnp.take(data["mask"], idx, axis=0)
            y_b = jnp.take(data["y"], idx, axis=0).astype(jnp.int32)
            z, _ = vae.apply(
                {"params": vae_params}, images, method=VAE.encode,
                rngs={"sample": k_vae},
            )
            B = z.shape[0]
            t = jax.random.randint(k_t, (B,), 1, T + 1)
            noise = jax.random.normal(k_noise, z.shape, dtype=z.dtype)
            z_noisy = q_sample(schedule, z, t, noise)
            target = _noise_target(schedule, prediction_type, z, t, noise)
            eps_pred, geom_pred = unet.apply(
                {"params": params}, z_noisy, t, y_b, vals_b, mask_b
            )
            loss = jnp.mean(jnp.square(eps_pred - target)) + (
                geom_lambda * masked_geom_mse(geom_pred, vals_b, mask_b)
            )
            cls_sum, cls_cnt = per_class_noise_loss(eps_pred, target, y_b)
            out = {
                "loss": loss,
                "geom_mae": masked_geom_mae(geom_pred, vals_b, mask_b),
                "cls_sum": cls_sum, "cls_cnt": cls_cnt,
            }
            return None, out

        S = idx_matrix.shape[0]
        _, outs = jax.lax.scan(body, None, (jnp.arange(S), idx_matrix))
        return outs

    return epoch_fn


def make_latent_eval_step(
    unet: CondUNet, vae: VAE, schedule: DiffusionSchedule, geom_lambda: float,
                          prediction_type: str = "epsilon"):
    """Validation: no dropout (conditional performance,
    train_latent_cond.py:195-209)."""
    T = schedule.num_timesteps

    @jax.jit
    def step(params, vae_params, batch, key):
        k_vae, k_t, k_noise = jax.random.split(key, 3)
        z, _ = vae.apply(
            {"params": vae_params}, batch["image"], method=VAE.encode,
            rngs={"sample": k_vae},
        )
        B = z.shape[0]
        t = jax.random.randint(k_t, (B,), 1, T + 1)
        noise = jax.random.normal(k_noise, z.shape, dtype=z.dtype)
        z_noisy = q_sample(schedule, z, t, noise)
        target = _noise_target(schedule, prediction_type, z, t, noise)
        eps_pred, geom_pred = unet.apply(
            {"params": params}, z_noisy, t, batch["y"].astype(jnp.int32),
            batch["vals"], batch["mask"],
        )
        loss_noise = jnp.mean(jnp.square(eps_pred - target))
        loss_geom = masked_geom_mse(geom_pred, batch["vals"], batch["mask"])
        return {"loss": loss_noise + geom_lambda * loss_geom,
                "loss_noise": loss_noise, "loss_geom": loss_geom}

    return step


def _resolve_datasets(cfg: LatentTrainConfig):
    data = cfg.data
    train_items, val_items = list(data.train_items), list(data.val_items)
    if not train_items:
        dirs = generate_all_classes(
            data.synthetic_root, data.synthetic_count,
            image_size=data.image_size, seed=cfg.seed,
        )
        train_items = [(f"{d}/{d.rsplit('/', 1)[-1]}.csv", d, cls)
                       for cls, d in dirs.items()]
    if not val_items:
        dirs = generate_all_classes(
            data.synthetic_root, data.synthetic_val_count,
            image_size=data.image_size, seed=cfg.seed + 1000, suffix="_val",
        )
        val_items = [(f"{d}/{d.rsplit('/', 1)[-1]}.csv", d, cls)
                     for cls, d in dirs.items()]
    mk = functools.partial(
        LabelDataset, image_size=data.image_size,
        drawing_size=data.drawing_size,
        cache_images=data.cache_images,
    )
    return mk(train_items), mk(val_items)


def _write_arch_sidecars(cfg: LatentTrainConfig, ckpt_paths) -> None:
    """Write ``<ckpt>.arch.json`` for every checkpoint path this run will
    produce, recording the model shape AND the sampling-critical training
    choices (schedule_kind / num_timesteps / prediction_type). The inference
    CLIs (generate_cond/generate_steps/serve/distill) read the sidecar and
    default to it, so a cosine- or v-trained checkpoint is sampled with the
    matching ᾱ table and parameterization without manual flags (same key
    names as cli/convert_checkpoint.py's imported-torch sidecars)."""
    import json as _json

    meta = {
        "kind": "unet",
        "in_ch": cfg.z_channels,
        "time_dim": cfg.time_dim,
        "num_classes": 3,
        "geom_dim": cfg.geom_dim,
        "with_geom_head": True,
        "base_ch": cfg.base_ch,
        "schedule_kind": getattr(cfg, "schedule_kind", "linear"),
        "num_timesteps": cfg.num_timesteps,
        "prediction_type": getattr(cfg, "prediction_type", "epsilon"),
    }
    for p in ckpt_paths:
        with open(p + ".arch.json", "w") as f:
            _json.dump(meta, f, indent=2)


def train_latent_cond(cfg: LatentTrainConfig,
                      vae_params=None) -> dict:
    """Full stage-2 run. ``vae_params`` may be passed directly (tests) or
    loaded from ``cfg.vae_ckpt``. Returns a summary dict."""
    import os

    mesh = training_mesh(cfg.batch_size, tp=cfg.tp,
                         distributed=cfg.distributed)
    vae, unet = build_models(cfg)
    schedule = DiffusionSchedule.create(
        cfg.num_timesteps, kind=getattr(cfg, "schedule_kind", "linear"))

    if vae_params is None:
        if not cfg.vae_ckpt:
            raise ValueError("cfg.vae_ckpt is required (stage-1 output)")
        ih, iw = cfg.data.image_size
        dummy = jnp.zeros((1, ih, iw, 3))
        rng0 = jax.random.PRNGKey(0)
        target = vae.init({"params": rng0, "sample": rng0}, dummy)["params"]
        vae_params = load_params(cfg.vae_ckpt, target)
    # pin once: load_params returns host numpy; a host pytree re-uploads
    # the frozen VAE on every jitted epoch/step call (see pipeline.py note)
    vae_params = jax.device_put(vae_params)

    train_ds, val_ds = _resolve_datasets(cfg)

    from .device_data import (
        epoch_fuse_default, epoch_index_matrix,
        epoch_index_matrix_stratified, maybe_device_resident,
        put_index_matrix, put_indices,
    )

    # Residency is decided PER DATASET (a >6GB train set with a small val
    # set must stream training while keeping validation device-resident),
    # so the epoch-fused / per-step functions and loaders are each keyed on
    # their own dataset's residency.
    train_dev = maybe_device_resident(train_ds, mesh)
    val_dev = maybe_device_resident(val_ds, mesh)
    # host-side class labels for stratified (class-balanced) batching
    train_labels = np.asarray([it[-1] for it in train_ds.items], np.int32)
    np_rng = np.random.default_rng(cfg.seed)
    put = functools.partial(shard_batch, mesh=mesh)

    rng = jax.random.PRNGKey(cfg.seed)
    ih, iw = cfg.data.image_size
    state = create_latent_state(rng, cfg, unet, (ih // 8, iw // 8))
    if cfg.tp > 1 or cfg.fsdp:
        # TP: shard the large kernels' output features over 'model'.
        # FSDP: shard every large leaf's widest free dim over 'data'
        # (ZeRO-style; XLA all-gathers at use, reduce-scatters grads).
        # Either way the state is re-created on the sharded params so
        # Adam's moments (and the EMA copy, if enabled) inherit the
        # layout; the frozen VAE is replicated.
        state = make_train_state(
            unet.apply,
            shard_params(state.params, mesh,
                         min_dim=cfg.tp_min_dim, fsdp=cfg.fsdp,
                         fsdp_min_size=cfg.fsdp_min_size),
            optax.adam(cfg.lr),
            ema_decay=getattr(cfg, "ema_decay", 0.0),
        )
        vae_params = replicate(vae_params, mesh)
    # device-resident data composes with two execution strategies: the
    # whole epoch fused into one lax.scan (TPU fast path) or one jitted
    # step per index row (CPU fast path) — see epoch_fuse_default().
    epoch_fused = epoch_fuse_default()
    if train_dev is not None and epoch_fused:
        train_epoch_fn = make_latent_epoch_fn(
            unet, vae, schedule, cfg.cfg_drop_prob, cfg.geom_lambda,
            remat=getattr(cfg, "remat", False),
            prediction_type=getattr(cfg, "prediction_type", "epsilon"),
            loss_weighting=getattr(cfg, "loss_weighting", "uniform"),
            snr_gamma=getattr(cfg, "snr_gamma", 5.0),
        )
    elif train_dev is not None:
        train_step_idx = make_latent_train_step_indexed(
            unet, vae, schedule, cfg.cfg_drop_prob, cfg.geom_lambda,
            remat=getattr(cfg, "remat", False),
            prediction_type=getattr(cfg, "prediction_type", "epsilon"),
            loss_weighting=getattr(cfg, "loss_weighting", "uniform"),
            snr_gamma=getattr(cfg, "snr_gamma", 5.0),
        )
    else:
        train_step = make_latent_train_step(
            unet, vae, schedule, cfg.cfg_drop_prob, cfg.geom_lambda,
            remat=getattr(cfg, "remat", False),
            prediction_type=getattr(cfg, "prediction_type", "epsilon"),
            loss_weighting=getattr(cfg, "loss_weighting", "uniform"),
            snr_gamma=getattr(cfg, "snr_gamma", 5.0),
        )
        train_loader = PrefetchLoader(train_ds, cfg.batch_size, shuffle=True,
                                      seed=cfg.seed, device_put_fn=put)
    if val_dev is not None and epoch_fused:
        eval_epoch_fn = make_latent_eval_epoch_fn(
            unet, vae, schedule, cfg.geom_lambda,
            prediction_type=getattr(cfg, "prediction_type", "epsilon"),
        )
    elif val_dev is not None:
        eval_step_idx = make_latent_eval_step_indexed(
            unet, vae, schedule, cfg.geom_lambda,
            prediction_type=getattr(cfg, "prediction_type", "epsilon"),
        )
    else:
        eval_step = make_latent_eval_step(
            unet, vae, schedule, cfg.geom_lambda,
            prediction_type=getattr(cfg, "prediction_type", "epsilon"))
        val_loader = PrefetchLoader(val_ds, cfg.batch_size, shuffle=False,
                                    device_put_fn=put)

    os.makedirs(cfg.model_para_dir, exist_ok=True)
    rolling_path = os.path.join(cfg.model_para_dir, "trained_para.msgpack")
    ema_on = getattr(cfg, "ema_decay", 0.0) > 0.0
    ema_path = os.path.join(cfg.model_para_dir, "trained_para_ema.msgpack")
    # Sampling-critical training metadata next to every checkpoint this run
    # writes (ADVICE r3: a cosine-trained checkpoint sampled with the linear
    # ᾱ table silently degrades — inference CLIs auto-apply this sidecar).
    _write_arch_sidecars(cfg, [rolling_path] + ([ema_path] if ema_on else []))
    metrics = MetricsLogger(os.path.join(cfg.model_para_dir, "metrics.jsonl"))

    # optional Orbax resume (full state; the reference cannot resume at all)
    manager = None
    start_epoch = 1
    if cfg.resume_dir:
        from .checkpoints import CheckpointManager

        manager = CheckpointManager(cfg.resume_dir, max_to_keep=2)
        try:
            restored = manager.restore({"state": jax.device_get(state),
                                        "epoch": 0})
        except Exception as e:
            raise RuntimeError(
                f"Orbax restore from {cfg.resume_dir} failed. If this run "
                "previously used a different --ema_decay setting (0 vs >0) "
                "the checkpoint's tree structure differs (ema_params "
                "subtree); resume with the original setting."
            ) from e
        if restored is not None:
            state = jax.device_put(restored["state"])
            if cfg.tp > 1 or cfg.fsdp:
                # restored leaves carry no shardings — re-apply TP/FSDP to
                # params, Adam moments, and the EMA copy, or the run
                # silently continues replicated (no ZeRO memory win)
                state = reshard_train_state(
                    state, mesh, min_dim=cfg.tp_min_dim, fsdp=cfg.fsdp,
                    fsdp_min_size=cfg.fsdp_min_size)
            start_epoch = int(restored["epoch"]) + 1
            print(f"Resumed from {cfg.resume_dir} at epoch {start_epoch}")

    from ..utils.profiling import StepTimer, trace

    timer = StepTimer()
    train_losses, val_losses = [], []
    best_batch_loss = float("inf")  # global, not per-epoch (bug fix)
    rolling_dirty = False
    start = time.time()
    profile_ctx = trace(cfg.profile_dir)
    profile_ctx.__enter__()
    for epoch in range(start_epoch, cfg.epochs + 1):
        # per-step losses stay on device; one host sync per epoch so the
        # dispatch queue never stalls on a device round-trip
        if train_dev is not None:
            rng, sk = jax.random.split(rng)
            if getattr(cfg, "class_balanced", False):
                idx = epoch_index_matrix_stratified(
                    train_labels, cfg.batch_size, np_rng)
            else:
                idx = epoch_index_matrix(len(train_ds), cfg.batch_size,
                                         np_rng)
            if epoch_fused:
                state, losses = train_epoch_fn(
                    state, vae_params, train_dev,
                    put_index_matrix(idx, mesh), sk
                )
            else:
                # same RNG stream as the fused scan: one epoch key,
                # folded per step (the step splits it 4-way internally)
                losses = []
                for s_i in range(idx.shape[0]):
                    state, m = train_step_idx(
                        state, vae_params, train_dev,
                        put_indices(idx[s_i], mesh),
                        jax.random.fold_in(sk, s_i),
                    )
                    losses.append(m["loss"])
            timer.tick(0)
            timer.tick(idx.size)
        else:
            losses = []
            for batch in train_loader:
                rng, sk = jax.random.split(rng)
                state, m = train_step(state, vae_params, batch, sk)
                losses.append(m["loss"])
                timer.tick(batch["image"].shape[0])
        epoch_losses = np.asarray(jax.device_get(losses), dtype=np.float64)
        # Rolling best checkpoint, gated on ckpt_interval (the reference
        # writes ~100 MB per improving batch, train_latent_cond.py:168-170;
        # even once per epoch, the params fetch through the axon tunnel is
        # ~4 s — see LatentTrainConfig.ckpt_interval).
        ckpt_epoch = (epoch % cfg.ckpt_interval == 0) or epoch == cfg.epochs
        if epoch_losses.size and float(epoch_losses.min()) < best_batch_loss:
            best_batch_loss = float(epoch_losses.min())
            rolling_dirty = True
        if ckpt_epoch and rolling_dirty:
            save_params(rolling_path, state.params)
            if ema_on:
                save_params(ema_path, state.ema_params)
            rolling_dirty = False
        train_loss = float(epoch_losses.mean()) if epoch_losses.size else 0.0
        train_losses.append(train_loss)

        val_extra = {}
        if epoch % cfg.val_interval == 0:
            if val_dev is not None:
                rng, sk = jax.random.split(rng)
                vidx = epoch_index_matrix(len(val_ds), cfg.batch_size,
                                          np_rng, shuffle=False)
                if epoch_fused:
                    vouts = jax.device_get(eval_epoch_fn(
                        state.params, vae_params, val_dev,
                        put_index_matrix(vidx, mesh), sk))
                else:
                    rows = [eval_step_idx(
                        state.params, vae_params, val_dev,
                        put_indices(vidx[i], mesh),
                        jax.random.fold_in(sk, i),
                    ) for i in range(vidx.shape[0])]
                    rows = jax.device_get(rows)
                    vouts = {k: np.stack([r[k] for r in rows])
                             for k in rows[0]}
                val_arr = np.asarray(vouts["loss"], dtype=np.float64)
                cls_sum = np.asarray(vouts["cls_sum"]).sum(axis=0)
                cls_cnt = np.maximum(
                    np.asarray(vouts["cls_cnt"]).sum(axis=0), 1.0)
                val_extra = {
                    "val_geom_mae": round(
                        float(np.mean(vouts["geom_mae"])), 5),
                    "val_loss_line": round(float(cls_sum[0] / cls_cnt[0]), 6),
                    "val_loss_circle": round(
                        float(cls_sum[1] / cls_cnt[1]), 6),
                    "val_loss_arc": round(float(cls_sum[2] / cls_cnt[2]), 6),
                }
            else:
                vlosses = []
                for batch in val_loader:
                    rng, sk = jax.random.split(rng)
                    m = eval_step(state.params, vae_params, batch, sk)
                    vlosses.append(m["loss"])
                val_arr = np.asarray(jax.device_get(vlosses),
                                     dtype=np.float64)
            val_loss = float(val_arr.mean()) if val_arr.size else 0.0
            val_losses.append(val_loss)
            print(f"[Epoch {epoch:03d}] train={train_loss:.6f}  "
                  f"val={val_loss:.6f}" + "".join(
                      f"  {k[4:]}={v}" for k, v in val_extra.items()),
                  flush=True)
        else:
            val_losses.append(float("nan"))
            print(f"[Epoch {epoch:03d}] train={train_loss:.6f}  val=skip",
                  flush=True)
        perf = timer.summary()
        metrics.log(kind="epoch", epoch=epoch, train_loss=train_loss,
                    val_loss=val_losses[-1],
                    steps_per_sec=round(perf["steps_per_sec"], 3),
                    images_per_sec=round(perf["items_per_sec"], 2),
                    elapsed_s=time.time() - start, **val_extra)
        if manager is not None and ckpt_epoch:
            manager.save(epoch, {"state": jax.device_get(state),
                                 "epoch": epoch}, force=True)

    profile_ctx.__exit__(None, None, None)
    if manager is not None:
        manager.wait()
    learning_time = time.time() - start

    # post-training sample (train_latent_cond.py:227-244): 100 class-1 images
    images = None
    if cfg.post_train_samples > 0:
        try:
            from ..pipeline import DiffusionPipeline

            pipe = DiffusionPipeline(
                unet=unet, unet_params=state.params, vae=vae,
                vae_params=vae_params, schedule=schedule,
            )
            images = pipe.sample_latent_cond(
                class_counts={1: cfg.post_train_samples},
                guidance_scale=0.0, key=jax.random.fold_in(rng, 99),
                image_hw=cfg.data.image_size,
            )
        except Exception as e:  # parity: continue without images
            print(f"Sampling failed, continue without images: {e}")

    run_dir = record_result(
        result_root=cfg.result_root,
        model_params=state.params,
        train_losses=train_losses,
        val_losses=val_losses,
        images=images,
        batch_size=cfg.batch_size,
        num_timesteps=cfg.num_timesteps,
        epochs=cfg.epochs,
        learning_rate=cfg.lr,
        device=jax.default_backend(),
        learning_time=learning_time,
        geom_lambda=cfg.geom_lambda,
        cfg_drop_prob=cfg.cfg_drop_prob,
        network="diffusion_model_tpu.models.unet.CondUNet(with_geom_head)",
    )
    if ema_on:  # final EMA save regardless of the rolling-best gate
        save_params(ema_path, state.ema_params)
    metrics.close()
    return {
        "run_dir": run_dir,
        "rolling_ckpt": rolling_path,
        **({"ema_ckpt": ema_path} if ema_on else {}),
        "train_losses": train_losses,
        "val_losses": val_losses,
        "learning_time": learning_time,
        "final_state": state,
        "unet": unet,
        "vae": vae,
        "vae_params": vae_params,
        "schedule": schedule,
    }

"""Stage-1 VAE training: jitted step functions + DP epoch loop.

Capability parity with /root/reference/train_vae.py:17-131, TPU-first:
the whole per-batch body (forward, loss, grads, Adam update) is ONE jitted
XLA program with donated state; batches are sharded over the mesh's ``data``
axis so gradients all-reduce over ICI inside the step.

Artifacts (train_vae.py:96-103,130-131): ``vae/<ts>/vae_best.msgpack`` via
early stopping (patience=8, delta=5e-7) + ``losses_train_val.{png,csv}``.
The reference's 2-tuple unpack of a 3-tuple batch (train_vae.py:21,40) is a
documented bug, not replicated — the VAE consumes the image tensor only.
"""
from __future__ import annotations

import functools
import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state

from ..config import VAETrainConfig
from ..data import CaptionDataset, LabelDataset, PrefetchLoader
from ..data.synthetic import generate_all_classes
from ..models import VAE, VAEConfig
from ..parallel import shard_batch, shard_params, training_mesh
from .checkpoints import save_params
from .early_stopping import EarlyStopping
from .recorder import MetricsLogger, save_train_val_loss_csv, save_train_val_loss_graph


def create_vae_state(
    rng: jax.Array, cfg: VAETrainConfig, image_hw: Tuple[int, int] = (224, 224)
) -> Tuple[VAE, train_state.TrainState]:
    model = VAE(VAEConfig(
        z_channels=cfg.z_channels,
        base_channels=cfg.base_channels,
        dtype=jnp.bfloat16 if cfg.bf16 else jnp.float32,
    ))
    dummy = jnp.zeros((1, image_hw[0], image_hw[1], 3), jnp.float32)
    variables = model.init({"params": rng, "sample": rng}, dummy)
    state = train_state.TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        tx=optax.adam(cfg.lr),
    )
    return model, state


def make_vae_train_step(model: VAE):
    @functools.partial(jax.jit, donate_argnums=0)
    def step(state: train_state.TrainState, images: jnp.ndarray,
             key: jax.Array):
        def loss_fn(params):
            _, _, loss, aux = model.apply(
                {"params": params}, images, rngs={"sample": key}
            )
            return loss, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        state = state.apply_gradients(grads=grads)
        return state, {"loss": loss, **aux}

    return step


def make_vae_train_step_indexed(model: VAE):
    """Device-resident data path: the step gathers its batch from a
    HBM-resident uint8 dataset by int32 indices and converts to float
    in-program — per-step host→device traffic is just (B,) indices."""

    @functools.partial(jax.jit, donate_argnums=0)
    def step(state: train_state.TrainState, images_u8: jnp.ndarray,
             idx: jnp.ndarray, key: jax.Array):
        images = jnp.take(images_u8, idx, axis=0).astype(jnp.float32) / 255.0

        def loss_fn(params):
            _, _, loss, aux = model.apply(
                {"params": params}, images, rngs={"sample": key}
            )
            return loss, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        state = state.apply_gradients(grads=grads)
        return state, {"loss": loss, **aux}

    return step


def make_vae_eval_step_indexed(model: VAE):
    @jax.jit
    def step(params, images_u8: jnp.ndarray, idx: jnp.ndarray,
             key: jax.Array):
        images = jnp.take(images_u8, idx, axis=0).astype(jnp.float32) / 255.0
        _, _, loss, aux = model.apply(
            {"params": params}, images, rngs={"sample": key}
        )
        return {"loss": loss, **aux}

    return step


def make_vae_epoch_fn(model: VAE):
    """A full training epoch as ONE jitted program: lax.scan over index
    batches of the HBM-resident dataset. One host dispatch per epoch — the
    per-step Python/tunnel round-trip (which dwarfs the device time of a
    single step) disappears entirely."""

    @functools.partial(jax.jit, donate_argnums=0)
    def epoch_fn(state: train_state.TrainState, images_u8: jnp.ndarray,
                 idx_matrix: jnp.ndarray, key: jax.Array):
        def body(state, inp):
            i, idx = inp
            sk = jax.random.fold_in(key, i)
            images = jnp.take(images_u8, idx, axis=0).astype(
                jnp.float32) / 255.0

            def loss_fn(params):
                _, _, loss, _ = model.apply(
                    {"params": params}, images, rngs={"sample": sk}
                )
                return loss

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            return state.apply_gradients(grads=grads), loss

        S = idx_matrix.shape[0]
        state, losses = jax.lax.scan(
            body, state, (jnp.arange(S), idx_matrix)
        )
        return state, losses

    return epoch_fn


def make_vae_eval_epoch_fn(model: VAE):
    @jax.jit
    def epoch_fn(params, images_u8: jnp.ndarray, idx_matrix: jnp.ndarray,
                 key: jax.Array):
        def body(_, inp):
            i, idx = inp
            images = jnp.take(images_u8, idx, axis=0).astype(
                jnp.float32) / 255.0
            _, _, loss, _ = model.apply(
                {"params": params}, images,
                rngs={"sample": jax.random.fold_in(key, i)},
            )
            return None, loss

        S = idx_matrix.shape[0]
        _, losses = jax.lax.scan(body, None, (jnp.arange(S), idx_matrix))
        return losses

    return epoch_fn


def make_vae_eval_step(model: VAE):
    @jax.jit
    def step(params, images: jnp.ndarray, key: jax.Array):
        _, _, loss, aux = model.apply(
            {"params": params}, images, rngs={"sample": key}
        )
        return {"loss": loss, **aux}

    return step


def _resolve_datasets(cfg: VAETrainConfig):
    """Build train/val datasets; generate synthetic data when none given."""
    data = cfg.data
    train_items, val_items = list(data.train_items), list(data.val_items)
    if not train_items:
        dirs = generate_all_classes(
            data.synthetic_root, data.synthetic_count,
            image_size=data.image_size, seed=cfg.seed,
        )
        train_items = [
            (f"{d}/{d.rsplit('/', 1)[-1]}.csv", d, cls)
            for cls, d in dirs.items()
        ]
    if not val_items:
        dirs = generate_all_classes(
            data.synthetic_root, data.synthetic_val_count,
            image_size=data.image_size, seed=cfg.seed + 1000, suffix="_val",
        )
        val_items = [
            (f"{d}/{d.rsplit('/', 1)[-1]}.csv", d, cls)
            for cls, d in dirs.items()
        ]

    def build(items):
        # caption CSVs (ClipDataset parity) or geometry CSVs both work; the
        # VAE only needs images, so LabelDataset covers both layouts here.
        try:
            return LabelDataset(items, image_size=data.image_size,
                                drawing_size=data.drawing_size,
                                cache_images=data.cache_images)
        except Exception:
            return CaptionDataset(items, image_size=data.image_size)

    return build(train_items), build(val_items)


def train_vae(cfg: VAETrainConfig, out_dir: Optional[str] = None) -> dict:
    """Full stage-1 training run. Returns a summary dict (paths, losses)."""
    import os

    from ..utils.env import timestamp_dir_name

    mesh = training_mesh(cfg.batch_size, tp=cfg.tp,
                         distributed=cfg.distributed)
    train_ds, val_ds = _resolve_datasets(cfg)

    # device-resident data when it fits in HBM (indices-only steps);
    # streaming prefetch loader otherwise
    from .device_data import (
        epoch_index_matrix, maybe_device_resident, put_index_matrix,
    )

    # Residency is decided PER DATASET, so each side's step functions and
    # loader are keyed on that dataset's own residency (a huge train set
    # with a small val set streams training but keeps val device-resident).
    train_dev = maybe_device_resident(train_ds, mesh)
    val_dev = maybe_device_resident(val_ds, mesh)
    np_rng = np.random.default_rng(cfg.seed)
    put = functools.partial(shard_batch, mesh=mesh)

    rng = jax.random.PRNGKey(cfg.seed)
    model, state = create_vae_state(rng, cfg, cfg.data.image_size)
    if cfg.tp > 1 or cfg.fsdp:
        # TP: shard large kernels over 'model'. FSDP: shard large leaves
        # over 'data' (ZeRO-style). Re-init the optimizer so Adam moments
        # inherit the sharded layout either way.
        state = train_state.TrainState.create(
            apply_fn=model.apply,
            params=shard_params(state.params, mesh,
                                min_dim=cfg.tp_min_dim, fsdp=cfg.fsdp,
                                fsdp_min_size=cfg.fsdp_min_size),
            tx=optax.adam(cfg.lr),
        )
    if train_dev is not None:
        train_epoch_fn = make_vae_epoch_fn(model)
    else:
        train_step = make_vae_train_step(model)
        train_loader = PrefetchLoader(
            train_ds, cfg.batch_size, shuffle=True, seed=cfg.seed,
            device_put_fn=put,
        )
    if val_dev is not None:
        eval_epoch_fn = make_vae_eval_epoch_fn(model)
    else:
        eval_step = make_vae_eval_step(model)
        val_loader = PrefetchLoader(
            val_ds, cfg.batch_size, shuffle=False, device_put_fn=put,
        )

    out_dir = out_dir or os.path.join(cfg.save_dir, timestamp_dir_name())
    os.makedirs(out_dir, exist_ok=True)
    ckpt_path = os.path.join(out_dir, "vae_best.msgpack")

    # state.params is mutated by donation; capture lazily for the saver
    current = {"state": state}
    stopper = EarlyStopping(
        patience=cfg.patience, delta=cfg.min_delta, verbose=True,
        save_fn=lambda: save_params(ckpt_path, current["state"].params),
    )
    metrics = MetricsLogger(os.path.join(out_dir, "metrics.jsonl"))

    # optional Orbax resume (params + opt state + step; reference can only
    # save bare weights — SURVEY.md §5)
    manager = None
    start_epoch = 1
    if cfg.resume_dir:
        from .checkpoints import CheckpointManager

        manager = CheckpointManager(cfg.resume_dir, max_to_keep=2)
        restored = manager.restore({"state": jax.device_get(state),
                                    "epoch": 0})
        if restored is not None:
            # static fields (apply_fn, tx) come from the target structure;
            # arrays come from the checkpoint
            state = jax.device_put(restored["state"])
            if cfg.tp > 1 or cfg.fsdp:
                # restored leaves carry no shardings — re-apply TP/FSDP
                from ..parallel import reshard_train_state

                state = reshard_train_state(
                    state, mesh, min_dim=cfg.tp_min_dim, fsdp=cfg.fsdp,
                    fsdp_min_size=cfg.fsdp_min_size)
            current["state"] = state
            start_epoch = int(restored["epoch"]) + 1
            print(f"Resumed from {cfg.resume_dir} at epoch {start_epoch}")

    from ..utils.profiling import StepTimer, trace

    timer = StepTimer()
    history = {"train": [], "val": []}
    start = time.time()
    step_count = 0
    profile_ctx = trace(cfg.profile_dir)
    profile_ctx.__enter__()
    for epoch in range(start_epoch, cfg.epochs + 1):
        # keep per-step losses as device scalars — forcing them to host every
        # step would serialize dispatch on the device round-trip; one sync at
        # epoch end lets XLA run the whole epoch asynchronously
        if train_dev is not None:
            # ONE dispatch for the whole epoch (lax.scan over index batches)
            rng, sk = jax.random.split(rng)
            idx = epoch_index_matrix(len(train_ds), cfg.batch_size, np_rng)
            state, losses = train_epoch_fn(
                state, train_dev["image_u8"], put_index_matrix(idx, mesh), sk
            )
            current["state"] = state
            train_loss = float(np.mean(jax.device_get(losses)))
            step_count += idx.shape[0]
            timer.tick(0)
            timer.tick(idx.size)  # whole epoch in one tick
        else:
            losses = []
            for batch in train_loader:
                rng, sk = jax.random.split(rng)
                state, m = train_step(state, batch["image"], sk)
                current["state"] = state
                losses.append(m["loss"])
                step_count += 1
                timer.tick(batch["image"].shape[0])
            train_loss = (float(np.mean(jax.device_get(losses)))
                          if losses else 0.0)

        if val_dev is not None:
            rng, sk = jax.random.split(rng)
            vidx = epoch_index_matrix(len(val_ds), cfg.batch_size, np_rng,
                                      shuffle=False)
            vlosses = eval_epoch_fn(state.params, val_dev["image_u8"],
                                    put_index_matrix(vidx, mesh), sk)
            val_loss = float(np.mean(jax.device_get(vlosses)))
        else:
            vlosses = []
            for batch in val_loader:
                rng, sk = jax.random.split(rng)
                m = eval_step(state.params, batch["image"], sk)
                vlosses.append(m["loss"])
            val_loss = (float(np.mean(jax.device_get(vlosses)))
                        if vlosses else 0.0)

        history["train"].append(train_loss)
        history["val"].append(val_loss)
        perf = timer.summary()
        metrics.log(kind="epoch", epoch=epoch, train_loss=train_loss,
                    val_loss=val_loss, steps=step_count,
                    steps_per_sec=round(perf["steps_per_sec"], 3),
                    images_per_sec=round(perf["items_per_sec"], 2),
                    elapsed_s=time.time() - start)
        print(f"[Epoch {epoch:03d}] train={train_loss:.6f}  "
              f"val={val_loss:.6f}", flush=True)
        if manager is not None and (
                epoch % cfg.ckpt_interval == 0 or epoch == cfg.epochs):
            manager.save(epoch, {"state": jax.device_get(current["state"]),
                                 "epoch": epoch}, force=True)

        stopper(val_loss)
        if stopper.early_stop:
            print(">>> Early stopping triggered.")
            break

    profile_ctx.__exit__(None, None, None)
    if manager is not None:
        manager.wait()
    elapsed = time.time() - start
    print(f"Training finished in {elapsed / 60:.1f} min")
    save_train_val_loss_graph(out_dir, history["train"], history["val"])
    save_train_val_loss_csv(out_dir, history["train"], history["val"])
    metrics.close()
    return {
        "out_dir": out_dir,
        "ckpt_path": ckpt_path,
        "train_losses": history["train"],
        "val_losses": history["val"],
        "elapsed_s": elapsed,
        "final_state": current["state"],
        "model": model,
    }

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
from ..parallel import mesh_for_batch, shard_batch
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

    mesh = mesh_for_batch(cfg.batch_size)
    train_ds, val_ds = _resolve_datasets(cfg)
    put = functools.partial(shard_batch, mesh=mesh)
    train_loader = PrefetchLoader(
        train_ds, cfg.batch_size, shuffle=True, seed=cfg.seed,
        device_put_fn=put,
    )
    val_loader = PrefetchLoader(
        val_ds, cfg.batch_size, shuffle=False, device_put_fn=put,
    )

    rng = jax.random.PRNGKey(cfg.seed)
    model, state = create_vae_state(rng, cfg, cfg.data.image_size)
    train_step = make_vae_train_step(model)
    eval_step = make_vae_eval_step(model)

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
            state = current["state"] = jax.device_put(restored["state"])
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
        tot, cnt = 0.0, 0
        for batch in train_loader:
            rng, sk = jax.random.split(rng)
            state, m = train_step(state, batch["image"], sk)
            current["state"] = state
            tot += float(m["loss"])
            cnt += 1
            step_count += 1
            timer.tick(batch["image"].shape[0])
        train_loss = tot / max(cnt, 1)

        vt, vc = 0.0, 0
        for batch in val_loader:
            rng, sk = jax.random.split(rng)
            m = eval_step(state.params, batch["image"], sk)
            vt += float(m["loss"])
            vc += 1
        val_loss = vt / max(vc, 1)

        history["train"].append(train_loss)
        history["val"].append(val_loss)
        perf = timer.summary()
        metrics.log(kind="epoch", epoch=epoch, train_loss=train_loss,
                    val_loss=val_loss, steps=step_count,
                    steps_per_sec=round(perf["steps_per_sec"], 3),
                    images_per_sec=round(perf["items_per_sec"], 2),
                    elapsed_s=time.time() - start)
        print(f"[Epoch {epoch:03d}] train={train_loss:.6f}  "
              f"val={val_loss:.6f}")
        if manager is not None:
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

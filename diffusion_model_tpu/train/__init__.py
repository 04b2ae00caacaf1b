from .losses import masked_geom_mse
from .early_stopping import EarlyStopping
from .checkpoints import CheckpointManager, load_params, save_params
from .ema import EMATrainState, make_train_state
from .recorder import (
    MetricsLogger,
    record_result,
    save_images,
    save_train_val_loss_csv,
    save_train_val_loss_graph,
)
from .train_vae import (
    create_vae_state,
    make_vae_eval_step,
    make_vae_train_step,
    train_vae,
)
from .distill import (
    distill_grid,
    implied_x0_target,
    make_distill_step,
    progressive_distill,
    stage_tables,
)
from .train_latent import (
    build_models,
    create_latent_state,
    make_latent_eval_step,
    make_latent_train_step,
    train_latent_cond,
)

__all__ = [
    "masked_geom_mse", "EarlyStopping", "CheckpointManager", "load_params",
    "save_params", "EMATrainState", "make_train_state", "MetricsLogger", "record_result", "save_images",
    "save_train_val_loss_csv", "save_train_val_loss_graph",
    "create_vae_state", "make_vae_eval_step", "make_vae_train_step",
    "train_vae", "build_models", "create_latent_state",
    "make_latent_eval_step", "make_latent_train_step", "train_latent_cond",
    "distill_grid", "implied_x0_target", "make_distill_step",
    "progressive_distill", "stage_tables",
]

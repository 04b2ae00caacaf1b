"""Training losses (reference /root/reference/losses/geom_losses.py:4-17)."""
from __future__ import annotations

import jax.numpy as jnp


def masked_geom_mse(
    geom_pred: jnp.ndarray,   # (B, K)
    geom_gt: jnp.ndarray,     # (B, K)
    geom_mask: jnp.ndarray,   # (B, K) 0/1
    eps: float = 1e-6,
) -> jnp.ndarray:
    """sum(mask · (pred − gt)²) / max(sum(mask), eps)."""
    num = jnp.sum(jnp.square(geom_pred - geom_gt) * geom_mask)
    den = jnp.maximum(jnp.sum(geom_mask), eps)
    return num / den


def masked_geom_mae(
    geom_pred: jnp.ndarray,   # (B, K)
    geom_gt: jnp.ndarray,     # (B, K)
    geom_mask: jnp.ndarray,   # (B, K) 0/1
    eps: float = 1e-6,
) -> jnp.ndarray:
    """Masked mean absolute error of the geometry-head prediction —
    the geom-accuracy metric (in normalized [0,1] coordinate units) reported
    alongside the val loss. No reference counterpart (the reference never
    measures geom-head accuracy); defined to mirror ``masked_geom_mse``."""
    num = jnp.sum(jnp.abs(geom_pred - geom_gt) * geom_mask)
    den = jnp.maximum(jnp.sum(geom_mask), eps)
    return num / den


def per_class_noise_loss(
    eps_pred: jnp.ndarray,    # (B, ...) prediction
    noise: jnp.ndarray,       # (B, ...) target
    y: jnp.ndarray,           # (B,) class ids (1-indexed)
    num_classes: int = 3,
) -> tuple:
    """Per-class ε-MSE sums and counts for class-imbalance diagnostics
    (VERDICT r2: line-class regressions were invisible to the global loss).

    Returns ``(sums, counts)`` each shaped (num_classes,), class c at
    index c-1; divide after accumulating over steps."""
    per_sample = jnp.mean(
        jnp.square(eps_pred - noise).reshape(eps_pred.shape[0], -1), axis=1
    )
    onehot = (y[:, None] == jnp.arange(1, num_classes + 1)[None, :])
    onehot = onehot.astype(per_sample.dtype)
    return per_sample @ onehot, jnp.sum(onehot, axis=0)

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

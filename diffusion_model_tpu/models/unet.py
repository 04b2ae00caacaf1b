"""The diffusion U-Net family as ONE config-driven Flax module.

Covers the reference's four variants (SURVEY.md §2) without code duplication:

- ``Unet``                  (/root/reference/models/unet.py:101-170):
  ``num_classes=None, with_geom_head=False``
- ``UnetCond``              (/root/reference/models/unet_cond.py:102-216):
  ``num_classes=3`` (+1 implicit null label 0 for CFG)
- ``UnetCondWithGeomHead``  (/root/reference/models/unet_cond_geom.py:26-100):
  ``with_geom_head=True`` — returns ``(eps_pred, geom_pred)``
- the legacy ``unet2.py`` is unused in the reference (only a commented
  import, utils.py:12) and intentionally not rebuilt; documented here.

Channel plan (unet.py:107-129): inc ResBlock(in→64); Down 64→128 +Attn(128);
Down 128→256 +Attn(256); Down 256→256 +Attn(256); bottleneck 256→512→512→256
(or 256→256 ×2 with ``remove_deep_conv``); Up(512→128)+Attn, Up(256→64)+Attn,
Up(128→64)+Attn; 1×1 out conv to ``in_ch``.

Conditioning (unet_cond.py:121-129,163-167,197-216):
- class embedding over ``num_classes + 1`` ids, id 0 = unconditional (CFG);
- numeric condition MLP ``Linear(2K → time_dim) → SiLU → Linear``; the
  reference hardcodes K=12 regardless of ``geom_dim`` (unet_cond.py:125) —
  fixed here to ``2 * geom_dim``;
- fused embedding = sinusoidal(t) + class_emb(y) (+ cond_emb), fed to every
  Down/Up stage.

CFG label/condition dropout lives in the TRAIN STEP (like the trained
reference model, train_latent_cond.py:140-145), not inside the module —
keeps the module a pure function of its inputs.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.stage import fused_stage
from .layers import (
    AttentionBlock,
    Down,
    ResBlock,
    ResBlockParams,
    Up,
    sinusoidal_time_embedding,
)

Dtype = Any


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_ch: int = 4
    time_dim: int = 256
    num_classes: Optional[int] = 3   # None → unconditional model
    geom_dim: int = 12
    with_geom_head: bool = False
    geom_hidden: int = 256
    remove_deep_conv: bool = False
    base_ch: int = 64                # reference fixes 64; configurable here
    num_heads: int = 4
    dtype: Any = jnp.float32
    use_pallas: Optional[bool] = None


class GeomHead(nn.Module):
    """GAP over H,W → Dense(64→hidden) → SiLU → Dense(hidden→geom_dim)
    (unet_cond_geom.py:8-23)."""

    geom_dim: int
    hidden: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feat: jnp.ndarray) -> jnp.ndarray:
        g = feat.mean(axis=(1, 2))  # NHWC GAP → (B, C)
        g = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(g)
        g = jax.nn.silu(g)
        return nn.Dense(self.geom_dim, dtype=self.dtype, name="fc2")(g)


class CondUNet(nn.Module):
    """Config-driven conditional diffusion U-Net with optional geometry head.

    Call signature: ``(x, t, y=None, cond_vals=None, cond_mask=None)`` where
    x is NHWC ``(B, H, W, in_ch)``, ``t`` is 1-indexed (B,), ``y`` is (B,)
    int class ids (0 = null), vals/mask are (B, geom_dim).

    Returns ``eps_pred`` or ``(eps_pred, geom_pred)`` when
    ``with_geom_head=True``.
    """

    config: UNetConfig

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        t: jnp.ndarray,
        y: Optional[jnp.ndarray] = None,
        cond_vals: Optional[jnp.ndarray] = None,
        cond_mask: Optional[jnp.ndarray] = None,
    ) -> Union[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
        cfg = self.config
        dt = cfg.dtype
        bc = cfg.base_ch

        # ---- fused embedding: time + class + numeric condition ----
        emb = sinusoidal_time_embedding(t, cfg.time_dim, dtype=dt)
        if cfg.num_classes is not None:
            if y is None:
                y = jnp.zeros((x.shape[0],), dtype=jnp.int32)
            class_emb = nn.Embed(
                cfg.num_classes + 1, cfg.time_dim, dtype=dt, name="class_emb"
            )(y)
            emb = emb + class_emb
        if cond_vals is not None and cond_mask is not None:
            cond_feat = jnp.concatenate(
                [cond_vals, cond_mask], axis=-1
            ).astype(dt)  # (B, 2K)
            ce = nn.Dense(cfg.time_dim, dtype=dt, name="cond_fc1")(cond_feat)
            ce = jax.nn.silu(ce)
            ce = nn.Dense(cfg.time_dim, dtype=dt, name="cond_fc2")(ce)
            emb = emb + ce

        x = x.astype(dt)
        kw = dict(dtype=dt, use_pallas=cfg.use_pallas)

        # ---- encoder ----
        x1 = ResBlock(bc, name="inc", **kw)(x)
        x2 = Down(bc * 2, name="down1", **kw)(x1, emb)
        x2 = AttentionBlock(bc * 2, cfg.num_heads, name="sa1", **kw)(x2)
        x3 = Down(bc * 4, name="down2", **kw)(x2, emb)
        x3 = AttentionBlock(bc * 4, cfg.num_heads, name="sa2", **kw)(x3)
        x4 = Down(bc * 4, name="down3", **kw)(x3, emb)
        x4 = AttentionBlock(bc * 4, cfg.num_heads, name="sa3", **kw)(x4)

        # ---- bottleneck: all blocks in ONE fused stage kernel ----
        c4 = x4.shape[-1]
        if cfg.remove_deep_conv:
            pb = (ResBlockParams(bc * 4, name="bot1")(c4),
                  ResBlockParams(bc * 4, name="bot3")(bc * 4))
        else:
            pb = (ResBlockParams(bc * 8, name="bot1")(c4),
                  ResBlockParams(bc * 8, name="bot2")(bc * 8),
                  ResBlockParams(bc * 4, name="bot3")(bc * 8))
        x4 = fused_stage(x4.astype(dt), pb, (False,) * len(pb),
                         use_pallas=cfg.use_pallas)

        # ---- decoder ----
        h = Up(bc * 2, name="up1", **kw)(x4, x3, emb)
        h = AttentionBlock(bc * 2, cfg.num_heads, name="sa4", **kw)(h)
        h = Up(bc, name="up2", **kw)(h, x2, emb)
        h = AttentionBlock(bc, cfg.num_heads, name="sa5", **kw)(h)
        h = Up(bc, name="up3", **kw)(h, x1, emb)
        h = AttentionBlock(bc, cfg.num_heads, name="sa6", **kw)(h)

        eps = nn.Conv(cfg.in_ch, (1, 1), dtype=dt, name="out")(h)
        eps = eps.astype(jnp.float32)

        if cfg.with_geom_head:
            geom = GeomHead(cfg.geom_dim, cfg.geom_hidden, dtype=dt,
                            name="geom_head")(h)
            return eps, geom.astype(jnp.float32)
        return eps


def make_unet(**overrides) -> CondUNet:
    """Convenience constructor mirroring reference defaults."""
    return CondUNet(UNetConfig(**overrides))


def make_unet_cond_with_geom_head(**overrides) -> CondUNet:
    """The flagship trained model (UnetCondWithGeomHead parity)."""
    cfg = dict(num_classes=3, with_geom_head=True)
    cfg.update(overrides)
    return CondUNet(UNetConfig(**cfg))

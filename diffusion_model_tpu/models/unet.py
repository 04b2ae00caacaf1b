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

    Split into ``embed`` / ``encode`` / ``decode`` methods (setup-based so
    all three share one parameter scope; attribute names equal the original
    ``name=`` strings, so existing checkpoints load unchanged). The split
    exists for encoder-cached sampling ("Faster Diffusion",
    arXiv:2312.09608, PAPERS.md): encoder features drift slowly across
    adjacent timesteps, so the sampler can re-run only ``decode`` (with the
    CURRENT time embedding) on most steps — see
    ``diffusion.sampling.sample_loop_encoder_cached``.
    """

    config: UNetConfig

    def setup(self):
        cfg = self.config
        dt = cfg.dtype
        bc = cfg.base_ch
        kw = dict(dtype=dt, use_pallas=cfg.use_pallas)
        if cfg.num_classes is not None:
            self.class_emb = nn.Embed(cfg.num_classes + 1, cfg.time_dim,
                                      dtype=dt)
        # lazily materialized: params exist only if the model is used with
        # numeric conditioning (matches the old compact behavior)
        self.cond_fc1 = nn.Dense(cfg.time_dim, dtype=dt)
        self.cond_fc2 = nn.Dense(cfg.time_dim, dtype=dt)

        self.inc = ResBlock(bc, **kw)
        self.down1 = Down(bc * 2, **kw)
        self.sa1 = AttentionBlock(bc * 2, cfg.num_heads, **kw)
        self.down2 = Down(bc * 4, **kw)
        self.sa2 = AttentionBlock(bc * 4, cfg.num_heads, **kw)
        self.down3 = Down(bc * 4, **kw)
        self.sa3 = AttentionBlock(bc * 4, cfg.num_heads, **kw)
        if cfg.remove_deep_conv:
            self.bot1 = ResBlockParams(bc * 4)
            self.bot3 = ResBlockParams(bc * 4)
        else:
            self.bot1 = ResBlockParams(bc * 8)
            self.bot2 = ResBlockParams(bc * 8)
            self.bot3 = ResBlockParams(bc * 4)
        self.up1 = Up(bc * 2, **kw)
        self.sa4 = AttentionBlock(bc * 2, cfg.num_heads, **kw)
        self.up2 = Up(bc, **kw)
        self.sa5 = AttentionBlock(bc, cfg.num_heads, **kw)
        self.up3 = Up(bc, **kw)
        self.sa6 = AttentionBlock(bc, cfg.num_heads, **kw)
        self.out = nn.Conv(cfg.in_ch, (1, 1), dtype=dt)
        if cfg.with_geom_head:
            self.geom_head = GeomHead(cfg.geom_dim, cfg.geom_hidden,
                                      dtype=dt)

    def embed(
        self,
        t: jnp.ndarray,
        y: Optional[jnp.ndarray] = None,
        cond_vals: Optional[jnp.ndarray] = None,
        cond_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Fused embedding: sinusoidal(t) + class_emb(y) (+ cond MLP)."""
        cfg = self.config
        dt = cfg.dtype
        emb = sinusoidal_time_embedding(t, cfg.time_dim, dtype=dt)
        if cfg.num_classes is not None:
            if y is None:
                y = jnp.zeros(t.shape, dtype=jnp.int32)
            emb = emb + self.class_emb(y)
        if cond_vals is not None and cond_mask is not None:
            cond_feat = jnp.concatenate(
                [cond_vals, cond_mask], axis=-1
            ).astype(dt)  # (B, 2K)
            ce = self.cond_fc1(cond_feat)
            ce = jax.nn.silu(ce)
            ce = self.cond_fc2(ce)
            emb = emb + ce
        return emb

    def encode(self, x: jnp.ndarray, emb: jnp.ndarray):
        """Encoder + bottleneck → the skip/bottleneck feature tuple the
        decoder consumes: ``(x1, x2, x3, x4_bottlenecked)``."""
        cfg = self.config
        bc = cfg.base_ch
        x = x.astype(cfg.dtype)
        x1 = self.inc(x)
        x2 = self.down1(x1, emb)
        x2 = self.sa1(x2)
        x3 = self.down2(x2, emb)
        x3 = self.sa2(x3)
        x4 = self.down3(x3, emb)
        x4 = self.sa3(x4)

        # ---- bottleneck: all blocks in ONE fused stage kernel ----
        c4 = x4.shape[-1]
        if cfg.remove_deep_conv:
            pb = (self.bot1(c4), self.bot3(bc * 4))
        else:
            pb = (self.bot1(c4), self.bot2(bc * 8), self.bot3(bc * 8))
        x4 = fused_stage(x4.astype(cfg.dtype), pb, (False,) * len(pb),
                         use_pallas=cfg.use_pallas)
        return x1, x2, x3, x4

    def decode(
        self, feats, emb: jnp.ndarray
    ) -> Union[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
        """Decoder from cached features + a (possibly newer) embedding."""
        cfg = self.config
        x1, x2, x3, x4 = feats
        h = self.up1(x4, x3, emb)
        h = self.sa4(h)
        h = self.up2(h, x2, emb)
        h = self.sa5(h)
        h = self.up3(h, x1, emb)
        h = self.sa6(h)
        eps = self.out(h).astype(jnp.float32)
        if cfg.with_geom_head:
            return eps, self.geom_head(h).astype(jnp.float32)
        return eps

    def __call__(
        self,
        x: jnp.ndarray,
        t: jnp.ndarray,
        y: Optional[jnp.ndarray] = None,
        cond_vals: Optional[jnp.ndarray] = None,
        cond_mask: Optional[jnp.ndarray] = None,
    ) -> Union[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
        emb = self.embed(t, y, cond_vals, cond_mask)
        return self.decode(self.encode(x, emb), emb)


def make_unet(**overrides) -> CondUNet:
    """Convenience constructor mirroring reference defaults."""
    return CondUNet(UNetConfig(**overrides))


def make_unet_cond_with_geom_head(**overrides) -> CondUNet:
    """The flagship trained model (UnetCondWithGeomHead parity)."""
    cfg = dict(num_classes=3, with_geom_head=True)
    cfg.update(overrides)
    return CondUNet(UNetConfig(**cfg))

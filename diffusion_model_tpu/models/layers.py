"""Flax building blocks for the diffusion U-Net and VAE.

Capability parity with /root/reference/models/unet.py:5-99 (ResBlock,
AttenionBlock, Down, Up, pos_encoding) re-designed for TPU:

- NHWC layout throughout (TPU-native convolution layout);
- GroupNorm(+GELU) and the attention block dispatch to fused Pallas kernels
  on TPU (see diffusion_model_tpu.ops), XLA elsewhere;
- bilinear ×2 upsampling with align_corners=True is expressed as two small
  matmuls (ops.resize) instead of a gather;
- modules carry a ``dtype`` for bf16 compute with fp32 params.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import attention as attention_ops
from ..ops import groupnorm as gn_ops
from ..ops.resize import pad_to_match, upsample2x
from ..ops.stage import fused_stage

Dtype = Any


def sinusoidal_time_embedding(t: jnp.ndarray, dim: int,
                              dtype: Dtype = jnp.float32) -> jnp.ndarray:
    """(B,) timestep (float or int) → (B, dim) sinusoidal embedding.

    Matches the reference ``pos_encoding`` (unet.py:131-137): frequencies
    1/10000^(2i/dim), sin block then cos block concatenated.
    """
    t = t.astype(jnp.float32).reshape(-1, 1)  # (B, 1)
    half = dim // 2
    inv_freq = 1.0 / (
        10000.0 ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim)
    )  # (half,)
    ang = t * inv_freq  # (B, half)
    emb = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
    return emb.astype(dtype)


class TorchGroupNorm(nn.Module):
    """GroupNorm with torch semantics, optionally fused with GELU on TPU."""

    num_groups: int
    apply_gelu: bool = False
    eps: float = 1e-5
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        weight = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return gn_ops.group_norm(
            x, weight, bias, self.num_groups, eps=self.eps,
            apply_gelu=self.apply_gelu, use_pallas=self.use_pallas,
        )


class ResBlockParams(nn.Module):
    """Declares one ResBlock's parameters (same names/shapes as ResBlock)
    and returns them as a dict, so a parent module can hand several blocks
    to the fused stage kernel (ops/stage.py) while keeping checkpoint
    param paths identical to per-block modules."""

    out_channels: int
    mid_channels: Optional[int] = None

    @nn.compact
    def __call__(self, cin: int) -> dict:
        mid = self.mid_channels or self.out_channels
        init = nn.initializers.lecun_normal()
        return {
            "w1": self.param("conv1_kernel", init, (3, 3, cin, mid),
                             jnp.float32),
            "w2": self.param("conv2_kernel", init,
                             (3, 3, mid, self.out_channels), jnp.float32),
            "s1": self.param("gn1_scale", nn.initializers.ones, (mid,),
                             jnp.float32),
            "b1": self.param("gn1_bias", nn.initializers.zeros, (mid,),
                             jnp.float32),
            "s2": self.param("gn2_scale", nn.initializers.ones,
                             (self.out_channels,), jnp.float32),
            "b2": self.param("gn2_bias", nn.initializers.zeros,
                             (self.out_channels,), jnp.float32),
        }


class ResBlock(nn.Module):
    """conv3×3(no bias) → GN(1)+GELU → conv3×3(no bias) → GN(1);
    optional residual with post-add GELU (unet.py:9-29).

    On TPU the whole block runs inside the fused stage Pallas kernel
    (ops/stage.py); elsewhere an XLA composition with identical math."""

    out_channels: int
    mid_channels: Optional[int] = None
    residual: bool = False
    dtype: Dtype = jnp.float32
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1]
        mid = self.mid_channels or self.out_channels
        init = nn.initializers.lecun_normal()
        p = {
            "w1": self.param("conv1_kernel", init, (3, 3, cin, mid),
                             jnp.float32),
            "w2": self.param("conv2_kernel", init,
                             (3, 3, mid, self.out_channels), jnp.float32),
            "s1": self.param("gn1_scale", nn.initializers.ones, (mid,),
                             jnp.float32),
            "b1": self.param("gn1_bias", nn.initializers.zeros, (mid,),
                             jnp.float32),
            "s2": self.param("gn2_scale", nn.initializers.ones,
                             (self.out_channels,), jnp.float32),
            "b2": self.param("gn2_bias", nn.initializers.zeros,
                             (self.out_channels,), jnp.float32),
        }
        return fused_stage(
            x.astype(self.dtype), (p,), (self.residual,),
            use_pallas=self.use_pallas,
        )


class AttentionBlock(nn.Module):
    """Spatial self-attention over H×W tokens (unet.py:31-51), dispatching to
    the fused Pallas kernel on TPU."""

    channels: int
    num_heads: int = 4
    dtype: Dtype = jnp.float32
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = x.shape
        assert C == self.channels
        dense = nn.initializers.lecun_normal()
        params = {
            "ln_scale": self.param("ln_scale", nn.initializers.ones, (C,), jnp.float32),
            "ln_bias": self.param("ln_bias", nn.initializers.zeros, (C,), jnp.float32),
            "qkv_w": self.param("qkv_w", dense, (C, 3 * C), jnp.float32),
            "qkv_b": self.param("qkv_b", nn.initializers.zeros, (3 * C,), jnp.float32),
            "out_w": self.param("out_w", dense, (C, C), jnp.float32),
            "out_b": self.param("out_b", nn.initializers.zeros, (C,), jnp.float32),
            "ff_ln_scale": self.param("ff_ln_scale", nn.initializers.ones, (C,), jnp.float32),
            "ff_ln_bias": self.param("ff_ln_bias", nn.initializers.zeros, (C,), jnp.float32),
            "ff1_w": self.param("ff1_w", dense, (C, C), jnp.float32),
            "ff1_b": self.param("ff1_b", nn.initializers.zeros, (C,), jnp.float32),
            "ff2_w": self.param("ff2_w", dense, (C, C), jnp.float32),
            "ff2_b": self.param("ff2_b", nn.initializers.zeros, (C,), jnp.float32),
        }
        tokens = x.reshape(B, H * W, C)
        out = attention_ops.attention_block(
            tokens, params, num_heads=self.num_heads,
            use_pallas=self.use_pallas,
        )
        return out.reshape(B, H, W, C).astype(x.dtype)


class TimeEmbedAdd(nn.Module):
    """SiLU → Dense(emb_dim → C) broadcast-added over H, W (unet.py:61-69).

    ``project_only=True`` returns the projected (B, C) vector instead of
    adding it, so Down/Up can hand the add to the fused stage kernel while
    keeping the ``<stage>/emb/proj`` checkpoint param path."""

    out_channels: int
    dtype: Dtype = jnp.float32
    project_only: bool = False

    @nn.compact
    def __call__(self, x: Optional[jnp.ndarray],
                 emb: jnp.ndarray) -> jnp.ndarray:
        e = nn.Dense(self.out_channels, dtype=self.dtype, name="proj")(
            jax.nn.silu(emb)
        )
        if self.project_only:
            return e
        return x + e[:, None, None, :]


class Down(nn.Module):
    """MaxPool(2) → ResBlock(in,in,residual) → ResBlock(in,out) → +time emb
    (unet.py:53-69). MaxPool floors odd sizes like torch (7 → 3).

    On TPU the two ResBlocks and the time-embedding add run as ONE fused
    stage kernel (ops/stage.py)."""

    out_channels: int
    dtype: Dtype = jnp.float32
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, emb: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        p1 = ResBlockParams(in_ch, name="res1")(in_ch)
        p2 = ResBlockParams(self.out_channels, name="res2")(in_ch)
        e = TimeEmbedAdd(self.out_channels, dtype=self.dtype,
                         project_only=True, name="emb")(None, emb)
        return fused_stage(
            x.astype(self.dtype), (p1, p2), (True, False), emb=e,
            use_pallas=self.use_pallas,
        )


class Up(nn.Module):
    """bilinear ×2 (align_corners) → pad to skip → concat[skip, x] →
    ResBlock(in,in,residual) → ResBlock(in,out,mid=in//2) → +time emb
    (unet.py:71-99). The upsample/pad/concat stay in XLA; both ResBlocks and
    the embedding add run as ONE fused stage kernel."""

    out_channels: int
    dtype: Dtype = jnp.float32
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, skip: jnp.ndarray,
                 emb: jnp.ndarray) -> jnp.ndarray:
        x = upsample2x(x)
        x = pad_to_match(x, skip.shape[1], skip.shape[2])
        x = jnp.concatenate([skip, x], axis=-1)
        in_ch = x.shape[-1]
        p1 = ResBlockParams(in_ch, name="res1")(in_ch)
        p2 = ResBlockParams(self.out_channels, mid_channels=in_ch // 2,
                            name="res2")(in_ch)
        e = TimeEmbedAdd(self.out_channels, dtype=self.dtype,
                         project_only=True, name="emb")(None, emb)
        return fused_stage(
            x.astype(self.dtype), (p1, p2), (True, False), emb=e,
            use_pallas=self.use_pallas,
        )

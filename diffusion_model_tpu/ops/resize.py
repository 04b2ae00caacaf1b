"""Bilinear upsampling with PyTorch ``align_corners=True`` semantics.

The reference U-Net's Up path uses ``nn.Upsample(scale_factor=2,
mode="bilinear", align_corners=True)`` (/root/reference/models/unet.py:75).
``jax.image.resize`` has no align_corners mode, so we build the exact
interpolation as two small dense matrices applied per spatial axis. On TPU
this turns the gather-style resample into two matmuls that map onto the MXU
and fuse with neighbouring ops — spatial sizes here are tiny (3→6, 7→14,
14→28), so the matrices are a few KB of XLA constants.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _interp_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) linear-interpolation matrix, align_corners=True."""
    m = np.zeros((n_out, n_in), dtype=np.float32)
    if n_in == 1:
        m[:, 0] = 1.0
        return m
    if n_out == 1:
        m[0, 0] = 1.0
        return m
    scale = (n_in - 1) / (n_out - 1)
    for i in range(n_out):
        src = i * scale
        lo = int(np.floor(src))
        hi = min(lo + 1, n_in - 1)
        w = src - lo
        m[i, lo] += 1.0 - w
        m[i, hi] += w
    return m


def upsample_bilinear_align_corners(
    x: jnp.ndarray, out_h: int, out_w: int
) -> jnp.ndarray:
    """NHWC bilinear resize with align_corners=True, as two einsum matmuls."""
    _, h, w, _ = x.shape
    if (h, w) == (out_h, out_w):
        return x
    mh = jnp.asarray(_interp_matrix(h, out_h), dtype=x.dtype)
    mw = jnp.asarray(_interp_matrix(w, out_w), dtype=x.dtype)
    # interpolation weights sum to 1; keep full mantissa so the resample is
    # exact (JAX's default matmul precision truncates f32 to bf16 mantissas)
    x = jnp.einsum("oh,bhwc->bowc", mh, x, precision=jax.lax.Precision.HIGHEST)
    x = jnp.einsum("ow,bhwc->bhoc", mw, x, precision=jax.lax.Precision.HIGHEST)
    return x


def upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """scale_factor=2 upsample (the U-Net's only use)."""
    _, h, w, _ = x.shape
    return upsample_bilinear_align_corners(x, 2 * h, 2 * w)


def pad_to_match(x: jnp.ndarray, target_h: int, target_w: int) -> jnp.ndarray:
    """Zero-pad NHWC spatial dims up to a skip connection's size.

    Matches the reference Up-path padding for odd sizes (unet.py:89-95):
    pad ``diff//2`` before and ``diff - diff//2`` after, never cropping.
    """
    _, h, w, _ = x.shape
    dy, dx = target_h - h, target_w - w
    if dy == 0 and dx == 0:
        return x
    pad_top, pad_bottom = max(0, dy // 2), max(0, dy - dy // 2)
    pad_left, pad_right = max(0, dx // 2), max(0, dx - dx // 2)
    return jnp.pad(
        x, ((0, 0), (pad_top, pad_bottom), (pad_left, pad_right), (0, 0))
    )

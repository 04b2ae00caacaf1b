"""Fully-fused ResBlock — conv3×3 → GN(1)+GELU → conv3×3 → GN(1)
[→ +x → GELU] in ONE Pallas kernel per batch row.

The reference ResBlock (/root/reference/models/unet.py:9-29) is the U-Net's
workhorse (13 instances per forward). Composed of separate conv/norm ops it
costs ~6 HBM round-trips of the activation per block; at the U-Net's small
spatial sizes (≤ 28²) the whole block fits in VMEM, so this kernel computes
everything in one pass.

Convolution strategy (Mosaic cannot reshape the lane dim, so no im2col
tensors): with the activation flattened to (H·W, C), a 3×3 conv is nine
shifted (H·W, Cin) @ (Cin, Cout) MXU matmuls — shift by ``dy·W + dx`` rows
(static slices) with column masks fixing the row-wraparound at image edges.
f32 accumulation; bf16 operands in production.

Autodiff: custom_vjp with the XLA-reference backward (same pattern as
ops/groupnorm.py / ops/attention.py).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ..utils.env import pallas_interpret, pallas_supported
from .groupnorm import group_norm_reference
from .kernel_math import gelu_exact, rows_per_step


# ---------------------------------------------------------------------------
# XLA reference (also the backward)
# ---------------------------------------------------------------------------

def _conv3x3(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    # No preferred_element_type: mixed bf16-operand/f32-output convs break
    # the conv transpose rule under autodiff (cotangent dtype mismatch);
    # bf16 convs still accumulate in f32 on the MXU.
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def resblock_reference(
    x: jnp.ndarray,
    w1: jnp.ndarray, w2: jnp.ndarray,
    gn1_scale: jnp.ndarray, gn1_bias: jnp.ndarray,
    gn2_scale: jnp.ndarray, gn2_bias: jnp.ndarray,
    residual: bool = False,
    eps: float = 1e-5,
) -> jnp.ndarray:
    h = _conv3x3(x, w1)
    h = group_norm_reference(h, gn1_scale, gn1_bias, 1, eps=eps,
                             apply_gelu=True)
    h = _conv3x3(h, w2)
    h = group_norm_reference(h, gn2_scale, gn2_bias, 1, eps=eps)
    if residual:
        return jax.nn.gelu((x + h).astype(jnp.float32),
                           approximate=False).astype(x.dtype)
    return h


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------

def _shift_rows(a: jnp.ndarray, o: int) -> jnp.ndarray:
    """Shift (N, C) rows down by o (o may be negative), zero-filling.

    |o| ≥ N shifts everything off the image (a 1×1 or 1×W activation at the
    U-Net bottom): the tap is all zeros, matching SAME-conv semantics."""
    n, c = a.shape
    if o == 0:
        return a
    if abs(o) >= n:
        return jnp.zeros_like(a)
    pad = jnp.zeros((abs(o), c), a.dtype)
    if o > 0:
        return jnp.concatenate([pad, a[:-o]], axis=0)
    return jnp.concatenate([a[-o:], pad], axis=0)


def _stack_taps(w: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, Cin, Cout) → (9·Cin, Cout) weight stack in kernel tap order.

    Built OUTSIDE the kernel (loop-invariant; XLA hoists it out of the
    sampling scan) so each grid step does zero weight shuffling."""
    rows = [w[1 - dy, 1 - dx] for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
    return jnp.concatenate(rows, axis=0)


def _conv3x3_flat(x: jnp.ndarray, wmat: jnp.ndarray, W: int,
                  col: jnp.ndarray, dt) -> jnp.ndarray:
    """3×3 SAME conv on a flattened (H·W, Cin) image via 9 shifted matmuls.

    ``col`` is (H·W, 1) column ids. Cross-correlation semantics:
    out(y,x) = Σ_{ky,kx} x(y+ky−1, x+kx−1)·W[ky,kx]. Shifting the flat image
    DOWN by dy·W + dx makes row p read x(y−dy, x−dx), which pairs with
    weight tap W[1−dy, 1−dx] (``wmat`` is pre-stacked in that order by
    ``_stack_taps``); column masks zero the row-wraparound at the left/right
    image edges.

    The nine taps are lane-concatenated into one (H·W, 9·Cin) im2col block
    and contracted with the (9·Cin, Cout) weight stack in a single MXU
    matmul — one big matmul beats nine small ones on the systolic array.
    """
    taps = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            src = _shift_rows(x, dy * W + dx)
            if dx == 1:
                src = jnp.where(col == 0, jnp.zeros_like(src), src)
            elif dx == -1:
                src = jnp.where(col == W - 1, jnp.zeros_like(src), src)
            taps.append(src.astype(dt))
    im2col = jnp.concatenate(taps, axis=1)        # (HW, 9·Cin)
    return jnp.dot(im2col, wmat.astype(dt),
                   preferred_element_type=jnp.float32)  # f32


def _gn1_gelu(h: jnp.ndarray, scale, bias, eps: float,
              gelu: bool) -> jnp.ndarray:
    """GroupNorm(1 group) over the whole (HW, C) sample, f32."""
    n = float(h.shape[0] * h.shape[1])
    mean = jnp.sum(h) / n
    var = jnp.sum(jnp.square(h - mean)) / n
    out = (h - mean) * jax.lax.rsqrt(var + eps) * scale.astype(
        jnp.float32) + bias.astype(jnp.float32)
    return gelu_exact(out) if gelu else out


def _resblock_kernel(x_ref, w1_ref, w2_ref, s1_ref, b1_ref, s2_ref, b2_ref,
                     o_ref, *, W: int, residual: bool, eps: float,
                     bf16: bool):
    # R rows per grid step (static unroll): the per-row math is tiny next to
    # the fixed per-grid-step cost (scalar setup + DMA turnaround), so
    # batching rows into one invocation is the main batch-throughput lever.
    dt = jnp.bfloat16 if bf16 else jnp.float32
    hw = x_ref.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (hw, 1), 0) % W
    for r in range(x_ref.shape[0]):
        x = x_ref[r]  # (HW, Cin)
        h = _conv3x3_flat(x, w1_ref[:], W, col, dt)
        h = _gn1_gelu(h, s1_ref[:], b1_ref[:], eps, gelu=True)
        h = _conv3x3_flat(h.astype(dt), w2_ref[:], W, col, dt)
        h = _gn1_gelu(h, s2_ref[:], b2_ref[:], eps, gelu=False)
        if residual:
            h = gelu_exact(x.astype(jnp.float32) + h)
        o_ref[r] = h.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("residual", "eps", "interpret"))
def _resblock_pallas_jit(
    x, w1, w2, gn1_scale, gn1_bias, gn2_scale, gn2_bias,
    residual: bool, eps: float, interpret: bool,
):
    B, H, W, Cin = x.shape
    cmid = w1.shape[-1]
    cout = w2.shape[-1]
    bf16 = x.dtype == jnp.bfloat16
    xf = x.reshape(B, H * W, Cin)
    w1m = _stack_taps(w1)  # (9·Cin, cmid)
    w2m = _stack_taps(w2)  # (9·cmid, cout)
    # Only the (R, HW, C) in/out blocks scale with R — the im2col blocks,
    # conv accumulators, and GN temporaries are reused across the unrolled
    # row loop. Budget: 12 MB scoped VMEM minus that fixed temp set, spent
    # on double-buffered I/O rows; cap 8 bounds the unrolled body.
    act_bytes = 2 if bf16 else 4
    temp_bytes = H * W * (
        2 * 9 * max(Cin, cmid) * act_bytes          # both im2col blocks
        + (Cin + cmid) * act_bytes                  # shifted-tap sources
        + 2 * max(cmid, cout) * 4                   # f32 conv out + GN temp
    )
    io_bytes = 2 * H * W * (Cin + cout) * act_bytes
    R = rows_per_step(B, io_bytes,
                      budget=max(io_bytes, 12 * 1024 * 1024 - temp_bytes),
                      cap=8)
    out = pl.pallas_call(
        functools.partial(_resblock_kernel, W=W, residual=residual,
                          eps=eps, bf16=bf16),
        out_shape=jax.ShapeDtypeStruct((B, H * W, cout), x.dtype),
        grid=(B // R,),
        in_specs=[
            pl.BlockSpec((R, H * W, Cin), lambda i: (i, 0, 0)),
            pl.BlockSpec((9 * Cin, cmid), lambda i: (0, 0)),
            pl.BlockSpec((9 * cmid, cout), lambda i: (0, 0)),
            pl.BlockSpec((cmid,), lambda i: (0,)),
            pl.BlockSpec((cmid,), lambda i: (0,)),
            pl.BlockSpec((cout,), lambda i: (0,)),
            pl.BlockSpec((cout,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((R, H * W, cout), lambda i: (i, 0, 0)),
        interpret=interpret,
    )(xf, w1m, w2m, gn1_scale, gn1_bias, gn2_scale, gn2_bias)
    return out.reshape(B, H, W, cout)


def _resblock_pallas_raw(x, w1, w2, gn1_scale, gn1_bias, gn2_scale, gn2_bias,
                         residual: bool = False, eps: float = 1e-5):
    return _resblock_pallas_jit(x, w1, w2, gn1_scale, gn1_bias, gn2_scale,
                                gn2_bias, residual, eps, pallas_interpret())


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def resblock_pallas(x, w1, w2, gn1_scale, gn1_bias, gn2_scale, gn2_bias,
                    residual: bool = False, eps: float = 1e-5):
    """Fused forward with an XLA-reference backward."""
    return _resblock_pallas_raw(x, w1, w2, gn1_scale, gn1_bias, gn2_scale,
                                gn2_bias, residual, eps)


def _rb_fwd(x, w1, w2, s1, b1, s2, b2, residual, eps):
    out = _resblock_pallas_raw(x, w1, w2, s1, b1, s2, b2, residual, eps)
    return out, (x, w1, w2, s1, b1, s2, b2)


def _rb_bwd(residual, eps, res, ct):
    x, w1, w2, s1, b1, s2, b2 = res
    _, vjp = jax.vjp(
        lambda x_, w1_, w2_, s1_, b1_, s2_, b2_: resblock_reference(
            x_, w1_, w2_, s1_, b1_, s2_, b2_, residual=residual, eps=eps
        ),
        x, w1, w2, s1, b1, s2, b2,
    )
    return vjp(ct)


resblock_pallas.defvjp(_rb_fwd, _rb_bwd)


# Fused-kernel VMEM budget: activation row + both weight stacks + temps.
_VMEM_ROW_BUDGET = 1024 * 1024


def resblock(
    x, w1, w2, gn1_scale, gn1_bias, gn2_scale, gn2_bias,
    residual: bool = False,
    eps: float = 1e-5,
    use_pallas: Optional[bool] = None,
):
    """Dispatching ResBlock entry point (NHWC)."""
    if use_pallas is None:
        use_pallas = pallas_supported()
    B, H, W, Cin = x.shape
    cmid, cout = w1.shape[-1], w2.shape[-1]
    row_bytes = H * W * max(Cin, cmid, cout) * 4
    wt_bytes = (w1.size + w2.size) * 4
    if row_bytes > _VMEM_ROW_BUDGET or wt_bytes > 8 * 1024 * 1024:
        use_pallas = False
    if use_pallas:
        return resblock_pallas(x, w1, w2, gn1_scale, gn1_bias, gn2_scale,
                               gn2_bias, residual, eps)
    return resblock_reference(x, w1, w2, gn1_scale, gn1_bias, gn2_scale,
                              gn2_bias, residual=residual, eps=eps)

"""Fused U-Net *stage* kernel — 1-3 ResBlocks (+ optional time-embedding
add) in ONE Pallas call, with all R batch rows batched into single MXU
matmuls.

Round-2's per-ResBlock kernel (ops/resblock.py) processed its R rows with an
unrolled per-row loop: each row ran its own (HW, 9·Cin)@(9·Cin, Cout)
matmul. At the U-Net's small spatial sizes that leaves the MXU mostly idle —
the bottleneck level has HW = 9 rows against the MXU's 128-row tiles, and
the measured step time sat ~5× above the analytic FLOP bound. This kernel
removes both overheads that analysis exposed:

1. **Row-batched matmuls**: the nine shifted conv taps are built on the
   whole (R, HW, C) block (shifts along the HW axis are per-row by
   construction), lane-concatenated to (R, HW, 9·Cin), then flattened to
   (R·HW, 9·Cin) for ONE matmul per conv — reshapes that never touch the
   lane dim, which Mosaic supports. M grows from HW to R·HW (e.g. 9 → 576
   at the bottleneck), so the systolic array runs full tiles.
2. **Stage-level fusion**: a Down/Up stage's res1 → res2 → (+time emb) chain
   (and the 3-block bottleneck) runs in one kernel — intermediate
   activations never round-trip HBM and the per-call dispatch cost is paid
   once per stage instead of once per ResBlock.

Math parity: identical op order to the composed ops/resblock.py kernels
(conv → GN(1)+GELU → conv → GN(1) [+res GELU], f32 accumulation/statistics,
bf16 operands in production, intermediate casts to the compute dtype between
blocks, emb added after the final cast) — pinned by tests/test_stage.py
against the XLA reference.

Reference mapping: ResBlock /root/reference/models/unet.py:9-29, Down
:53-69, Up :71-99 (the pad/upsample/concat stay in XLA), bottleneck
:115-121. Autodiff: custom_vjp with the XLA-reference backward, like every
fused kernel in this package.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ..utils.env import pallas_interpret, pallas_supported
from .groupnorm import group_norm_reference
from .kernel_math import gelu_exact
from .resblock import _stack_taps

# One block's params: w1 (3,3,ci,cm), w2 (3,3,cm,co), s1,b1 (cm,), s2,b2 (co,)
BLOCK_KEYS = ("w1", "w2", "s1", "b1", "s2", "b2")


# ---------------------------------------------------------------------------
# XLA reference (also the custom_vjp backward)
# ---------------------------------------------------------------------------

def _conv3x3(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _block_reference(x, p, residual: bool, eps: float):
    h = _conv3x3(x, p["w1"])
    h = group_norm_reference(h, p["s1"], p["b1"], 1, eps=eps, apply_gelu=True)
    h = _conv3x3(h, p["w2"])
    h = group_norm_reference(h, p["s2"], p["b2"], 1, eps=eps)
    if residual:
        return jax.nn.gelu((x + h).astype(jnp.float32),
                           approximate=False).astype(x.dtype)
    return h


def fused_stage_reference(
    x: jnp.ndarray,
    blocks: Sequence[Dict[str, jnp.ndarray]],
    residuals: Tuple[bool, ...],
    emb: Optional[jnp.ndarray] = None,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """XLA composition with op order identical to the kernel."""
    for p, res in zip(blocks, residuals):
        x = _block_reference(x, p, res, eps)
    if emb is not None:
        x = x + emb[:, None, None, :].astype(x.dtype)
    return x


def fused_stage_hybrid(
    x: jnp.ndarray,
    blocks: Sequence[Dict[str, jnp.ndarray]],
    residuals: Tuple[bool, ...],
    emb: Optional[jnp.ndarray] = None,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """XLA convolutions + fused Pallas GroupNorm(+GELU) between them.

    A/B candidate (``DIFFUSION_TPU_STAGE_GN_PALLAS=1``): the round-3 level
    scan only compared whole-level Pallas vs whole-level XLA; this is the
    finer split — convs stay on XLA's winning lowering while the
    bandwidth-bound GN+GELU chain runs as the single-pass Pallas kernel
    (which carries its own custom_vjp, so training stays correct). Kept
    separate from :func:`fused_stage_reference` so the stage kernel's
    custom_vjp backward remains pure XLA."""
    from .groupnorm import group_norm

    for p, res in zip(blocks, residuals):
        h = _conv3x3(x, p["w1"])
        h = group_norm(h, p["s1"], p["b1"], 1, eps=eps, apply_gelu=True)
        h = _conv3x3(h, p["w2"])
        h = group_norm(h, p["s2"], p["b2"], 1, eps=eps)
        if res:
            x = jax.nn.gelu((x + h).astype(jnp.float32),
                            approximate=False).astype(x.dtype)
        else:
            x = h
    if emb is not None:
        x = x + emb[:, None, None, :].astype(x.dtype)
    return x


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------

def _shift_hw(a: jnp.ndarray, o: int) -> jnp.ndarray:
    """Shift (R, N, C) down by o along the flattened-HW axis, zero-filling.

    Each batch row shifts independently (axis 1 is per-row), so batching
    introduces no cross-row contamination. |o| >= N (1×W activations at the
    U-Net bottom) yields an all-zero tap, matching SAME-conv semantics."""
    r, n, c = a.shape
    if o == 0:
        return a
    if abs(o) >= n:
        return jnp.zeros_like(a)
    pad = jnp.zeros((r, abs(o), c), a.dtype)
    if o > 0:
        return jnp.concatenate([pad, a[:, :-o]], axis=1)
    return jnp.concatenate([a[:, -o:], pad], axis=1)


def _conv3x3_batched(x: jnp.ndarray, wmat: jnp.ndarray, W: int,
                     col: jnp.ndarray, dt) -> jnp.ndarray:
    """3×3 SAME conv on (R, HW, Cin) via ONE (R·HW, 9·Cin) MXU matmul.

    Tap order and edge masking follow ops/resblock.py::_conv3x3_flat; the
    only difference is that taps are built for the whole R-row block and the
    contraction runs on the flattened (R·HW) row dim — same reduction order
    per output element, so numerics match the per-row version."""
    R, HW, Cin = x.shape
    taps = []
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            src = _shift_hw(x, dy * W + dx)
            if dx == 1:
                src = jnp.where(col == 0, jnp.zeros_like(src), src)
            elif dx == -1:
                src = jnp.where(col == W - 1, jnp.zeros_like(src), src)
            taps.append(src.astype(dt))
    im2col = jnp.concatenate(taps, axis=2)          # (R, HW, 9·Cin)
    flat = im2col.reshape(R * HW, 9 * Cin)          # lane dim untouched
    out = jnp.dot(flat, wmat.astype(dt),
                  preferred_element_type=jnp.float32)
    return out.reshape(R, HW, -1)                   # f32


def _gn1_gelu_batched(h: jnp.ndarray, scale, bias, eps: float,
                      gelu: bool) -> jnp.ndarray:
    """GroupNorm(1 group) per sample on (R, HW, C), f32 statistics.

    Mosaic quirks (crash-bisected on this stack): multi-axis reductions
    ``sum(axis=(1, 2))`` on rank-3 abort the compiler — reduce lane then
    sublane in two steps; rank-1 params must be reshaped to (1, 1, C)
    before broadcasting."""
    n = float(h.shape[1] * h.shape[2])
    c = h.shape[2]

    def sum12(a):
        return jnp.sum(jnp.sum(a, axis=2, keepdims=True), axis=1,
                       keepdims=True)

    mean = sum12(h) / n
    d = h - mean
    var = sum12(jnp.square(d)) / n
    s3 = scale.astype(jnp.float32).reshape(1, 1, c)
    b3 = bias.astype(jnp.float32).reshape(1, 1, c)
    out = d * jax.lax.rsqrt(var + eps) * s3 + b3
    return gelu_exact(out) if gelu else out


def _stage_kernel(x_ref, *refs, W: int, residuals: Tuple[bool, ...],
                  has_emb: bool, eps: float, bf16: bool):
    nb = len(residuals)
    w_refs = refs[: nb * 6]
    emb_ref = refs[nb * 6] if has_emb else None
    o_ref = refs[-1]
    dt = jnp.bfloat16 if bf16 else jnp.float32
    hw = x_ref.shape[1]
    col = (jax.lax.broadcasted_iota(jnp.int32, (1, hw, 1), 1) % W)

    x = x_ref[:]                                    # (R, HW, Cin)
    for b in range(nb):
        w1m, w2m, s1, b1, s2, b2 = (r[:] for r in w_refs[b * 6:(b + 1) * 6])
        h = _conv3x3_batched(x, w1m, W, col, dt)
        h = _gn1_gelu_batched(h, s1, b1, eps, gelu=True)
        h = _conv3x3_batched(h.astype(dt), w2m, W, col, dt)
        h = _gn1_gelu_batched(h, s2, b2, eps, gelu=False)
        if residuals[b]:
            h = gelu_exact(x.astype(jnp.float32) + h)
        x = h.astype(dt)                            # inter-block cast parity
    if has_emb:
        x = x + emb_ref[:].astype(dt)  # (R, 1, C) broadcasts over HW
    o_ref[:] = x.astype(o_ref.dtype)


def _stage_vmem_rows(B: int, HW: int, cs: Sequence[int], act_bytes: int,
                     cap: int = 64) -> int:
    """Largest divisor-of-B row count whose working set fits scoped VMEM.

    Unlike the round-2 kernels, the im2col block now scales with R, so the
    whole working set is R-proportional: in/out I/O blocks (double-
    buffered), the two widest im2col blocks (consecutive convs can both be
    live), and two f32 activation temps. Lane counts pad the im2col PRODUCT
    9·C (not 9·lane(C) — a Cin=4 conv's im2col is 36 lanes padded to 128,
    not 9×128), which round 3 measurement showed was throttling R at the
    small-channel levels."""
    lane = lambda c: max(128, -(-c // 128) * 128)
    cmax = max(cs)
    ic = sorted((lane(9 * c) for c in cs[:-1]), reverse=True)
    im2col_lanes = ic[0] + (ic[1] if len(ic) > 1 else 0)
    per_row = HW * (
        2 * (lane(cs[0]) + lane(cs[-1])) * act_bytes   # double-buffered I/O
        + im2col_lanes * act_bytes                     # live im2col blocks
        + lane(cmax) * act_bytes                       # shifted-tap source
        + 2 * lane(cmax) * 4                           # f32 conv out + GN
    )
    budget = 12 * 1024 * 1024
    r = max(1, min(cap, budget // max(per_row, 1), B))
    while B % r:
        r -= 1
    return r


@functools.partial(
    jax.jit, static_argnames=("residuals", "has_emb", "eps", "interpret"))
def _stage_pallas_jit(x, flat_w, emb, residuals: Tuple[bool, ...],
                      has_emb: bool, eps: float, interpret: bool):
    B, H, W, Cin = x.shape
    nb = len(residuals)
    bf16 = x.dtype == jnp.bfloat16
    act_bytes = 2 if bf16 else 4
    xf = x.reshape(B, H * W, Cin)
    # channel trace: Cin, then each block's mid/out
    cs = [Cin]
    for b in range(nb):
        cs.append(flat_w[b * 6].shape[-1])      # mid
        cs.append(flat_w[b * 6 + 1].shape[-1])  # out
    cout = cs[-1]
    R = _stage_vmem_rows(B, H * W, cs, act_bytes)
    in_specs = [pl.BlockSpec((R, H * W, Cin), lambda i: (i, 0, 0))]
    for a in flat_w:
        in_specs.append(pl.BlockSpec(a.shape, (lambda i, n=a.ndim: (0,) * n)))
    operands = [xf, *flat_w]
    if has_emb:
        # (B, 1, C) with block (R, 1, C): Mosaic requires the last two block
        # dims divisible by (8, 128) or full-size — the middle 1 is full-size
        in_specs.append(pl.BlockSpec((R, 1, cout), lambda i: (i, 0, 0)))
        operands.append(emb.reshape(B, 1, cout))
    out = pl.pallas_call(
        functools.partial(_stage_kernel, W=W, residuals=residuals,
                          has_emb=has_emb, eps=eps, bf16=bf16),
        out_shape=jax.ShapeDtypeStruct((B, H * W, cout), x.dtype),
        grid=(B // R,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((R, H * W, cout), lambda i: (i, 0, 0)),
        interpret=interpret,
    )(*operands)
    return out.reshape(B, H, W, cout)


def _flatten_blocks(blocks) -> list:
    out = []
    for p in blocks:
        out += [_stack_taps(p["w1"]), _stack_taps(p["w2"]),
                p["s1"], p["b1"], p["s2"], p["b2"]]
    return out


def _stage_pallas_raw(x, blocks, residuals, emb, eps: float):
    flat_w = _flatten_blocks(blocks)
    return _stage_pallas_jit(x, tuple(flat_w), emb, tuple(residuals),
                             emb is not None, eps, pallas_interpret())


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 4))
def fused_stage_pallas(x, blocks, residuals, emb=None, eps: float = 1e-5):
    """Fused forward with the XLA-reference backward."""
    return _stage_pallas_raw(x, blocks, residuals, emb, eps)


def _stage_fwd(x, blocks, residuals, emb, eps):
    return _stage_pallas_raw(x, blocks, residuals, emb, eps), (x, blocks, emb)


def _stage_bwd(residuals, eps, res, ct):
    x, blocks, emb = res
    if emb is None:
        _, vjp = jax.vjp(
            lambda x_, b_: fused_stage_reference(x_, b_, residuals, None,
                                                 eps), x, blocks)
        dx, db = vjp(ct)
        return dx, db, None
    _, vjp = jax.vjp(
        lambda x_, b_, e_: fused_stage_reference(x_, b_, residuals, e_, eps),
        x, blocks, emb)
    return vjp(ct)


fused_stage_pallas.defvjp(_stage_fwd, _stage_bwd)


def fused_stage(
    x: jnp.ndarray,
    blocks: Sequence[Dict[str, jnp.ndarray]],
    residuals: Tuple[bool, ...],
    emb: Optional[jnp.ndarray] = None,
    eps: float = 1e-5,
    use_pallas: Optional[bool] = None,
) -> jnp.ndarray:
    """Dispatching entry point (NHWC). ``blocks`` is 1-3 ResBlock param
    dicts applied in sequence; ``residuals[b]`` marks the post-add-GELU
    residual blocks; ``emb`` is an optional (B, Cout) per-sample vector
    broadcast-added after the last block (TimeEmbedAdd fusion).

    Backend default: XLA. Round-3 per-level scan measurements (B=128
    CFG batch, docs/PERFORMANCE.md) showed XLA's native convolutions beat
    the im2col Pallas stage kernel at EVERY level of this U-Net — 2-2.6×
    at the small-channel levels (XLA 26-42 TFLOP/s vs 10-22) and ~1.1-1.5×
    at the wide decoder levels (up1/bot reach >100 TFLOP/s in XLA, whose
    conv lowering K-tiles without materializing im2col and overlaps DMA).
    The Pallas path is kept for A/B measurement via
    ``DIFFUSION_TPU_STAGE_PALLAS=1`` (attention is the op where Pallas
    wins — see ops/attention.py)."""
    if use_pallas is None:
        import os

        use_pallas = pallas_supported() and os.environ.get(
            "DIFFUSION_TPU_STAGE_PALLAS", "0") == "1"
    B, H, W, Cin = x.shape
    cs = [Cin] + [w.shape[-1] for p in blocks for w in (p["w1"], p["w2"])]
    wt_bytes = sum(p["w1"].size + p["w2"].size for p in blocks) * 4
    if use_pallas:
        # weights for all blocks must fit VMEM alongside one row's work
        if wt_bytes > 8 * 1024 * 1024 or H * W * max(cs) * 4 > 4 * 1024 * 1024:
            use_pallas = False
    if use_pallas:
        return fused_stage_pallas(x, tuple(blocks), tuple(residuals), emb,
                                  eps)
    import os

    if pallas_supported() and os.environ.get(
            "DIFFUSION_TPU_STAGE_GN_PALLAS", "0") == "1":
        return fused_stage_hybrid(x, blocks, tuple(residuals), emb, eps)
    return fused_stage_reference(x, blocks, tuple(residuals), emb, eps)

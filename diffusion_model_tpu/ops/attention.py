"""Fused spatial self-attention block — XLA path and Pallas TPU kernel.

The reference ``AttenionBlock`` [sic] (/root/reference/models/unet.py:31-51)
flattens H×W to tokens, then runs LN → 4-head MHA → residual → (LN → Linear →
GELU → Linear) + residual. Two quirks are preserved deliberately (documented
in SURVEY.md §7 "hard parts"):

1. ``x_ln = x = self.ln(x)`` (unet.py:47): the attention residual is added to
   the **normed** tensor, not the raw input.
2. The block's output replaces the input entirely (no outer residual).

Token counts are small (≤ 28·28 = 784 tokens, C ≤ 256), so the whole block
fits in VMEM per batch row; the Pallas kernel computes the entire chain in a
single pass, avoiding 6 HBM round-trips.

Precision policy: f32 inputs run full-mantissa matmuls (torch parity,
pinned by tests); bf16 inputs (the production compute dtype) run bf16
matmuls with f32 accumulation, f32 LN statistics, and f32 softmax.

Autodiff: the Pallas kernel carries a ``custom_vjp`` whose backward is the
VJP of the XLA reference implementation — fused forward in both training and
inference, exact XLA backward.

Parameter dict layout (all float32):
  ln_scale, ln_bias              (C,)
  qkv_w (C, 3C), qkv_b (3C,)     packed in-projection like torch MHA
  out_w (C, C),  out_b (C,)
  ff_ln_scale, ff_ln_bias        (C,)
  ff1_w (C, C), ff1_b (C,), ff2_w (C, C), ff2_b (C,)
"""
from __future__ import annotations

import functools
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ..utils.env import pallas_interpret, pallas_supported
from .kernel_math import gelu_exact, rows_per_step

PARAM_KEYS = (
    "ln_scale", "ln_bias", "qkv_w", "qkv_b", "out_w", "out_b",
    "ff_ln_scale", "ff_ln_bias", "ff1_w", "ff1_b", "ff2_w", "ff2_b",
)


def _layer_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                eps: float = 1e-5) -> jnp.ndarray:
    """LN with f32 statistics, output in x.dtype."""
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps) * scale.astype(
        jnp.float32) + bias.astype(jnp.float32)
    return out.astype(x.dtype)


def _block_math(x: jnp.ndarray, p: Dict[str, jnp.ndarray], num_heads: int,
                kernel: bool = False) -> jnp.ndarray:
    """The full block on (T, C) or (B, T, C); shared by both backends.

    ``kernel=True`` switches to Pallas-lowerable primitives (poly-erf GELU).
    """
    gelu_fn = (
        gelu_exact if kernel
        else (lambda a: jax.nn.gelu(a, approximate=False))
    )
    if x.dtype == jnp.bfloat16:
        # production path: bf16 matmuls, f32 accumulation inside the MXU
        return _block_body(x, p, num_heads, jnp.bfloat16, gelu_fn)
    # f32 path: full-mantissa matmuls (multi-pass on the MXU) in both
    # backends so the fused kernel is interchangeable with the XLA path
    with jax.default_matmul_precision("highest"):
        return _block_body(x.astype(jnp.float32), p, num_heads,
                           jnp.float32, gelu_fn)


def _block_body(x: jnp.ndarray, p: Dict[str, jnp.ndarray], num_heads: int,
                dt, gelu_fn) -> jnp.ndarray:
    T, C = x.shape[-2], x.shape[-1]
    dh = C // num_heads

    def mm(a, w, b):
        out = jnp.dot(a, w.astype(dt), preferred_element_type=jnp.float32)
        return (out + b.astype(jnp.float32)).astype(dt)

    xn = _layer_norm(x, p["ln_scale"], p["ln_bias"])
    qkv = mm(xn, p["qkv_w"], p["qkv_b"])  # (..., T, 3C)
    q, k, v = jnp.split(qkv, 3, axis=-1)

    # Per-head attention via static lane slices (Mosaic cannot reshape the
    # lane dim into heads); small matmul chains, concatenated on lanes.
    inv_sqrt_dh = 1.0 / float(dh) ** 0.5
    parts = []
    for h in range(num_heads):
        sl = slice(h * dh, (h + 1) * dh)
        qh, kh, vh = q[..., sl], k[..., sl], v[..., sl]
        scores = jnp.einsum(
            "...td,...sd->...ts", qh, kh,
            preferred_element_type=jnp.float32,
        ) * inv_sqrt_dh
        attn = jax.nn.softmax(scores, axis=-1).astype(dt)  # f32 softmax
        parts.append(jnp.einsum(
            "...ts,...sd->...td", attn, vh,
            preferred_element_type=jnp.float32,
        ).astype(dt))
    ctx = jnp.concatenate(parts, axis=-1)
    attn_out = mm(ctx, p["out_w"], p["out_b"])

    h = attn_out + xn  # reference quirk: residual uses the normed tensor
    hn = _layer_norm(h, p["ff_ln_scale"], p["ff_ln_bias"])
    ff = gelu_fn(mm(hn, p["ff1_w"], p["ff1_b"]).astype(jnp.float32))
    ff = mm(ff.astype(dt), p["ff2_w"], p["ff2_b"])
    return ff + h


def attention_block_reference(
    x: jnp.ndarray, params: Dict[str, jnp.ndarray], num_heads: int = 4
) -> jnp.ndarray:
    """XLA path on (B, T, C) tokens."""
    return _block_math(x, params, num_heads).astype(x.dtype)


def _block_body_batched(x: jnp.ndarray, p: Dict[str, jnp.ndarray],
                        num_heads: int, dt, gelu_fn,
                        planted_c: Optional[int] = None,
                        t_chunk: Optional[int] = None,
                        bf16_scores: bool = False) -> jnp.ndarray:
    """The full block on an (R, T, C) row block with the dense projections
    flattened to single (R·T, C) MXU matmuls and the per-head score/value
    contractions batched over R — same per-element reduction order as the
    per-row version, so numerics match. ``planted_c`` (the real channel
    count) activates the planted-sum Σe-on-MXU variant for C < 128 — see
    the inline comment at the PV contraction.

    Round 2 ran an unrolled per-row loop here; at these token counts the
    per-row matmuls (M = T ≤ 784, K as small as 16 per head) left the MXU
    mostly idle. Flattening rows into M = R·T recovers full tiles for the
    ~2/3 of attention FLOPs that live in the projections/FF."""
    R, T, C = x.shape
    dh = C // num_heads

    def mm(a, w, b):
        flat = a.reshape(R * T, a.shape[-1])   # lane dim untouched
        out = jnp.dot(flat, w.astype(dt), preferred_element_type=jnp.float32)
        # explicit (1, C') bias: Mosaic aborts on implicit rank-1 broadcasts
        out = (out + b.astype(jnp.float32).reshape(1, -1)).astype(dt)
        return out.reshape(R, T, -1)

    def ln3(a, scale, bias):
        af = a.astype(jnp.float32)
        mean = af.mean(axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(af - mean), axis=-1, keepdims=True)
        c = a.shape[-1]
        out = (af - mean) * jax.lax.rsqrt(var + 1e-5) * scale.astype(
            jnp.float32).reshape(1, 1, c) + bias.astype(
            jnp.float32).reshape(1, 1, c)
        return out.astype(a.dtype)

    xn = ln3(x, p["ln_scale"], p["ln_bias"])
    qkv = mm(xn, p["qkv_w"], p["qkv_b"])
    q, k, v = jnp.split(qkv, 3, axis=-1)

    # Per-head attention WITHOUT lane slicing: a (T, dh) head slice pads
    # dh → 128 lanes and forces a vector relayout per slice — measured at
    # 2.7 TFLOP/s on the C=64 levels. Instead mask the head's lanes and
    # contract over the FULL channel dim: (q·mask_h) @ kᵀ equals q_h·k_hᵀ
    # exactly (the other lanes contribute zeros; f32 accumulation makes
    # adding zeros exact), runs full-width on the MXU, and the per-head
    # context (softmax_h @ (v·mask_h)) lands in its own lanes so the heads
    # recombine by SUM — no concat, no relayout.
    # VPU economy on the (R, T, T) score block (it is the largest tensor in
    # the kernel — every elementwise pass over it costs T/C× more than the
    # same pass over a (R, T, C) tensor):
    #   - 1/√dh is folded into q (one (R, T, C) multiply) instead of
    #     scaling scores;
    #   - softmax is left UNNORMALIZED (exp(s - max) only) and the 1/Σ
    #     divide is applied to the per-head (R, T, C) context after the
    #     value matmul — mathematically identical, T/128-fold fewer
    #     divides, and the f32 Σ is taken before the bf16 cast so the
    #     result matches normalize-then-cast to bf16 rounding.
    inv_sqrt_dh = 1.0 / float(dh) ** 0.5
    qs = (q.astype(jnp.float32) * inv_sqrt_dh).astype(dt)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, q.shape[-1]), 2)
    # Max-subtraction elision (bf16 only): softmax conventionally computes
    # exp(s - max(s)) for overflow safety, paying a lane reduce + subtract
    # pass over the (R, T, T) score block per head — its two most expensive
    # VPU passes. bf16 shares f32's exponent range (8 bits), so exp only
    # overflows past ~88 and a single clip at ±80 (one pass, fusable into
    # the exp input) makes overflow impossible; relative precision of bf16
    # e-values is scale-invariant (2^-8 mantissa), so e/Σe ratios match the
    # max-subtracted version to the same rounding. The clip's lower bound
    # also rules out a zero denominator: exp(-80) ≈ 1.8e-35 is a normal
    # bf16/f32 value, so Σe ≥ T·1.8e-35 > 0 always. The f32 path keeps
    # max-sub for exact torch-reference parity.
    exp_nomax = dt == jnp.bfloat16
    softmax_exp = (
        (lambda s: jnp.exp(jnp.clip(s, -80.0, 80.0)))
        if exp_nomax else
        (lambda s: jnp.exp(s - s.max(axis=-1, keepdims=True)))
    )
    # bf16 scores (env DIFFUSION_TPU_ATTN_BF16_SCORES, planted path only):
    # QKᵀ accumulates in f32 on the MXU (Mosaic requires a 32-bit matmul
    # accumulator — asking for a bf16 acc is a verification error on this
    # toolchain), then the materialized score block casts to bf16 so the
    # clip+exp VPU passes run at double lane throughput. Softmax weights
    # pick up ~|s|·2⁻⁸ relative error, so this is opt-in until certified
    # on the quality metrics.
    cast_scores_bf16 = bool(bf16_scores and planted_c is not None)
    masks = [((lane // dh) == h).astype(dt) for h in range(num_heads)]
    vmasks = [
        (((lane // dh) == h) | (lane == planted_c)).astype(dt)
        for h in range(num_heads)
    ] if planted_c is not None else None
    # Query-axis chunking: scores are computed in (R, tc, T) slabs — the
    # t-rows of softmax are independent, so chunking over t is numerically
    # IDENTICAL to the full (R, T, T) block (unlike s-chunking, which
    # would need flash-style running accumulators and changes the f32
    # summation order). Its only purpose is VMEM: the score block is the
    # kernel's largest tensor, and shrinking it lets rows_per_step pack
    # R=2 batch rows per grid step at T=784 (half the grid steps, half
    # the per-step fixed overhead).
    tc = t_chunk if t_chunk else T
    ctx_chunks = []
    for t0 in range(0, T, tc):
        ctx_c = None
        for h in range(num_heads):
            qh = qs[:, t0:t0 + tc, :] * masks[h]
            scores = jnp.einsum(
                "rtc,rsc->rts", qh, k,
                preferred_element_type=jnp.float32,
            )
            if cast_scores_bf16:
                scores = scores.astype(jnp.bfloat16)
            if planted_c is not None:
                # Planted-sum path (bf16, C < 128): q/k/v come in at
                # per-part width 128 (lanes >= C zero; see
                # _extend_params_planted), and v carries a constant-1.0
                # lane at index C — planted via the extended bias. Masking
                # that lane into each head's v makes the PV matmul emit
                # the softmax denominator Σe in lane C for FREE (those
                # lanes are MXU padding anyway), so the VPU sum-reduce
                # pass over the score block disappears, and exp can cast
                # straight to bf16 (the baseline materialized f32 e and
                # read it twice: Σ-reduce + cast). Σ moves from a VPU f32
                # tree to f32 MXU accumulation of bf16 e — measured parity
                # with the baseline kernel vs the XLA reference.
                e = softmax_exp(scores).astype(dt)
                part_ext = jnp.einsum(
                    "rts,rsc->rtc", e, v * vmasks[h],
                    preferred_element_type=jnp.float32,
                )
                denom = part_ext[..., planted_c:planted_c + 1]
                part = part_ext * jax.lax.reciprocal(denom)
            else:
                vh = v * masks[h]
                e = softmax_exp(scores)
                part = jnp.einsum(
                    "rts,rsc->rtc", e.astype(dt), vh,
                    preferred_element_type=jnp.float32,
                )
                part = part * jax.lax.reciprocal(
                    e.sum(axis=-1, keepdims=True))
            ctx_c = part if ctx_c is None else ctx_c + part
        ctx_chunks.append(ctx_c)
    ctx = (ctx_chunks[0] if len(ctx_chunks) == 1
           else jnp.concatenate(ctx_chunks, axis=1))
    attn_out = mm(ctx.astype(dt), p["out_w"], p["out_b"])

    h = attn_out + xn  # reference quirk: residual uses the normed tensor
    hn = ln3(h, p["ff_ln_scale"], p["ff_ln_bias"])
    ff = gelu_fn(mm(hn, p["ff1_w"], p["ff1_b"]).astype(jnp.float32))
    ff = mm(ff.astype(dt), p["ff2_w"], p["ff2_b"])
    return ff + h


def _attn_kernel(x_ref, *refs, num_heads: int, planted_c: Optional[int],
                 t_chunk: Optional[int], bf16_scores: bool):
    param_refs, o_ref = refs[:-1], refs[-1]
    p = {k: r[:] for k, r in zip(PARAM_KEYS, param_refs)}
    x = x_ref[:]
    gelu_fn = gelu_exact
    if x.dtype == jnp.bfloat16:
        out = _block_body_batched(x, p, num_heads, jnp.bfloat16, gelu_fn,
                                  planted_c=planted_c, t_chunk=t_chunk,
                                  bf16_scores=bf16_scores)
    else:
        with jax.default_matmul_precision("highest"):
            out = _block_body_batched(x.astype(jnp.float32), p, num_heads,
                                      jnp.float32, gelu_fn, t_chunk=t_chunk)
    o_ref[:] = out.astype(o_ref.dtype)


def _extend_params_planted(params: Dict[str, jnp.ndarray], C: int,
                           P: int = 128) -> Dict[str, jnp.ndarray]:
    """Widen qkv/out weights to per-part lane-tile width ``P`` and plant a
    constant 1.0 in v's bias at lane index C. Lanes >= C of q/k/v are zeros
    (so scores and masked heads are unchanged), except v's lane C, which
    becomes a constant 1 column whose PV product is Σe (the softmax
    denominator). out_w gets zero rows >= C, killing the planted lane on
    the way out — no lane slicing or masking needed. The extension is
    loop-invariant in a sampling scan (params are constants), so XLA
    hoists it: zero per-step cost."""
    qw, qb = params["qkv_w"], params["qkv_b"]
    qkv_w = jnp.zeros((C, 3 * P), qw.dtype)
    qkv_b = jnp.zeros((3 * P,), qb.dtype)
    for part in range(3):
        qkv_w = qkv_w.at[:, part * P:part * P + C].set(
            qw[:, part * C:(part + 1) * C])
        qkv_b = qkv_b.at[part * P:part * P + C].set(
            qb[part * C:(part + 1) * C])
    qkv_b = qkv_b.at[2 * P + C].set(1.0)
    out_w = jnp.zeros((P, C), params["out_w"].dtype)
    out_w = out_w.at[:C].set(params["out_w"])
    return dict(params, qkv_w=qkv_w, qkv_b=qkv_b, out_w=out_w)


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret",
                                              "bf16_scores"))
def _attention_pallas_jit(
    x: jnp.ndarray, params: Dict[str, jnp.ndarray], num_heads: int,
    interpret: bool, bf16_scores: bool = False,
) -> jnp.ndarray:
    """Pallas fused block: grid over batch rows, (R, T, C) + params in VMEM."""
    B, T, C = x.shape
    planted_c = C if (x.dtype == jnp.bfloat16 and C < 128) else None
    if planted_c is not None:
        params = _extend_params_planted(params, C)
    plist = [params[k] for k in PARAM_KEYS]
    act_bytes = 2 if x.dtype == jnp.bfloat16 else 4
    score_bytes = 2 if (bf16_scores and planted_c is not None) else 4
    # The whole working set scales with R in the batched-matmul kernel:
    # double-buffered (R, T, C) I/O blocks, the (R, tc, T) score + softmax
    # blocks, qkv/ctx/FF intermediates, and f32 LN temporaries. Channel
    # counts are padded to 128 lanes (Mosaic layout) before costing.
    c_lane = max(128, -(-C // 128) * 128)

    def row_bytes_for(tc):
        return (
            tc * T * (score_bytes + act_bytes)   # scores + softmax in dt
            + 10 * T * c_lane * act_bytes        # qkv(3C)+ctx+attn_out+FF
            + 2 * T * c_lane * 4                 # f32 LN temporaries
            + 4 * T * c_lane * act_bytes         # double-buffered I/O
        )

    budget = 12 * 1024 * 1024
    t_chunk = None
    R = rows_per_step(B, row_bytes_for(T), budget=budget, cap=32)
    if R == 1:
        # The full-T score block forces one batch row per grid step (sa6:
        # T=784 → 3.7 MB of scores alone). Chunking the query axis keeps
        # numerics identical and shrinks the block until two rows fit —
        # half the grid steps, half the per-step fixed overhead.
        for div in (2, 4):
            tc = T // div
            if T % div == 0 and tc % 8 == 0:
                R2 = rows_per_step(B, row_bytes_for(tc), budget=budget,
                                   cap=32)
                if R2 > R:
                    R, t_chunk = R2, tc
                    break
    in_specs = [pl.BlockSpec((R, T, C), lambda i: (i, 0, 0))]
    for a in plist:
        in_specs.append(
            pl.BlockSpec(a.shape, (lambda i, n=a.ndim: (0,) * n))
        )
    out = pl.pallas_call(
        functools.partial(_attn_kernel, num_heads=num_heads,
                          planted_c=planted_c, t_chunk=t_chunk,
                          bf16_scores=bf16_scores),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(B // R,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((R, T, C), lambda i: (i, 0, 0)),
        interpret=interpret,
    )(x, *plist)
    return out


def _attention_pallas_raw(x, params, num_heads: int = 4):
    bf16_scores = os.environ.get(
        "DIFFUSION_TPU_ATTN_BF16_SCORES", "0") == "1"
    return _attention_pallas_jit(x, params, num_heads, pallas_interpret(),
                                 bf16_scores)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def attention_block_pallas(
    x: jnp.ndarray, params: Dict[str, jnp.ndarray], num_heads: int = 4
) -> jnp.ndarray:
    """Fused forward with an XLA-reference backward (Pallas has no
    automatic transpose)."""
    return _attention_pallas_raw(x, params, num_heads)


def _attn_fwd(x, params, num_heads):
    return _attention_pallas_raw(x, params, num_heads), (x, params)


def _attn_bwd(num_heads, res, ct):
    x, params = res
    _, vjp = jax.vjp(
        lambda x_, p_: attention_block_reference(x_, p_, num_heads), x, params
    )
    return vjp(ct)


attention_block_pallas.defvjp(_attn_fwd, _attn_bwd)


def attention_block(
    x: jnp.ndarray,
    params: Dict[str, jnp.ndarray],
    num_heads: int = 4,
    use_pallas: Optional[bool] = None,
) -> jnp.ndarray:
    """Dispatching entry point on (B, T, C) tokens.

    Auto-dispatch is shape-aware, from round-3 per-level scan measurements
    on the production U-Net (B=128 CFG batch, docs/PERFORMANCE.md): the
    fused Pallas kernel wins decisively where the T² score work dominates
    (sa6, T=784: 1.8 vs 10.7 ms — XLA's MHA lowering materializes the
    per-head score tensors through HBM), and roughly ties XLA at C≥128
    (sa1: 0.51 vs 0.59 ms). XLA wins at middling T with narrow channels
    (sa5, T=196/C=64: 0.34 vs 0.51 ms) where the kernel's full-width
    masked-head matmuls do num_heads× redundant lane work. Rule: Pallas
    iff T ≥ 256 or C ≥ 128."""
    if os.environ.get("DIFFUSION_TPU_ATTN_SCORE_PROBE", "0") == "1":
        _probe_score_max(x, params, num_heads)
    if use_pallas is None:
        T, C = x.shape[1], x.shape[2]
        use_pallas = pallas_supported() and (T >= 256 or C >= 128)
    if use_pallas:
        return attention_block_pallas(x, params, num_heads)
    return attention_block_reference(x, params, num_heads=num_heads)


# --- score-magnitude probe (certification tooling, not a compute path) ---
# The bf16 kernel elides softmax max-subtraction with a clip at ±80
# (see _block_body_batched): any logit beyond the clip is silently
# flattened, so the optimization is only exact while checkpoints keep
# max |score| well below 80. DIFFUSION_TPU_ATTN_SCORE_PROBE=1 makes every
# attention_block call additionally compute its exact f32 max |scaled
# score| and stream it to SCORE_PROBE_MAX via jax.debug.callback (works
# inside jitted scans). scripts/attn_bf16_cert.py runs a probe generation
# and records/asserts the observed maximum in the certification artifact.
SCORE_PROBE_MAX: list = []


def _probe_score_max(x, p, num_heads: int) -> None:
    xf = x.astype(jnp.float32)
    xn = _layer_norm(xf, p["ln_scale"], p["ln_bias"])
    qkv = jnp.dot(xn, p["qkv_w"].astype(jnp.float32)) + p["qkv_b"].astype(
        jnp.float32)
    q, k, _ = jnp.split(qkv, 3, axis=-1)
    C = x.shape[-1]
    dh = C // num_heads
    inv_sqrt_dh = 1.0 / float(dh) ** 0.5
    m = jnp.float32(-jnp.inf)
    for h in range(num_heads):
        sl = slice(h * dh, (h + 1) * dh)
        s = jnp.einsum("...td,...sd->...ts", q[..., sl], k[..., sl],
                       preferred_element_type=jnp.float32) * inv_sqrt_dh
        m = jnp.maximum(m, jnp.max(jnp.abs(s)))
    jax.debug.callback(lambda v: SCORE_PROBE_MAX.append(float(v)), m)

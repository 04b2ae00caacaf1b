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


def _attn_kernel(x_ref, *refs, num_heads: int):
    param_refs, o_ref = refs[:-1], refs[-1]
    p = {k: r[:] for k, r in zip(PARAM_KEYS, param_refs)}
    # R rows per grid step (static unroll) — amortizes the fixed
    # per-grid-step cost, which dominates these µs-scale token counts.
    for r in range(x_ref.shape[0]):
        out = _block_math(x_ref[r], p, num_heads, kernel=True)
        o_ref[r] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def _attention_pallas_jit(
    x: jnp.ndarray, params: Dict[str, jnp.ndarray], num_heads: int,
    interpret: bool,
) -> jnp.ndarray:
    """Pallas fused block: grid over batch rows, (R, T, C) + params in VMEM."""
    B, T, C = x.shape
    plist = [params[k] for k in PARAM_KEYS]
    act_bytes = 2 if x.dtype == jnp.bfloat16 else 4
    # Only the (R, T, C) in/out blocks scale with R — the per-row compute
    # temporaries (f32 scores, softmax, qkv, LN intermediates) are reused
    # across the unrolled row loop. Budget: 12 MB scoped VMEM minus the
    # fixed temp set, spent on double-buffered I/O rows; cap 8 bounds the
    # unrolled kernel body.
    temp_bytes = T * T * 4 + T * T * act_bytes + 6 * T * C * act_bytes \
        + 2 * T * C * 4
    io_bytes = 4 * T * C * act_bytes
    R = rows_per_step(B, io_bytes,
                      budget=max(io_bytes, 12 * 1024 * 1024 - temp_bytes),
                      cap=8)
    in_specs = [pl.BlockSpec((R, T, C), lambda i: (i, 0, 0))]
    for a in plist:
        in_specs.append(
            pl.BlockSpec(a.shape, (lambda i, n=a.ndim: (0,) * n))
        )
    out = pl.pallas_call(
        functools.partial(_attn_kernel, num_heads=num_heads),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(B // R,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((R, T, C), lambda i: (i, 0, 0)),
        interpret=interpret,
    )(x, *plist)
    return out


def _attention_pallas_raw(x, params, num_heads: int = 4):
    return _attention_pallas_jit(x, params, num_heads, pallas_interpret())


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
    """Dispatching entry point on (B, T, C) tokens."""
    if use_pallas is None:
        use_pallas = pallas_supported()
    if use_pallas:
        return attention_block_pallas(x, params, num_heads)
    return attention_block_reference(x, params, num_heads=num_heads)

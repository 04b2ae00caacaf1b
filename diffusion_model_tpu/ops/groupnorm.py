"""GroupNorm (+ fused GELU) for NHWC tensors — XLA path and Pallas TPU kernel.

The reference uses ``nn.GroupNorm(1, C)`` inside every ResBlock (LayerNorm
over C,H,W; /root/reference/models/unet.py:19,23) and ``nn.GroupNorm(8, C)``
in the VAE (/root/reference/models/vae.py:19-47), always followed by GELU.
On TPU the normalize-scale-shift-GELU chain is bandwidth-bound, so the Pallas
kernel computes it in one VMEM pass per batch row. The XLA fallback is a
straight-line jnp implementation that XLA also fuses well; both are exposed
behind `group_norm(..., use_pallas=...)` with parity tests in
tests/test_ops.py.

Semantics match torch.nn.GroupNorm: normalize over (spatial, channels-in-
group) per sample with biased variance, eps inside the sqrt, then per-channel
affine. GELU is exact (erf) like torch's default.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ..utils.env import pallas_interpret, pallas_supported
from .kernel_math import gelu_exact, rows_per_step


def group_norm_reference(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray,
    num_groups: int,
    eps: float = 1e-5,
    apply_gelu: bool = False,
) -> jnp.ndarray:
    """NHWC GroupNorm via jnp (XLA fuses the chain).

    Statistics in f32; output in x.dtype (same contract as the Pallas
    kernel, so the two are interchangeable under autodiff)."""
    B, H, W, C = x.shape
    G = num_groups
    xg = x.astype(jnp.float32).reshape(B, H * W, G, C // G)
    mean = xg.mean(axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xg - mean), axis=(1, 3), keepdims=True)
    xn = (xg - mean) * jax.lax.rsqrt(var + eps)
    out = xn.reshape(B, H, W, C) * weight + bias
    if apply_gelu:
        out = jax.nn.gelu(out, approximate=False)
    return out.astype(x.dtype)


def _gn_kernel(x_ref, w_ref, b_ref, o_ref, *, num_groups: int, eps: float,
               apply_gelu: bool):
    """R batch rows per grid step: x_ref is (R, HW, C) in VMEM.

    Mosaic cannot reshape the lane (channel) dimension, so grouped statistics
    are computed with static lane slices per group: per-group scalar
    mean/variance via full reductions, scattered back to channels by
    concatenation. Everything stays 2D and MXU/VPU friendly; the R-row loop
    is a static unroll that amortizes the fixed per-grid-step cost.
    """
    g = num_groups
    w = w_ref[:].astype(jnp.float32)
    b = b_ref[:].astype(jnp.float32)
    for r in range(x_ref.shape[0]):
        x = x_ref[r].astype(jnp.float32)  # (HW, C)
        hw, c = x.shape
        cg = c // g
        n = float(hw * cg)

        # Exact f32 VPU reductions per group via static lane slices (G ≤ 8);
        # two-pass mean/variance for stability.
        mean_parts, rstd_parts = [], []
        for gi in range(g):
            sl = x[:, gi * cg:(gi + 1) * cg]
            m = jnp.sum(sl) / n
            var = jnp.sum(jnp.square(sl - m)) / n
            mean_parts.append(jnp.full((1, cg), m, jnp.float32))
            rstd_parts.append(jnp.full((1, cg), jax.lax.rsqrt(var + eps),
                                       jnp.float32))
        mean_c = jnp.concatenate(mean_parts, axis=1)  # (1, C)
        rstd_c = jnp.concatenate(rstd_parts, axis=1)

        out = (x - mean_c) * rstd_c * w + b
        if apply_gelu:
            out = gelu_exact(out)  # Mosaic can't lower erf; poly-erf GELU
        o_ref[r] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("num_groups", "eps", "apply_gelu", "interpret")
)
def _group_norm_pallas_jit(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray,
    num_groups: int,
    eps: float,
    apply_gelu: bool,
    interpret: bool,
) -> jnp.ndarray:
    """Pallas fused GroupNorm(+GELU); grid over batch, full row in VMEM.

    Activations here are at most 28·28·512·4B ≈ 1.6 MB per row — comfortably
    inside VMEM, so a single-pass kernel (no Welford tiling) is optimal.
    """
    B, H, W, C = x.shape
    xf = x.reshape(B, H * W, C)
    # Mosaic pads the lane (channel) dim to 128, so temporaries of a
    # narrow-C row really occupy HW × roundup(C, 128) lanes; ~5 such f32
    # temps are live at once (x cast, centered, group-slice chain, out).
    c_pad = -(-C // 128) * 128
    R = rows_per_step(B, H * W * c_pad * 4 * 5)
    out = pl.pallas_call(
        functools.partial(
            _gn_kernel, num_groups=num_groups, eps=eps, apply_gelu=apply_gelu
        ),
        out_shape=jax.ShapeDtypeStruct(xf.shape, x.dtype),
        grid=(B // R,),
        in_specs=[
            pl.BlockSpec((R, H * W, C), lambda i: (i, 0, 0)),
            pl.BlockSpec((C,), lambda i: (0,)),
            pl.BlockSpec((C,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((R, H * W, C), lambda i: (i, 0, 0)),
        interpret=interpret,
    )(xf, weight, bias)
    return out.reshape(B, H, W, C)


def _group_norm_pallas_raw(x, weight, bias, num_groups, eps=1e-5,
                           apply_gelu=False):
    return _group_norm_pallas_jit(x, weight, bias, num_groups, eps,
                                  apply_gelu, pallas_interpret())


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def group_norm_pallas(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray,
    num_groups: int,
    eps: float = 1e-5,
    apply_gelu: bool = False,
) -> jnp.ndarray:
    """Fused Pallas forward with an XLA-reference backward (Pallas has no
    automatic transpose, so training differentiates the reference math)."""
    return _group_norm_pallas_raw(x, weight, bias, num_groups, eps,
                                  apply_gelu)


def _gn_fwd(x, weight, bias, num_groups, eps, apply_gelu):
    out = _group_norm_pallas_raw(x, weight, bias, num_groups, eps, apply_gelu)
    return out, (x, weight, bias)


def _gn_bwd(num_groups, eps, apply_gelu, res, ct):
    x, weight, bias = res
    _, vjp = jax.vjp(
        lambda x_, w_, b_: group_norm_reference(
            x_, w_, b_, num_groups, eps=eps, apply_gelu=apply_gelu
        ),
        x, weight, bias,
    )
    return vjp(ct)


group_norm_pallas.defvjp(_gn_fwd, _gn_bwd)


# The single-pass kernel keeps one (HW, C) row in VMEM with ~8-10× f32
# temporaries (cast, centered, squared, per-group parts); beyond this row
# budget (VAE-resolution activations like 224²×64) route to XLA, which tiles
# the chain fine. 1 MB covers every U-Net stage and the deepest VAE stage.
# The budget is checked against LANE-PADDED bytes (channels round up to 128
# in Mosaic), so narrow-C rows at large HW — e.g. a base_ch=16 VAE at 224²,
# (HW=12544, C=16) — route to XLA instead of OOMing scoped VMEM.
_VMEM_ROW_BUDGET = 1024 * 1024


def group_norm(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray,
    num_groups: int,
    eps: float = 1e-5,
    apply_gelu: bool = False,
    use_pallas: Optional[bool] = None,
) -> jnp.ndarray:
    """Dispatching entry point. ``use_pallas=None`` auto-selects the kernel on
    TPU and the XLA path elsewhere (CPU tests, interpret-mode debugging)."""
    if use_pallas is None:
        use_pallas = pallas_supported()
    B, H, W, C = x.shape
    if H * W * (-(-C // 128) * 128) * 4 > _VMEM_ROW_BUDGET:
        use_pallas = False
    if use_pallas:
        return group_norm_pallas(
            x, weight, bias, num_groups, eps=eps, apply_gelu=apply_gelu
        )
    return group_norm_reference(
        x, weight, bias, num_groups, eps=eps, apply_gelu=apply_gelu
    )

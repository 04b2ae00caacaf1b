"""Pallas kernel parity under CI — every fused kernel runs here through
``pl.pallas_call(interpret=True)`` on CPU and is pinned against its XLA
reference implementation: forward (f32 + bf16) and the custom_vjp backward
(grad-vs-XLA-grad). On TPU the same kernels lower through Mosaic; interpret
mode executes the identical kernel program, so kernel-math regressions
(shift/mask conv taps, per-group lane slices, poly-erf GELU, per-head
slicing) fail CI without a TPU.

Covers VERDICT r1 weak #2: the fused kernels previously had zero automated
coverage (CI only ever exercised the XLA fallback).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_model_tpu.ops.attention import (
    PARAM_KEYS,
    attention_block_pallas,
    attention_block_reference,
)
from diffusion_model_tpu.ops.groupnorm import (
    group_norm,
    group_norm_pallas,
    group_norm_reference,
)
from diffusion_model_tpu.ops.kernel_math import erf_poly, gelu_exact
from diffusion_model_tpu.ops.resblock import (
    resblock,
    resblock_pallas,
    resblock_reference,
)
from diffusion_model_tpu.utils.env import set_pallas_interpret


@pytest.fixture(autouse=True, scope="module")
def _interpret_mode():
    set_pallas_interpret(True)
    yield
    set_pallas_interpret(False)


def _tol(dtype):
    # bf16 kernels use bf16 operands with f32 accumulation; the reference
    # does the same, but rounding points differ slightly.
    if dtype == jnp.bfloat16:
        return dict(rtol=5e-2, atol=5e-2)
    return dict(rtol=2e-5, atol=2e-5)


# ---------------------------------------------------------------------------
# kernel math helpers
# ---------------------------------------------------------------------------

def test_erf_poly_matches_lax_erf():
    x = jnp.linspace(-4.0, 4.0, 201)
    # A&S 7.1.26 max abs error 1.5e-7 in exact arithmetic; f32 evaluation
    # of the polynomial adds a little — observed max ≈ 2.6e-7.
    np.testing.assert_allclose(
        np.asarray(erf_poly(x)), np.asarray(jax.lax.erf(x)), atol=5e-7
    )


def test_gelu_exact_matches_jax_gelu():
    x = jnp.linspace(-6.0, 6.0, 301)
    np.testing.assert_allclose(
        np.asarray(gelu_exact(x)),
        np.asarray(jax.nn.gelu(x, approximate=False)),
        atol=1e-6,
    )


# ---------------------------------------------------------------------------
# GroupNorm
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("num_groups,apply_gelu", [(1, False), (1, True),
                                                   (8, False), (8, True)])
def test_groupnorm_pallas_forward_parity(dtype, num_groups, apply_gelu):
    B, H, W, C = 2, 7, 7, 32
    k = jax.random.PRNGKey(0)
    x = (jax.random.normal(k, (B, H, W, C)) * 2.0).astype(dtype)
    w = jax.random.normal(jax.random.fold_in(k, 1), (C,)) * 0.5 + 1.0
    b = jax.random.normal(jax.random.fold_in(k, 2), (C,)) * 0.1
    got = group_norm_pallas(x, w, b, num_groups, 1e-5, apply_gelu)
    want = group_norm_reference(x, w, b, num_groups, eps=1e-5,
                                apply_gelu=apply_gelu)
    assert got.dtype == x.dtype
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        **_tol(dtype),
    )


@pytest.mark.parametrize("apply_gelu", [False, True])
def test_groupnorm_pallas_grad_parity(apply_gelu):
    B, H, W, C = 2, 4, 4, 16
    k = jax.random.PRNGKey(3)
    x = jax.random.normal(k, (B, H, W, C))
    w = jnp.ones((C,)) * 1.3
    b = jnp.zeros((C,)) + 0.2

    def loss_pallas(x, w, b):
        out = group_norm_pallas(x, w, b, 8, 1e-5, apply_gelu)
        return jnp.sum(out * out)

    def loss_ref(x, w, b):
        out = group_norm_reference(x, w, b, 8, eps=1e-5,
                                   apply_gelu=apply_gelu)
        return jnp.sum(out * out)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, w, b)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, b)
    for a, e in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   rtol=1e-4, atol=1e-5)


def test_groupnorm_dispatch_routes_large_rows_to_xla(monkeypatch):
    """The VMEM row budget must send oversize activations to the XLA path
    even when use_pallas=True is forced."""
    import diffusion_model_tpu.ops.groupnorm as gn

    def boom(*a, **k):
        raise AssertionError("pallas path used beyond the VMEM budget")

    monkeypatch.setattr(gn, "group_norm_pallas", boom)
    x = jnp.ones((1, 224, 224, 64), jnp.float32)  # 12.8 MB row > 1 MB budget
    out = gn.group_norm(x, jnp.ones((64,)), jnp.zeros((64,)), 8,
                        use_pallas=True)
    assert out.shape == x.shape


# ---------------------------------------------------------------------------
# Attention block
# ---------------------------------------------------------------------------

def _attn_params(key, C):
    ks = jax.random.split(key, 12)
    s = 1.0 / float(C) ** 0.5
    return {
        "ln_scale": jnp.ones((C,)), "ln_bias": jnp.zeros((C,)),
        "qkv_w": jax.random.normal(ks[0], (C, 3 * C)) * s,
        "qkv_b": jax.random.normal(ks[1], (3 * C,)) * 0.01,
        "out_w": jax.random.normal(ks[2], (C, C)) * s,
        "out_b": jax.random.normal(ks[3], (C,)) * 0.01,
        "ff_ln_scale": jnp.ones((C,)) * 1.1,
        "ff_ln_bias": jnp.zeros((C,)) - 0.05,
        "ff1_w": jax.random.normal(ks[4], (C, C)) * s,
        "ff1_b": jax.random.normal(ks[5], (C,)) * 0.01,
        "ff2_w": jax.random.normal(ks[6], (C, C)) * s,
        "ff2_b": jax.random.normal(ks[7], (C,)) * 0.01,
    }


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("num_heads", [1, 4])
def test_attention_pallas_forward_parity(dtype, num_heads):
    B, T, C = 2, 16, 32
    k = jax.random.PRNGKey(1)
    x = jax.random.normal(k, (B, T, C)).astype(dtype)
    params = _attn_params(jax.random.fold_in(k, 7), C)
    got = attention_block_pallas(x, params, num_heads)
    want = attention_block_reference(x, params, num_heads=num_heads)
    assert got.dtype == x.dtype
    assert set(PARAM_KEYS) == set(params)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        **_tol(dtype),
    )


def test_attention_pallas_planted_sum_parity():
    """bf16 with C < 128 takes the planted-sum path (Σe rides the PV
    matmul's padding lanes — ops/attention.py::_extend_params_planted);
    parity vs the XLA reference at the production sa5/sa6 channel count."""
    B, T, C = 2, 49, 64
    k = jax.random.PRNGKey(3)
    x = jax.random.normal(k, (B, T, C)).astype(jnp.bfloat16)
    params = _attn_params(jax.random.fold_in(k, 11), C)
    got = attention_block_pallas(x, params, 4)
    want = attention_block_reference(x, params, num_heads=4)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        **_tol(jnp.bfloat16),
    )


def test_attention_pallas_query_chunked_parity():
    """At the sa6 shape (T=784, C=64) the full score block forces one row
    per grid step, so the kernel activates query-axis chunking (R=2,
    tc=392 — ops/attention.py::_attention_pallas_jit). Chunking over t is
    numerically identical to the full block; parity vs the XLA reference
    at the exact production shape, plus the bf16-scores opt-in variant at
    a looser tolerance (softmax weights pick up ~|s|·2⁻⁸ relative error)."""
    from diffusion_model_tpu.ops.attention import _attention_pallas_jit
    from diffusion_model_tpu.utils.env import pallas_interpret

    B, T, C = 2, 784, 64
    k = jax.random.PRNGKey(5)
    x = jax.random.normal(k, (B, T, C)).astype(jnp.bfloat16)
    params = _attn_params(jax.random.fold_in(k, 13), C)
    want = attention_block_reference(x, params, num_heads=4)
    got = attention_block_pallas(x, params, 4)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        **_tol(jnp.bfloat16),
    )
    got_b16 = _attention_pallas_jit(x, params, 4, pallas_interpret(),
                                    bf16_scores=True)
    tol = _tol(jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(got_b16, np.float32), np.asarray(want, np.float32),
        rtol=tol["rtol"] * 4, atol=tol["atol"] * 4,
    )


@pytest.mark.heavy
def test_attention_pallas_grad_parity():
    B, T, C = 1, 9, 16
    k = jax.random.PRNGKey(2)
    x = jax.random.normal(k, (B, T, C))
    params = _attn_params(jax.random.fold_in(k, 9), C)

    def loss_pallas(x, p):
        return jnp.sum(jnp.square(attention_block_pallas(x, p, 4)))

    def loss_ref(x, p):
        return jnp.sum(jnp.square(attention_block_reference(x, p, 4)))

    gx_p, gp_p = jax.grad(loss_pallas, argnums=(0, 1))(x, params)
    gx_r, gp_r = jax.grad(loss_ref, argnums=(0, 1))(x, params)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r),
                               rtol=1e-4, atol=1e-5)
    for key in PARAM_KEYS:
        np.testing.assert_allclose(
            np.asarray(gp_p[key]), np.asarray(gp_r[key]),
            rtol=1e-4, atol=1e-5, err_msg=key,
        )


# ---------------------------------------------------------------------------
# Fused ResBlock (9-shifted-tap im2col conv + GN(1) + GELU chain)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("residual", [False, True])
def test_resblock_pallas_forward_parity(dtype, residual):
    B, H, W = 2, 7, 7
    Cin = 16
    Cout = Cin if residual else 24  # residual adds x, needs matching C
    k = jax.random.PRNGKey(4)
    x = jax.random.normal(k, (B, H, W, Cin)).astype(dtype)
    w1 = jax.random.normal(jax.random.fold_in(k, 1),
                           (3, 3, Cin, Cout)) * 0.1
    w2 = jax.random.normal(jax.random.fold_in(k, 2),
                           (3, 3, Cout, Cout)) * 0.1
    s1, b1 = jnp.ones((Cout,)), jnp.zeros((Cout,))
    s2, b2 = jnp.ones((Cout,)) * 0.9, jnp.zeros((Cout,)) + 0.1
    got = resblock_pallas(x, w1, w2, s1, b1, s2, b2, residual, 1e-5)
    want = resblock_reference(x, w1, w2, s1, b1, s2, b2, residual=residual)
    assert got.dtype == x.dtype
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        **_tol(dtype),
    )


def test_resblock_pallas_nonsquare_edges():
    """Odd/rectangular sizes exercise the row-wraparound column masks."""
    B, H, W, C = 1, 3, 5, 8
    k = jax.random.PRNGKey(5)
    x = jax.random.normal(k, (B, H, W, C))
    w1 = jax.random.normal(jax.random.fold_in(k, 1), (3, 3, C, C)) * 0.2
    w2 = jax.random.normal(jax.random.fold_in(k, 2), (3, 3, C, C)) * 0.2
    ones, zeros = jnp.ones((C,)), jnp.zeros((C,))
    got = resblock_pallas(x, w1, w2, ones, zeros, ones, zeros, True, 1e-5)
    want = resblock_reference(x, w1, w2, ones, zeros, ones, zeros,
                              residual=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.heavy
def test_resblock_pallas_grad_parity():
    B, H, W, C = 1, 4, 4, 8
    k = jax.random.PRNGKey(6)
    x = jax.random.normal(k, (B, H, W, C))
    w1 = jax.random.normal(jax.random.fold_in(k, 1), (3, 3, C, C)) * 0.2
    w2 = jax.random.normal(jax.random.fold_in(k, 2), (3, 3, C, C)) * 0.2
    s1, b1 = jnp.ones((C,)), jnp.zeros((C,))
    s2, b2 = jnp.ones((C,)), jnp.zeros((C,))

    def loss(f):
        def inner(x, w1, w2):
            return jnp.sum(jnp.square(
                f(x, w1, w2, s1, b1, s2, b2)
            ))
        return inner

    pal = functools.partial(resblock_pallas, residual=True, eps=1e-5)
    ref = functools.partial(resblock_reference, residual=True, eps=1e-5)
    gp = jax.grad(loss(pal), argnums=(0, 1, 2))(x, w1, w2)
    gr = jax.grad(loss(ref), argnums=(0, 1, 2))(x, w1, w2)
    for a, e in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   rtol=1e-4, atol=1e-5)


def test_resblock_dispatch_routes_large_rows_to_xla(monkeypatch):
    import importlib

    # ops/__init__ re-exports a function named `resblock`, which shadows the
    # submodule under plain attribute access — import the module explicitly
    rb = importlib.import_module("diffusion_model_tpu.ops.resblock")

    def boom(*a, **k):
        raise AssertionError("pallas path used beyond the VMEM budget")

    monkeypatch.setattr(rb, "resblock_pallas", boom)
    C = 64
    x = jnp.ones((1, 112, 112, C), jnp.float32)  # 3.2 MB row > 1 MB budget
    w = jnp.zeros((3, 3, C, C))
    out = rb.resblock(x, w, w, jnp.ones((C,)), jnp.zeros((C,)),
                      jnp.ones((C,)), jnp.zeros((C,)), use_pallas=True)
    assert out.shape == x.shape


def test_dispatchers_use_pallas_flag_in_interpret_mode():
    """use_pallas=True must reach the kernels (interpret here) on CPU."""
    x = jnp.ones((1, 4, 4, 8), jnp.float32)
    out = group_norm(x, jnp.ones((8,)), jnp.zeros((8,)), 1, use_pallas=True)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-5)
    w = jnp.zeros((3, 3, 8, 8))
    out2 = resblock(x, w, w, jnp.ones((8,)), jnp.zeros((8,)),
                    jnp.ones((8,)), jnp.zeros((8,)), use_pallas=True)
    assert out2.shape == x.shape


@pytest.mark.parametrize("hw", [(1, 1), (2, 2), (1, 3)])
def test_resblock_pallas_degenerate_spatial(hw):
    """Shift offsets beyond the row count (dy*W+dx >= H*W) must zero the
    tap, not mis-shape the im2col concat — the 64px config bottoms out at a
    1x1 activation in down3 (regression: crashed on TPU at 64px)."""
    H, W = hw
    B, C = 2, 8
    k = jax.random.PRNGKey(8)
    x = jax.random.normal(k, (B, H, W, C))
    w1 = jax.random.normal(jax.random.fold_in(k, 1), (3, 3, C, C)) * 0.3
    w2 = jax.random.normal(jax.random.fold_in(k, 2), (3, 3, C, C)) * 0.3
    ones, zeros = jnp.ones((C,)), jnp.zeros((C,))
    got = resblock_pallas(x, w1, w2, ones, zeros, ones, zeros, True, 1e-5)
    want = resblock_reference(x, w1, w2, ones, zeros, ones, zeros,
                              residual=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


# ---------------------------------------------------------------------------
# multi-row grid steps (batch-throughput lever; VERDICT r1 weak #5)
# ---------------------------------------------------------------------------

def test_rows_per_step_divides_batch():
    from diffusion_model_tpu.ops.kernel_math import rows_per_step

    # respects the VMEM budget
    assert rows_per_step(32, row_bytes=1024 * 1024,
                         budget=4 * 1024 * 1024) == 4
    # always divides the batch, including primes
    assert rows_per_step(7, row_bytes=1) == 7
    assert rows_per_step(12, row_bytes=1024 * 1024,
                         budget=5 * 1024 * 1024) == 4
    # never exceeds cap or batch
    assert rows_per_step(64, row_bytes=1) == 16
    assert rows_per_step(2, row_bytes=1) == 2
    # degenerate budget still yields a valid grid
    assert rows_per_step(9, row_bytes=10**9) == 1


@pytest.mark.parametrize("B", [1, 3, 8])
def test_multirow_kernels_match_single_row_math(B):
    """Parity must hold for any batch size: grids pack R rows per step with
    R an automatically chosen divisor of B (kernel_math.rows_per_step)."""
    k = jax.random.PRNGKey(11)
    C = 8
    x = jax.random.normal(k, (B, 4, 4, C))
    w1 = jax.random.normal(jax.random.fold_in(k, 1), (3, 3, C, C)) * 0.3
    w2 = jax.random.normal(jax.random.fold_in(k, 2), (3, 3, C, C)) * 0.3
    ones, zeros = jnp.ones((C,)), jnp.zeros((C,))
    got = resblock_pallas(x, w1, w2, ones, zeros, ones, zeros, False, 1e-5)
    want = resblock_reference(x, w1, w2, ones, zeros, ones, zeros)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)

    got_gn = group_norm_pallas(x, ones, zeros, 2)
    want_gn = group_norm_reference(x, ones, zeros, 2)
    np.testing.assert_allclose(np.asarray(got_gn), np.asarray(want_gn),
                               rtol=2e-5, atol=2e-5)

    T, C2 = 16, 8
    tok = jax.random.normal(jax.random.fold_in(k, 3), (B, T, C2))
    p = {}
    for i, name in enumerate(PARAM_KEYS):
        kk = jax.random.fold_in(k, 10 + i)
        if name.endswith("_w"):
            shape = (C2, 3 * C2) if name == "qkv_w" else (C2, C2)
            p[name] = jax.random.normal(kk, shape) * 0.2
        elif name == "qkv_b":
            p[name] = jax.random.normal(kk, (3 * C2,)) * 0.1
        else:
            p[name] = jax.random.normal(kk, (C2,)) * 0.1
    got_at = attention_block_pallas(tok, p, 4)
    want_at = attention_block_reference(tok, p, 4)
    np.testing.assert_allclose(np.asarray(got_at), np.asarray(want_at),
                               rtol=2e-5, atol=2e-5)

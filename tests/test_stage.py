"""Parity tests for the fused stage kernel (ops/stage.py) — the round-3
row-batched replacement for per-ResBlock kernels — in Pallas interpret mode
on CPU, pinned against the XLA reference composition and against the
round-2 per-block kernels' reference math.

Also pins that the model integration (layers.Down/Up, unet bottleneck)
produces identical results with fusion on and off, and that checkpoint
param paths are unchanged from round 2.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_model_tpu.ops.resblock import resblock_reference
from diffusion_model_tpu.ops.stage import (
    fused_stage,
    fused_stage_pallas,
    fused_stage_reference,
)
from diffusion_model_tpu.utils.env import set_pallas_interpret


@pytest.fixture(autouse=True, scope="module")
def _interpret_mode():
    set_pallas_interpret(True)
    yield
    set_pallas_interpret(False)


def _tol(dtype):
    if dtype == jnp.bfloat16:
        return dict(rtol=5e-2, atol=5e-2)
    return dict(rtol=2e-5, atol=2e-5)


def _mk_block(key, cin, mid, cout):
    k1, k2 = jax.random.split(key)
    return {
        "w1": jax.random.normal(k1, (3, 3, cin, mid)) * 0.2,
        "w2": jax.random.normal(k2, (3, 3, mid, cout)) * 0.2,
        "s1": jnp.ones((mid,)) + 0.1, "b1": jnp.zeros((mid,)) - 0.05,
        "s2": jnp.ones((cout,)) - 0.1, "b2": jnp.zeros((cout,)) + 0.05,
    }


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("shape,chans,residuals", [
    ((4, 7, 7, 16), [(16, 16), (24, 32)], (True, False)),   # Down/Up stage
    ((2, 3, 3, 32), [(48, 48), (48, 48), (24, 24)],
     (False, False, False)),                                # bottleneck
    ((3, 5, 5, 8), [(8, 8)], (True,)),                      # single block
])
def test_stage_kernel_matches_reference(dtype, shape, chans, residuals):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, shape).astype(dtype)
    cin = shape[-1]
    blocks = []
    for i, (mid, cout) in enumerate(chans):
        blocks.append(_mk_block(jax.random.fold_in(key, i), cin, mid, cout))
        cin = cout
    emb = jax.random.normal(jax.random.fold_in(key, 99),
                            (shape[0], cin)).astype(dtype)
    for e in (None, emb):
        ref = fused_stage_reference(x, blocks, residuals, e)
        out = fused_stage_pallas(x, tuple(blocks), tuple(residuals), e)
        assert out.dtype == x.dtype and out.shape == ref.shape
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            **_tol(dtype))


def test_stage_matches_sequential_resblocks():
    """Two-block stage == two round-2 resblock_reference calls + emb add."""
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (2, 7, 7, 12))
    b1 = _mk_block(jax.random.fold_in(key, 0), 12, 12, 12)
    b2 = _mk_block(jax.random.fold_in(key, 1), 12, 6, 10)
    emb = jax.random.normal(jax.random.fold_in(key, 2), (2, 10))
    h = resblock_reference(x, b1["w1"], b1["w2"], b1["s1"], b1["b1"],
                           b1["s2"], b1["b2"], residual=True)
    h = resblock_reference(h, b2["w1"], b2["w2"], b2["s1"], b2["b1"],
                           b2["s2"], b2["b2"], residual=False)
    seq = h + emb[:, None, None, :]
    out = fused_stage_pallas(x, (b1, b2), (True, False), emb)
    np.testing.assert_allclose(np.asarray(out), np.asarray(seq),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.heavy
def test_stage_custom_vjp_grads_match_reference():
    key = jax.random.PRNGKey(5)
    x = jax.random.normal(key, (2, 5, 5, 8))
    b1 = _mk_block(jax.random.fold_in(key, 0), 8, 8, 8)
    b2 = _mk_block(jax.random.fold_in(key, 1), 8, 4, 6)
    emb = jax.random.normal(jax.random.fold_in(key, 2), (2, 6))

    def loss_pallas(x_, blocks_, emb_):
        return jnp.sum(fused_stage_pallas(x_, blocks_, (True, False),
                                          emb_) ** 2)

    def loss_ref(x_, blocks_, emb_):
        return jnp.sum(fused_stage_reference(x_, blocks_, (True, False),
                                             emb_) ** 2)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, (b1, b2), emb)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, (b1, b2), emb)
    for a, b in zip(jax.tree_util.tree_leaves(gp),
                    jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_stage_odd_1xW_activation():
    """|shift| >= HW taps (1×W rows at the U-Net bottom) must zero-fill."""
    key = jax.random.PRNGKey(7)
    x = jax.random.normal(key, (2, 1, 3, 4))
    b = _mk_block(key, 4, 4, 4)
    ref = fused_stage_reference(x, [b], (False,), None)
    out = fused_stage_pallas(x, (b,), (False,), None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.heavy
def test_unet_param_paths_unchanged():
    """Round-2 checkpoints must keep loading: the fused-stage integration
    may not move any Flax param path."""
    from diffusion_model_tpu.models import CondUNet, UNetConfig

    unet = CondUNet(UNetConfig(in_ch=4, base_ch=8, time_dim=16,
                               num_classes=3, with_geom_head=True))
    rng = jax.random.PRNGKey(0)
    z = jnp.zeros((1, 28, 28, 4))
    params = unet.init(rng, z, jnp.ones((1,), jnp.int32),
                       jnp.zeros((1,), jnp.int32), jnp.zeros((1, 12)),
                       jnp.zeros((1, 12)))["params"]
    paths = {"/".join(p) for p, _ in
             jax.tree_util.tree_flatten_with_path(params)[0]
             for p in [tuple(k.key for k in p)]}
    # spot-pin the scopes the round-2 layout used (one per module kind)
    for expected in (
        "inc/conv1_kernel", "down1/res1/gn1_scale", "down1/res2/conv2_kernel",
        "down1/emb/proj/kernel", "bot1/conv1_kernel", "bot2/gn2_bias",
        "bot3/conv2_kernel", "up1/res1/conv1_kernel", "up3/emb/proj/bias",
        "sa1/qkv_w", "out/kernel", "geom_head/fc1/kernel", "class_emb/embedding",
        "cond_fc1/kernel",
    ):
        assert expected in paths, f"param path moved: {expected}"


def test_stage_hybrid_matches_reference():
    """XLA-convs + Pallas-GN hybrid (DIFFUSION_TPU_STAGE_GN_PALLAS=1) must
    match the pure-XLA reference; the GN kernel runs in interpret mode via
    this module's autouse fixture."""
    from diffusion_model_tpu.ops.stage import fused_stage_hybrid

    key = jax.random.PRNGKey(7)
    x = jax.random.normal(key, (3, 7, 7, 16))
    b1 = _mk_block(jax.random.fold_in(key, 1), 16, 16, 16)
    b2 = _mk_block(jax.random.fold_in(key, 2), 16, 24, 32)
    emb = jax.random.normal(jax.random.fold_in(key, 3), (3, 32))
    for e in (None, emb):
        ref = fused_stage_reference(x, [b1, b2], (True, False), e)
        out = fused_stage_hybrid(x, [b1, b2], (True, False), e)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            **_tol(jnp.float32))


def test_stage_hybrid_grads_match_reference():
    from diffusion_model_tpu.ops.stage import fused_stage_hybrid

    key = jax.random.PRNGKey(8)
    x = jax.random.normal(key, (2, 5, 5, 8))
    b = _mk_block(jax.random.fold_in(key, 1), 8, 8, 8)

    def loss_h(x_, b_):
        return jnp.sum(fused_stage_hybrid(x_, [b_], (True,)) ** 2)

    def loss_r(x_, b_):
        return jnp.sum(fused_stage_reference(x_, [b_], (True,)) ** 2)

    gh = jax.grad(loss_h, argnums=(0, 1))(x, b)
    gr = jax.grad(loss_r, argnums=(0, 1))(x, b)
    for a, r in zip(jax.tree.leaves(gh), jax.tree.leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=2e-4, atol=2e-4)

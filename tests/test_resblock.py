"""Fused ResBlock op: XLA reference vs torch composition; conv-via-shifts
logic pinned against lax.conv on CPU (the Pallas kernel itself is verified
on TPU — see .claude/skills/verify)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

from diffusion_model_tpu.ops.resblock import resblock, resblock_reference


def _params(rng, cin, cmid, cout):
    return dict(
        w1=jnp.asarray(rng.normal(size=(3, 3, cin, cmid)).astype(np.float32) * 0.1),
        w2=jnp.asarray(rng.normal(size=(3, 3, cmid, cout)).astype(np.float32) * 0.1),
        gn1_scale=jnp.asarray(rng.normal(size=(cmid,)).astype(np.float32)),
        gn1_bias=jnp.asarray(rng.normal(size=(cmid,)).astype(np.float32) * 0.1),
        gn2_scale=jnp.asarray(rng.normal(size=(cout,)).astype(np.float32)),
        gn2_bias=jnp.asarray(rng.normal(size=(cout,)).astype(np.float32) * 0.1),
    )


@pytest.mark.parametrize("residual", [False, True])
def test_resblock_reference_matches_torch(residual):
    rng = np.random.default_rng(0)
    cin = cout = 8
    cmid = 8
    x = rng.normal(size=(2, 7, 7, cin)).astype(np.float32)
    p = _params(rng, cin, cmid, cout)

    with jax.default_matmul_precision("highest"):
        ours = np.asarray(resblock_reference(
            jnp.asarray(x), p["w1"], p["w2"], p["gn1_scale"], p["gn1_bias"],
            p["gn2_scale"], p["gn2_bias"], residual=residual,
        ))

    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    w1t = torch.from_numpy(np.asarray(p["w1"])).permute(3, 2, 0, 1)
    w2t = torch.from_numpy(np.asarray(p["w2"])).permute(3, 2, 0, 1)
    with torch.no_grad():
        h = TF.conv2d(xt, w1t, padding=1)
        h = TF.gelu(TF.group_norm(h, 1, torch.from_numpy(np.asarray(p["gn1_scale"])),
                                  torch.from_numpy(np.asarray(p["gn1_bias"]))))
        h = TF.conv2d(h, w2t, padding=1)
        h = TF.group_norm(h, 1, torch.from_numpy(np.asarray(p["gn2_scale"])),
                          torch.from_numpy(np.asarray(p["gn2_bias"])))
        ref = TF.gelu(xt + h) if residual else h
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-4)


def test_conv_via_shifts_matches_lax_conv():
    """The kernel's flat-shift + column-mask conv math, executed as plain
    jnp on CPU, must equal lax.conv exactly."""
    from diffusion_model_tpu.ops.resblock import _conv3x3_flat, _stack_taps

    rng = np.random.default_rng(1)
    B, H, W, Cin, Cout = 2, 6, 5, 4, 8
    x = rng.normal(size=(B, H, W, Cin)).astype(np.float32)
    w = rng.normal(size=(3, 3, Cin, Cout)).astype(np.float32)

    ref = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    col = jax.lax.broadcasted_iota(jnp.int32, (H * W, 1), 0) % W
    wmat = _stack_taps(jnp.asarray(w))
    with jax.default_matmul_precision("highest"):
        for b in range(B):
            out = _conv3x3_flat(jnp.asarray(x[b].reshape(H * W, Cin)),
                                wmat, W, col, jnp.float32)
            np.testing.assert_allclose(
                np.asarray(out).reshape(H, W, Cout), np.asarray(ref[b]),
                rtol=1e-4, atol=1e-5,
            )


def test_resblock_dispatch_and_grad_cpu():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 8)).astype(np.float32))
    p = _params(rng, 8, 8, 8)

    out = resblock(x, p["w1"], p["w2"], p["gn1_scale"], p["gn1_bias"],
                   p["gn2_scale"], p["gn2_bias"], residual=True)
    assert out.shape == x.shape
    g = jax.grad(lambda x: resblock(
        x, p["w1"], p["w2"], p["gn1_scale"], p["gn1_bias"], p["gn2_scale"],
        p["gn2_bias"], residual=True).sum())(x)
    assert np.isfinite(np.asarray(g)).all()


def test_resblock_bf16_grads():
    """bf16 activations with f32 params must differentiate (the production
    training dtype mix; a mixed-dtype conv output broke the transpose)."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 8)), jnp.bfloat16)
    p = _params(rng, 8, 8, 8)
    gw = jax.grad(lambda w1: resblock(
        x, w1, p["w2"], p["gn1_scale"], p["gn1_bias"], p["gn2_scale"],
        p["gn2_bias"], residual=True).astype(jnp.float32).sum())(p["w1"])
    assert gw.dtype == jnp.float32
    assert np.isfinite(np.asarray(gw)).all()


def test_resblock_module_param_tree():
    from diffusion_model_tpu.models import ResBlock

    m = ResBlock(16, residual=False)
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 8)))["params"]
    assert set(params) == {
        "conv1_kernel", "conv2_kernel", "gn1_scale", "gn1_bias",
        "gn2_scale", "gn2_bias",
    }
    assert params["conv1_kernel"].shape == (3, 3, 8, 16)

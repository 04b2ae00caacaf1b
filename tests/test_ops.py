"""Op-level parity: GroupNorm/attention vs torch, align_corners bilinear vs
torch, pad-to-skip behavior. torch (CPU) is available in the image, so these
pin our numerics against the exact ATen semantics the reference relied on."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

from diffusion_model_tpu.ops import (
    attention_block_reference,
    group_norm_reference,
    pad_to_match,
    upsample2x,
    upsample_bilinear_align_corners,
)


@pytest.mark.parametrize("groups,c", [(1, 16), (8, 32)])
def test_groupnorm_matches_torch(groups, c):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 7, 7, c)).astype(np.float32)
    w = rng.normal(size=(c,)).astype(np.float32)
    b = rng.normal(size=(c,)).astype(np.float32)

    ours = np.asarray(
        group_norm_reference(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), groups)
    )
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)  # NCHW
    ref = TF.group_norm(xt, groups, torch.from_numpy(w), torch.from_numpy(b))
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_groupnorm_gelu_fused_matches_unfused():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 4, 4, 8)).astype(np.float32))
    w = jnp.ones((8,))
    b = jnp.zeros((8,))
    fused = group_norm_reference(x, w, b, 1, apply_gelu=True)
    unfused = jax.nn.gelu(group_norm_reference(x, w, b, 1), approximate=False)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(unfused), atol=1e-6)


@pytest.mark.parametrize("hw", [(3, 3), (7, 7), (14, 14), (5, 9)])
def test_bilinear_align_corners_matches_torch(hw):
    rng = np.random.default_rng(2)
    h, w = hw
    x = rng.normal(size=(2, h, w, 3)).astype(np.float32)
    ours = np.asarray(upsample2x(jnp.asarray(x)))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    ref = TF.interpolate(xt, scale_factor=2, mode="bilinear", align_corners=True)
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_pad_to_match_matches_torch_pad_rule():
    """Up-path rule (unet.py:89-95): pad diff//2 before, diff-diff//2 after."""
    x = jnp.asarray(np.arange(2 * 6 * 6 * 1, dtype=np.float32).reshape(2, 6, 6, 1))
    out = pad_to_match(x, 7, 7)
    assert out.shape == (2, 7, 7, 1)
    xt = torch.from_numpy(np.asarray(x)).permute(0, 3, 1, 2)
    ref = TF.pad(xt, [0, 1, 0, 1])  # diff=1 → left/top 0, right/bottom 1
    np.testing.assert_allclose(
        np.asarray(out), ref.permute(0, 2, 3, 1).numpy()
    )


def test_attention_block_matches_torch_mha():
    """Pin the whole block (LN → MHA → res-on-normed → FF + res) against a
    torch implementation mirroring the reference AttenionBlock."""
    C, T, B, H = 16, 9, 2, 4
    rng = np.random.default_rng(3)
    x = rng.normal(size=(B, T, C)).astype(np.float32)

    p = {
        "ln_scale": rng.normal(size=(C,)).astype(np.float32),
        "ln_bias": rng.normal(size=(C,)).astype(np.float32),
        "qkv_w": rng.normal(size=(C, 3 * C)).astype(np.float32) * 0.2,
        "qkv_b": rng.normal(size=(3 * C,)).astype(np.float32) * 0.1,
        "out_w": rng.normal(size=(C, C)).astype(np.float32) * 0.2,
        "out_b": rng.normal(size=(C,)).astype(np.float32) * 0.1,
        "ff_ln_scale": rng.normal(size=(C,)).astype(np.float32),
        "ff_ln_bias": rng.normal(size=(C,)).astype(np.float32),
        "ff1_w": rng.normal(size=(C, C)).astype(np.float32) * 0.2,
        "ff1_b": rng.normal(size=(C,)).astype(np.float32) * 0.1,
        "ff2_w": rng.normal(size=(C, C)).astype(np.float32) * 0.2,
        "ff2_b": rng.normal(size=(C,)).astype(np.float32) * 0.1,
    }

    ours = np.asarray(
        attention_block_reference(jnp.asarray(x), {k: jnp.asarray(v) for k, v in p.items()}, num_heads=H)
    )

    # torch mirror of reference unet.py:44-51
    xt = torch.from_numpy(x)
    ln = torch.nn.LayerNorm(C)
    ln.weight.data = torch.from_numpy(p["ln_scale"])
    ln.bias.data = torch.from_numpy(p["ln_bias"])
    mha = torch.nn.MultiheadAttention(C, H, batch_first=True)
    mha.in_proj_weight.data = torch.from_numpy(p["qkv_w"].T.copy())
    mha.in_proj_bias.data = torch.from_numpy(p["qkv_b"])
    mha.out_proj.weight.data = torch.from_numpy(p["out_w"].T.copy())
    mha.out_proj.bias.data = torch.from_numpy(p["out_b"])
    ff_ln = torch.nn.LayerNorm(C)
    ff_ln.weight.data = torch.from_numpy(p["ff_ln_scale"])
    ff_ln.bias.data = torch.from_numpy(p["ff_ln_bias"])
    l1 = torch.nn.Linear(C, C)
    l1.weight.data = torch.from_numpy(p["ff1_w"].T.copy())
    l1.bias.data = torch.from_numpy(p["ff1_b"])
    l2 = torch.nn.Linear(C, C)
    l2.weight.data = torch.from_numpy(p["ff2_w"].T.copy())
    l2.bias.data = torch.from_numpy(p["ff2_b"])

    with torch.no_grad():
        x_ln = ln(xt)
        av, _ = mha(x_ln, x_ln, x_ln)
        av = av + x_ln  # quirk: residual on the normed tensor
        ref = l2(TF.gelu(l1(ff_ln(av)))) + av

    np.testing.assert_allclose(ours, ref.numpy(), rtol=2e-4, atol=2e-5)


def test_maxpool_floors_odd_sizes():
    import flax.linen as nn

    x = jnp.asarray(np.arange(7 * 7, dtype=np.float32).reshape(1, 7, 7, 1))
    out = nn.max_pool(x, (2, 2), strides=(2, 2))
    assert out.shape == (1, 3, 3, 1)  # torch MaxPool2d(2) floors: 7 → 3
    xt = torch.from_numpy(np.asarray(x)).permute(0, 3, 1, 2)
    ref = TF.max_pool2d(xt, 2).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(out), ref)


def test_group_norm_dispatch_accounts_for_lane_padding(monkeypatch):
    """Narrow-C rows at large HW must route to XLA: Mosaic pads channels to
    128 lanes, so a (112, 112, 16) row really costs HW x 128 lanes of VMEM
    per temp (observed 30 MB scoped-VMEM OOM on TPU for a base_ch=16 VAE
    at 224 x 224). The dispatch budget uses lane-padded bytes."""
    from diffusion_model_tpu.ops import groupnorm as gn

    calls = {"pallas": 0}

    def fake_pallas(*a, **k):
        calls["pallas"] += 1
        return gn.group_norm_reference(*a, **k)

    monkeypatch.setattr(gn, "group_norm_pallas", fake_pallas)
    monkeypatch.setattr(gn, "pallas_supported", lambda: True)
    w = jnp.ones((16,))
    b = jnp.zeros((16,))
    # 112*112*roundup(16,128)*4 = 6.4 MB > 1 MB budget -> XLA even though
    # the un-padded size (784 KB) would have fit
    gn.group_norm(jnp.zeros((1, 112, 112, 16)), w, b, 8)
    assert calls["pallas"] == 0
    # small rows still take the kernel
    gn.group_norm(jnp.zeros((1, 28, 28, 16)), w, b, 8)
    assert calls["pallas"] == 1

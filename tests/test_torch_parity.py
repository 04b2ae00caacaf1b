"""Whole-model torch weight-port parity (VERDICT r1 weak #6 / next #3).

Block-level parity (GroupNorm / attention / resblock / upsample / maxpool /
pad) lives in tests/test_ops.py and tests/test_resblock.py. This file pins
the remaining ASSEMBLED-model semantic claims in one place: the reference
``UnetCondWithGeomHead`` (/root/reference/models/unet_cond_geom.py:79-100 +
unet_cond.py:102-216) and ``VAE`` (/root/reference/models/vae.py:51-76) are
re-built in torch at full reference size, ONE set of weights is ported into
the Flax models, and outputs are asserted equal:

- eps_pred + geom_pred of the full U-Net at the 28×28 latent,
- VAE encoder stats (mu/logvar) and decoder output at 224×224,
- which together pin: Flax ConvTranspose(padding=SAME) + rot180-transposed
  kernel ≡ torch ConvTranspose2d(k4,s2,p1); the fused-embedding sum order
  (pos_enc(t) + class_emb(y) + cond_mlp(cat(vals,mask))); the GeomHead tap
  point (64-ch pre-out feature); torch MHA packed in-proj → split qkv; and
  the Down/Up time-embedding broadcast-add placement.
"""
import numpy as np
import pytest
import torch
from torch import nn as tnn
from torch.nn import functional as tF

import jax
import jax.numpy as jnp

from diffusion_model_tpu.models import VAE, VAEConfig, CondUNet, UNetConfig

pytestmark = pytest.mark.heavy


# ---------------------------------------------------------------------------
# torch reference architectures (re-stated from the reference definitions;
# math must match /root/reference/models/* exactly — see file:line cites)
# ---------------------------------------------------------------------------

class TResBlock(tnn.Module):
    """unet_cond.py:10-30: conv3x3(no bias)→GN(1)→GELU→conv3x3(no bias)→GN(1),
    optional residual with post-add GELU."""

    def __init__(self, cin, cout, cmid=None, residual=False):
        super().__init__()
        cmid = cmid or cout
        self.residual = residual
        self.body = tnn.Sequential(
            tnn.Conv2d(cin, cmid, 3, padding=1, bias=False),
            tnn.GroupNorm(1, cmid), tnn.GELU(),
            tnn.Conv2d(cmid, cout, 3, padding=1, bias=False),
            tnn.GroupNorm(1, cout),
        )

    def forward(self, x):
        h = self.body(x)
        return tF.gelu(x + h) if self.residual else h


class TAttn(tnn.Module):
    """unet_cond.py:32-52 incl. the x_ln = x = ln(x) residual quirk."""

    def __init__(self, c):
        super().__init__()
        self.c = c
        self.ln = tnn.LayerNorm([c])
        self.mha = tnn.MultiheadAttention(c, 4, batch_first=True)
        self.ff = tnn.Sequential(
            tnn.LayerNorm([c]), tnn.Linear(c, c), tnn.GELU(), tnn.Linear(c, c)
        )

    def forward(self, x):
        size = x.shape[-1]
        t = x.view(-1, self.c, size * size).swapaxes(1, 2)
        t_ln = t = self.ln(t)
        a, _ = self.mha(t_ln, t_ln, t_ln)
        a = a + t
        a = self.ff(a) + a
        return a.swapaxes(2, 1).view(-1, self.c, size, size)


class TDown(tnn.Module):
    """unet_cond.py:54-69."""

    def __init__(self, cin, cout, emb_dim=256):
        super().__init__()
        self.pool = tnn.MaxPool2d(2)
        self.res1 = TResBlock(cin, cin, residual=True)
        self.res2 = TResBlock(cin, cout)
        self.emb = tnn.Sequential(tnn.SiLU(), tnn.Linear(emb_dim, cout))

    def forward(self, x, t):
        x = self.res2(self.res1(self.pool(x)))
        e = self.emb(t)[:, :, None, None]
        return x + e.expand(-1, -1, x.shape[-2], x.shape[-1])


class TUp(tnn.Module):
    """unet_cond.py:71-99: bilinear x2 align_corners, pad-to-skip, concat."""

    def __init__(self, cin, cout, emb_dim=256):
        super().__init__()
        self.up = tnn.Upsample(scale_factor=2, mode="bilinear",
                               align_corners=True)
        self.res1 = TResBlock(cin, cin, residual=True)
        self.res2 = TResBlock(cin, cout, cin // 2)
        self.emb = tnn.Sequential(tnn.SiLU(), tnn.Linear(emb_dim, cout))

    def forward(self, x, skip, t):
        x = self.up(x)
        dy, dx = skip.size(2) - x.size(2), skip.size(3) - x.size(3)
        if dy or dx:
            x = tF.pad(x, [max(0, dx // 2), max(0, dx - dx // 2),
                           max(0, dy // 2), max(0, dy - dy // 2)])
        x = self.res2(self.res1(torch.cat([skip, x], dim=1)))
        e = self.emb(t)[:, :, None, None]
        return x + e.expand(-1, -1, x.shape[-2], x.shape[-1])


class TUNetGeom(tnn.Module):
    """UnetCondWithGeomHead at reference defaults (in_ch=4, time_dim=256,
    num_classes=3, geom_dim=12, deep bottleneck); forward per
    unet_cond_geom.py:79-100 (no internal dropout)."""

    def __init__(self, in_ch=4, time_dim=256, num_classes=3, geom_dim=12):
        super().__init__()
        self.time_dim = time_dim
        self.class_emb = tnn.Embedding(num_classes + 1, time_dim)
        self.cond_mlp = tnn.Sequential(
            tnn.Linear(geom_dim * 2, time_dim), tnn.SiLU(),
            tnn.Linear(time_dim, time_dim),
        )
        self.inc = TResBlock(in_ch, 64)
        self.down1, self.sa1 = TDown(64, 128), TAttn(128)
        self.down2, self.sa2 = TDown(128, 256), TAttn(256)
        self.down3, self.sa3 = TDown(256, 256), TAttn(256)
        self.bot1 = TResBlock(256, 512)
        self.bot2 = TResBlock(512, 512)
        self.bot3 = TResBlock(512, 256)
        self.up1, self.sa4 = TUp(512, 128), TAttn(128)
        self.up2, self.sa5 = TUp(256, 64), TAttn(64)
        self.up3, self.sa6 = TUp(128, 64), TAttn(64)
        self.out = tnn.Conv2d(64, in_ch, 1)
        self.geom_head = tnn.Sequential(
            tnn.Linear(64, 256), tnn.SiLU(), tnn.Linear(256, geom_dim)
        )

    def pos_encoding(self, t, channels):
        """unet_cond.py:159-165."""
        inv = 1.0 / (10000 ** (torch.arange(0, channels, 2).float() / channels))
        ang = t.repeat(1, channels // 2) * inv
        return torch.cat([torch.sin(ang), torch.cos(ang)], dim=-1)

    def forward(self, x, t, y, vals, mask):
        emb = self.pos_encoding(t.unsqueeze(-1).float(), self.time_dim)
        emb = emb + self.class_emb(y)
        emb = emb + self.cond_mlp(torch.cat([vals, mask], dim=1))
        x1 = self.inc(x)
        x2 = self.sa1(self.down1(x1, emb))
        x3 = self.sa2(self.down2(x2, emb))
        x4 = self.sa3(self.down3(x3, emb))
        x4 = self.bot3(self.bot2(self.bot1(x4)))
        h = self.sa4(self.up1(x4, x3, emb))
        h = self.sa5(self.up2(h, x2, emb))
        h = self.sa6(self.up3(h, x1, emb))
        feat = h                       # 64-ch pre-out tap (unet_cond_geom.py:69)
        return self.out(h), self.geom_head(feat.mean(dim=(2, 3)))


def _vae_stage(cin, cout):
    """One encoder stage: conv3x3 s1 → GN(8) → GELU → conv4x4 s2 → GN(8) →
    GELU (vae.py:17-29)."""
    return [
        tnn.Conv2d(cin, cout, 3, stride=1, padding=1),
        tnn.GroupNorm(8, cout), tnn.GELU(),
        tnn.Conv2d(cout, cout, 4, stride=2, padding=1),
        tnn.GroupNorm(8, cout), tnn.GELU(),
    ]


def _vae_destage(cin, cout):
    """One decoder stage: conv3x3 → GN(8) → GELU → convT 4x4 s2 p1 → GN(8) →
    GELU (vae.py:36-48); conv changes channels, convT keeps them."""
    return [
        tnn.Conv2d(cin, cout, 3, padding=1),
        tnn.GroupNorm(8, cout), tnn.GELU(),
        tnn.ConvTranspose2d(cout, cout, 4, stride=2, padding=1),
        tnn.GroupNorm(8, cout), tnn.GELU(),
    ]


class TVAE(tnn.Module):
    """Reference VAE (vae.py:6-76), b=base_channels."""

    def __init__(self, b=64, z=4):
        super().__init__()
        self.enc = tnn.Sequential(
            *_vae_stage(3, b), *_vae_stage(b, 2 * b), *_vae_stage(2 * b, 4 * b)
        )
        self.to_mu = tnn.Conv2d(4 * b, z, 1)
        self.to_logvar = tnn.Conv2d(4 * b, z, 1)
        self.dec = tnn.Sequential(
            *_vae_destage(z, 4 * b), *_vae_destage(4 * b, 2 * b),
            *_vae_destage(2 * b, b), tnn.Conv2d(b, 3, 3, padding=1),
        )

    def encode_stats(self, x):
        h = self.enc(x)
        return self.to_mu(h), self.to_logvar(h).clamp(-30.0, 20.0)

    def decode(self, z, scale=0.18215):
        return torch.sigmoid(self.dec(z / scale))


# ---------------------------------------------------------------------------
# weight porting: torch → flax param dicts
# ---------------------------------------------------------------------------

def _np(t):
    return t.detach().numpy()


def conv_p(c):
    """torch Conv2d (O,I,kh,kw) → flax {kernel HWIO, bias}."""
    p = {"kernel": _np(c.weight).transpose(2, 3, 1, 0)}
    if c.bias is not None:
        p["bias"] = _np(c.bias)
    return p


def convT_p(c):
    """torch ConvTranspose2d (I,O,kh,kw) → flax ConvTranspose(padding=SAME)
    kernel: HWIO with a spatial rot180 (pinned by this test; the SAME-pad
    k4s2 geometry then matches torch's p=1 exactly)."""
    k = _np(c.weight).transpose(2, 3, 0, 1)[::-1, ::-1].copy()
    return {"kernel": k, "bias": _np(c.bias)}


def dense_p(l):
    return {"kernel": _np(l.weight).T.copy(), "bias": _np(l.bias)}


def gn_p(g):
    return {"scale": _np(g.weight), "bias": _np(g.bias)}


def res_p(rb: TResBlock):
    b = rb.body
    return {
        "conv1_kernel": _np(b[0].weight).transpose(2, 3, 1, 0),
        "gn1_scale": _np(b[1].weight), "gn1_bias": _np(b[1].bias),
        "conv2_kernel": _np(b[3].weight).transpose(2, 3, 1, 0),
        "gn2_scale": _np(b[4].weight), "gn2_bias": _np(b[4].bias),
    }


def attn_p(a: TAttn):
    return {
        "ln_scale": _np(a.ln.weight), "ln_bias": _np(a.ln.bias),
        "qkv_w": _np(a.mha.in_proj_weight).T.copy(),
        "qkv_b": _np(a.mha.in_proj_bias),
        "out_w": _np(a.mha.out_proj.weight).T.copy(),
        "out_b": _np(a.mha.out_proj.bias),
        "ff_ln_scale": _np(a.ff[0].weight), "ff_ln_bias": _np(a.ff[0].bias),
        "ff1_w": _np(a.ff[1].weight).T.copy(), "ff1_b": _np(a.ff[1].bias),
        "ff2_w": _np(a.ff[3].weight).T.copy(), "ff2_b": _np(a.ff[3].bias),
    }


def down_p(d: TDown):
    return {"res1": res_p(d.res1), "res2": res_p(d.res2),
            "emb": {"proj": dense_p(d.emb[1])}}


def up_p(u: TUp):
    return {"res1": res_p(u.res1), "res2": res_p(u.res2),
            "emb": {"proj": dense_p(u.emb[1])}}


def port_unet(t: TUNetGeom):
    return {
        "class_emb": {"embedding": _np(t.class_emb.weight)},
        "cond_fc1": dense_p(t.cond_mlp[0]),
        "cond_fc2": dense_p(t.cond_mlp[2]),
        "inc": res_p(t.inc),
        "down1": down_p(t.down1), "sa1": attn_p(t.sa1),
        "down2": down_p(t.down2), "sa2": attn_p(t.sa2),
        "down3": down_p(t.down3), "sa3": attn_p(t.sa3),
        "bot1": res_p(t.bot1), "bot2": res_p(t.bot2), "bot3": res_p(t.bot3),
        "up1": up_p(t.up1), "sa4": attn_p(t.sa4),
        "up2": up_p(t.up2), "sa5": attn_p(t.sa5),
        "up3": up_p(t.up3), "sa6": attn_p(t.sa6),
        "out": conv_p(t.out),
        "geom_head": {"fc1": dense_p(t.geom_head[0]),
                      "fc2": dense_p(t.geom_head[2])},
    }


def port_vae(t: TVAE):
    enc, dec = {}, {}
    for i in range(3):
        s = t.enc[6 * i:6 * (i + 1)]
        enc[f"conv{i}a"] = conv_p(s[0])
        enc[f"gn{i}a"] = gn_p(s[1])
        enc[f"conv{i}b"] = conv_p(s[3])
        enc[f"gn{i}b"] = gn_p(s[4])
    enc["to_mu"] = conv_p(t.to_mu)
    enc["to_logvar"] = conv_p(t.to_logvar)
    for i in range(3):
        s = t.dec[6 * i:6 * (i + 1)]
        dec[f"conv{i}"] = conv_p(s[0])
        dec[f"gn{i}a"] = gn_p(s[1])
        dec[f"up{i}"] = convT_p(s[3])
        dec[f"gn{i}b"] = gn_p(s[4])
    dec["out"] = conv_p(t.dec[18])
    return {"encoder": enc, "decoder": dec}


def _tree_shapes(d, pre=""):
    out = {}
    for k, v in d.items():
        if hasattr(v, "shape"):
            out[pre + k] = tuple(v.shape)
        else:
            out.update(_tree_shapes(v, pre + k + "/"))
    return out


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

def test_unet_geom_head_full_model_parity():
    torch.manual_seed(0)
    tm = TUNetGeom().eval()
    fm = CondUNet(UNetConfig(in_ch=4, time_dim=256, num_classes=3,
                             geom_dim=12, with_geom_head=True, base_ch=64))

    B = 2
    rng = np.random.default_rng(1)
    x = rng.normal(size=(B, 4, 28, 28)).astype(np.float32)
    t = np.array([1, 737], np.int64)
    y = np.array([1, 3], np.int64)
    vals = rng.uniform(size=(B, 12)).astype(np.float32)
    mask = (rng.uniform(size=(B, 12)) > 0.4).astype(np.float32)

    with torch.no_grad():
        eps_t, geom_t = tm(torch.from_numpy(x), torch.from_numpy(t),
                           torch.from_numpy(y), torch.from_numpy(vals),
                           torch.from_numpy(mask))

    params = port_unet(tm)
    # eval_shape: structural init without running the forward (compile-bound
    # suite; shapes are all the assertion needs)
    init = jax.eval_shape(
        lambda k: fm.init(k, jnp.zeros((1, 28, 28, 4)),
                          jnp.ones((1,), jnp.int32),
                          jnp.ones((1,), jnp.int32),
                          jnp.zeros((1, 12)), jnp.ones((1, 12))),
        jax.random.PRNGKey(0),
    )["params"]
    assert _tree_shapes(init) == _tree_shapes(params)

    eps_f, geom_f = fm.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t),
        jnp.asarray(y), jnp.asarray(vals), jnp.asarray(mask),
    )
    eps_f = np.asarray(eps_f).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(eps_f, eps_t.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(geom_f), geom_t.numpy(),
                               rtol=1e-4, atol=1e-4)


def test_vae_full_model_parity_224():
    torch.manual_seed(0)
    b = 64
    tm = TVAE(b=b).eval()
    fm = VAE(VAEConfig(base_channels=b))

    rng = np.random.default_rng(2)
    x = rng.uniform(size=(1, 3, 224, 224)).astype(np.float32)
    z = (rng.normal(size=(1, 4, 28, 28)) * 0.2).astype(np.float32)

    with torch.no_grad():
        mu_t, logvar_t = tm.encode_stats(torch.from_numpy(x))
        rec_t = tm.decode(torch.from_numpy(z))

    params = port_vae(tm)
    init = jax.eval_shape(
        lambda k1, k2: fm.init({"params": k1, "sample": k2},
                               jnp.zeros((1, 32, 32, 3))),
        jax.random.PRNGKey(0), jax.random.PRNGKey(1),
    )["params"]
    assert _tree_shapes(init) == _tree_shapes(params)
    params = jax.tree_util.tree_map(jnp.asarray, params)

    mu_f, logvar_f = fm.apply({"params": params},
                              jnp.asarray(x.transpose(0, 2, 3, 1)),
                              method=VAE.encode_stats)
    np.testing.assert_allclose(np.asarray(mu_f).transpose(0, 3, 1, 2),
                               mu_t.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(logvar_f).transpose(0, 3, 1, 2),
                               logvar_t.numpy(), rtol=1e-4, atol=1e-4)

    rec_f = fm.apply({"params": params},
                     jnp.asarray(z.transpose(0, 2, 3, 1)), method=VAE.decode)
    np.testing.assert_allclose(np.asarray(rec_f).transpose(0, 3, 1, 2),
                               rec_t.numpy(), rtol=1e-4, atol=1e-4)


def test_vae_roundtrip_shapes_divide_by_8():
    """vae.py:8 claims ÷4 but the code is ÷8 (three stride-2 stages) —
    SURVEY.md §1; pin the actual geometry at a small size."""
    torch.manual_seed(0)
    tm = TVAE(b=8).eval()
    with torch.no_grad():
        mu, _ = tm.encode_stats(torch.zeros(1, 3, 64, 64))
    assert mu.shape == (1, 4, 8, 8)
    cfg = VAEConfig(base_channels=8)
    assert cfg.latent_hw(64, 64) == (8, 8)

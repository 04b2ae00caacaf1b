"""Import reference-trained torch checkpoints into the framework.

The reference trains with torch and saves plain ``state_dict()`` files
(``torch.save(model.state_dict(), path)`` — utils.py:65,
early_stopping.py:57). A user switching stacks brings those ``.pth``
files along; this module converts them into the framework's flax param
trees (saved as msgpack via ``train.checkpoints.save_params``) so
reference-trained weights sample/evaluate on TPU without retraining.

Supported architectures (key layouts derived from the reference sources):

- ``VAE`` (models/vae.py:5-49): ``enc.{0,1,3,4,...}``, ``to_mu``,
  ``to_logvar``, ``dec.{...,18}``.
- ``Unet`` / ``UnetCond`` / ``UnetCondWithGeomHead``
  (models/unet.py:101-, models/unet_cond.py:103-157,
  models/unet_cond_geom.py:26-50): ``inc``/``down*``/``sa*``/``bot*``/
  ``up*``/``out`` (+ ``class_emb``/``cond_mlp`` when conditional,
  ``geom_head.mlp`` when the geometry head is present). The variant is
  detected from the keys, so one entry point handles all three.

Layout transforms (pinned by tests/test_torch_parity.py against ported
live modules): torch Conv2d OIHW → flax HWIO; ConvTranspose2d IOHW →
HWIO with a spatial rot180 (the SAME-pad k4s2 geometry then matches
torch's padding=1 exactly); Linear (O,I) → (I,O); MHA in_proj /
out_proj transposed into the fused kernel's ``qkv_w`` / ``out_w``.

Everything here is numpy-only — tensors are accepted from torch but the
math never touches it, so the converter also digests plain ndarray dicts
(e.g. loaded via ``torch.load(..., map_location="cpu")`` elsewhere).
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

__all__ = [
    "detect_arch",
    "convert_vae_state_dict",
    "convert_unet_state_dict",
    "infer_unet_arch",
]


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):  # torch tensor without importing torch
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


class _Consumer:
    """Wraps a flat state_dict; every read consumes its key so leftovers
    (typos, unexpected layers) surface as errors instead of silently
    shipping a half-converted checkpoint."""

    def __init__(self, sd: Dict[str, object]):
        self._sd = dict(sd)

    def take(self, key: str) -> np.ndarray:
        try:
            return _np(self._sd.pop(key))
        except KeyError:
            raise KeyError(
                f"state_dict is missing expected key {key!r} — is this a "
                f"reference checkpoint of the detected architecture?"
            ) from None

    def has(self, key: str) -> bool:
        return key in self._sd

    def finish(self) -> None:
        if self._sd:
            extra = sorted(self._sd)[:8]
            raise ValueError(
                f"{len(self._sd)} unconsumed state_dict keys (first few: "
                f"{extra}) — unknown architecture variant?"
            )


# ---------------------------------------------------------------------------
# leaf transforms
# ---------------------------------------------------------------------------

def _conv(c: _Consumer, prefix: str, bias: bool = True) -> Dict:
    """torch Conv2d (O,I,kh,kw) → flax {kernel HWIO[, bias]}."""
    p = {"kernel": c.take(f"{prefix}.weight").transpose(2, 3, 1, 0)}
    if bias:
        p["bias"] = c.take(f"{prefix}.bias")
    return p


def _convT(c: _Consumer, prefix: str) -> Dict:
    """torch ConvTranspose2d (I,O,kh,kw) → flax ConvTranspose(SAME):
    HWIO with spatial rot180 (test_torch_parity.py::convT_p)."""
    k = c.take(f"{prefix}.weight").transpose(2, 3, 0, 1)[::-1, ::-1].copy()
    return {"kernel": k, "bias": c.take(f"{prefix}.bias")}


def _dense(c: _Consumer, prefix: str) -> Dict:
    return {"kernel": c.take(f"{prefix}.weight").T.copy(),
            "bias": c.take(f"{prefix}.bias")}


def _res(c: _Consumer, prefix: str) -> Dict:
    """ResBlock (unet_cond.py:9-29): double_conv = [conv3 no-bias, GN,
    GELU, conv3 no-bias, GN] → the fused kernel's flattened leaves."""
    return {
        "conv1_kernel": c.take(f"{prefix}.double_conv.0.weight")
        .transpose(2, 3, 1, 0),
        "gn1_scale": c.take(f"{prefix}.double_conv.1.weight"),
        "gn1_bias": c.take(f"{prefix}.double_conv.1.bias"),
        "conv2_kernel": c.take(f"{prefix}.double_conv.3.weight")
        .transpose(2, 3, 1, 0),
        "gn2_scale": c.take(f"{prefix}.double_conv.4.weight"),
        "gn2_bias": c.take(f"{prefix}.double_conv.4.bias"),
    }


def _attn(c: _Consumer, prefix: str) -> Dict:
    """AttenionBlock (unet_cond.py:31-51): ln + 4-head MHA + ff_self."""
    return {
        "ln_scale": c.take(f"{prefix}.ln.weight"),
        "ln_bias": c.take(f"{prefix}.ln.bias"),
        "qkv_w": c.take(f"{prefix}.mha.in_proj_weight").T.copy(),
        "qkv_b": c.take(f"{prefix}.mha.in_proj_bias"),
        "out_w": c.take(f"{prefix}.mha.out_proj.weight").T.copy(),
        "out_b": c.take(f"{prefix}.mha.out_proj.bias"),
        "ff_ln_scale": c.take(f"{prefix}.ff_self.0.weight"),
        "ff_ln_bias": c.take(f"{prefix}.ff_self.0.bias"),
        "ff1_w": c.take(f"{prefix}.ff_self.1.weight").T.copy(),
        "ff1_b": c.take(f"{prefix}.ff_self.1.bias"),
        "ff2_w": c.take(f"{prefix}.ff_self.3.weight").T.copy(),
        "ff2_b": c.take(f"{prefix}.ff_self.3.bias"),
    }


def _down(c: _Consumer, prefix: str) -> Dict:
    """Down (unet_cond.py:53-69): maxpool_conv = [MaxPool, res, res]."""
    return {
        "res1": _res(c, f"{prefix}.maxpool_conv.1"),
        "res2": _res(c, f"{prefix}.maxpool_conv.2"),
        "emb": {"proj": _dense(c, f"{prefix}.emb_layer.1")},
    }


def _up(c: _Consumer, prefix: str) -> Dict:
    """Up (unet_cond.py:71-99): conv = [res, res] after the upsample."""
    return {
        "res1": _res(c, f"{prefix}.conv.0"),
        "res2": _res(c, f"{prefix}.conv.1"),
        "emb": {"proj": _dense(c, f"{prefix}.emb_layer.1")},
    }


# ---------------------------------------------------------------------------
# entry points
# ---------------------------------------------------------------------------

def detect_arch(sd: Dict[str, object]) -> str:
    """``"vae"`` or ``"unet"`` from the key layout."""
    if "to_mu.weight" in sd and "enc.0.weight" in sd:
        return "vae"
    if "inc.double_conv.0.weight" in sd:
        return "unet"
    raise ValueError(
        "unrecognized state_dict: expected the reference VAE "
        "(enc./dec./to_mu) or U-Net (inc./down1/...) key layout; got keys "
        f"like {sorted(sd)[:5]}"
    )


def infer_unet_arch(sd: Dict[str, object]) -> Dict[str, object]:
    """Model hyper-parameters recoverable from the tensor shapes — the
    UNetConfig kwargs needed to rebuild the matching flax model."""
    inc_k = _np(sd["inc.double_conv.0.weight"])  # (O,I,3,3)
    conditional = "class_emb.weight" in sd
    arch: Dict[str, object] = {
        "in_ch": int(inc_k.shape[1]),
        "base_ch": int(inc_k.shape[0]),
        "remove_deep_conv": "bot2.double_conv.0.weight" not in sd,
        "with_geom_head": "geom_head.mlp.0.weight" in sd,
        "num_classes": (int(_np(sd["class_emb.weight"]).shape[0]) - 1
                        if conditional else None),
    }
    if conditional:
        arch["time_dim"] = int(_np(sd["class_emb.weight"]).shape[1])
    else:
        # Linear(emb_dim, out_ch).weight is (out_ch, emb_dim)
        arch["time_dim"] = int(_np(sd["down1.emb_layer.1.weight"]).shape[1])
    if arch["with_geom_head"]:
        h = _np(sd["geom_head.mlp.0.weight"])   # (hidden, C)
        o = _np(sd["geom_head.mlp.2.weight"])   # (geom_dim, hidden)
        arch["geom_hidden"] = int(h.shape[0])
        arch["geom_dim"] = int(o.shape[0])
    return arch


def convert_unet_state_dict(
    sd: Dict[str, object],
) -> Tuple[Dict, Dict[str, object]]:
    """Reference ``Unet``/``UnetCond``/``UnetCondWithGeomHead`` state_dict
    → ``(flax CondUNet param tree, inferred arch kwargs)``.

    For the unconditional ``Unet`` the returned tree simply has no
    ``class_emb``/``cond_fc*`` leaves — matching a ``CondUNet(
    num_classes=None)`` initialized without numeric conditioning."""
    arch = infer_unet_arch(sd)
    c = _Consumer(sd)
    tree: Dict[str, Dict] = {}
    if arch["num_classes"] is not None:
        tree["class_emb"] = {"embedding": c.take("class_emb.weight")}
    if c.has("cond_mlp.0.weight"):
        tree["cond_fc1"] = _dense(c, "cond_mlp.0")
        tree["cond_fc2"] = _dense(c, "cond_mlp.2")
    tree["inc"] = _res(c, "inc")
    for i in (1, 2, 3):
        tree[f"down{i}"] = _down(c, f"down{i}")
        tree[f"sa{i}"] = _attn(c, f"sa{i}")
    tree["bot1"] = _res(c, "bot1")
    if not arch["remove_deep_conv"]:
        tree["bot2"] = _res(c, "bot2")
    tree["bot3"] = _res(c, "bot3")
    for i, sa in ((1, 4), (2, 5), (3, 6)):
        tree[f"up{i}"] = _up(c, f"up{i}")
        tree[f"sa{sa}"] = _attn(c, f"sa{sa}")
    tree["out"] = _conv(c, "out")
    if arch["with_geom_head"]:
        tree["geom_head"] = {"fc1": _dense(c, "geom_head.mlp.0"),
                             "fc2": _dense(c, "geom_head.mlp.2")}
    c.finish()
    return tree, arch


def convert_vae_state_dict(
    sd: Dict[str, object],
) -> Tuple[Dict, Dict[str, object]]:
    """Reference ``VAE`` state_dict (models/vae.py) → ``(flax VAE param
    tree, inferred arch kwargs)``. Encoder stages sit at Sequential
    indices 6i (conv3) / 6i+3 (conv4 s2); decoder mirrors with a
    ConvTranspose at 6i+3 and the output conv at index 18."""
    enc0 = _np(sd["enc.0.weight"])           # (b, in, 3, 3)
    mu = _np(sd["to_mu.weight"])             # (z, 4b, 1, 1)
    arch = {
        "in_channels": int(enc0.shape[1]),
        "base_channels": int(enc0.shape[0]),
        "z_channels": int(mu.shape[0]),
    }
    c = _Consumer(sd)
    enc: Dict[str, Dict] = {}
    dec: Dict[str, Dict] = {}
    for i in range(3):
        enc[f"conv{i}a"] = _conv(c, f"enc.{6 * i}")
        enc[f"gn{i}a"] = {"scale": c.take(f"enc.{6 * i + 1}.weight"),
                          "bias": c.take(f"enc.{6 * i + 1}.bias")}
        enc[f"conv{i}b"] = _conv(c, f"enc.{6 * i + 3}")
        enc[f"gn{i}b"] = {"scale": c.take(f"enc.{6 * i + 4}.weight"),
                          "bias": c.take(f"enc.{6 * i + 4}.bias")}
    enc["to_mu"] = _conv(c, "to_mu")
    enc["to_logvar"] = _conv(c, "to_logvar")
    for i in range(3):
        dec[f"conv{i}"] = _conv(c, f"dec.{6 * i}")
        dec[f"gn{i}a"] = {"scale": c.take(f"dec.{6 * i + 1}.weight"),
                          "bias": c.take(f"dec.{6 * i + 1}.bias")}
        dec[f"up{i}"] = _convT(c, f"dec.{6 * i + 3}")
        dec[f"gn{i}b"] = {"scale": c.take(f"dec.{6 * i + 4}.weight"),
                          "bias": c.take(f"dec.{6 * i + 4}.bias")}
    dec["out"] = _conv(c, "dec.18")
    c.finish()
    return {"encoder": enc, "decoder": dec}, arch

"""Export framework checkpoints back to reference torch ``.pth`` format.

The exact inverse of :mod:`tools.torch_import`: a flax param tree (as
saved by ``train.checkpoints.save_params``) becomes a flat state_dict
keyed like the reference modules (models/vae.py:5-49,
models/unet_cond.py:103-157, models/unet_cond_geom.py:26-50), so
framework-trained weights load into the reference classes with
``load_state_dict(..., strict=True)`` and reproduce the framework
forward ≤1e-4. Completes the two-way portability story: a user can
adopt this framework, train on TPU, and still hand checkpoints back to
any torch tooling built around the reference.

Layout transforms invert the importer leaf-for-leaf (flax HWIO → torch
Conv2d OIHW; flax ConvTranspose HWIO → torch IOHW with the spatial
rot180 undone; Linear (I,O) → (O,I); the fused attention ``qkv_w`` /
``out_w`` back into MHA in_proj / out_proj). Round-tripping through
``torch_import.convert_*_state_dict`` is leaf-identical, which the
export CLI verifies by default before writing.

numpy-only like the importer — callers torch-ify the arrays (the CLI
does) so the module also serves torch-free pipelines.
"""
from __future__ import annotations

from typing import Dict

import numpy as np

__all__ = [
    "detect_tree_arch",
    "export_unet_params",
    "export_vae_params",
    "infer_unet_arch_from_tree",
]


def _np(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def detect_tree_arch(tree: Dict) -> str:
    """``"vae"`` or ``"unet"`` from the param-tree layout."""
    if "encoder" in tree and "decoder" in tree:
        return "vae"
    if "inc" in tree and "bot1" in tree:
        return "unet"
    raise ValueError(
        "unrecognized param tree: expected the framework VAE "
        "(encoder/decoder) or CondUNet (inc/down1/...) layout; got keys "
        f"like {sorted(tree)[:5]}"
    )


def infer_unet_arch_from_tree(tree: Dict) -> Dict[str, object]:
    """UNetConfig kwargs recoverable from the flax tree — the mirror of
    ``torch_import.infer_unet_arch`` (which reads torch shapes)."""
    inc_k = _np(tree["inc"]["conv1_kernel"])  # (3,3,I,O)
    conditional = "class_emb" in tree
    arch: Dict[str, object] = {
        "in_ch": int(inc_k.shape[2]),
        "base_ch": int(inc_k.shape[3]),
        "remove_deep_conv": "bot2" not in tree,
        "with_geom_head": "geom_head" in tree,
        "num_classes": (int(_np(tree["class_emb"]["embedding"]).shape[0]) - 1
                        if conditional else None),
    }
    if conditional:
        arch["time_dim"] = int(_np(tree["class_emb"]["embedding"]).shape[1])
    else:
        # Dense kernel is (in_features, out_features)
        arch["time_dim"] = int(
            _np(tree["down1"]["emb"]["proj"]["kernel"]).shape[0])
    if arch["with_geom_head"]:
        h = _np(tree["geom_head"]["fc1"]["kernel"])   # (C, hidden)
        o = _np(tree["geom_head"]["fc2"]["kernel"])   # (hidden, geom_dim)
        arch["geom_hidden"] = int(h.shape[1])
        arch["geom_dim"] = int(o.shape[1])
    return arch


# ---------------------------------------------------------------------------
# leaf transforms (each inverts its torch_import counterpart)
# ---------------------------------------------------------------------------

def _conv(out: Dict, prefix: str, p: Dict, bias: bool = True) -> None:
    """flax {kernel HWIO[, bias]} → torch Conv2d (O,I,kh,kw)."""
    out[f"{prefix}.weight"] = _np(p["kernel"]).transpose(3, 2, 0, 1).copy()
    if bias:
        out[f"{prefix}.bias"] = _np(p["bias"])


def _convT(out: Dict, prefix: str, p: Dict) -> None:
    """flax ConvTranspose(SAME) HWIO (rot180-stored) → torch
    ConvTranspose2d (I,O,kh,kw)."""
    k = _np(p["kernel"])[::-1, ::-1].transpose(2, 3, 0, 1).copy()
    out[f"{prefix}.weight"] = k
    out[f"{prefix}.bias"] = _np(p["bias"])


def _dense(out: Dict, prefix: str, p: Dict) -> None:
    out[f"{prefix}.weight"] = _np(p["kernel"]).T.copy()
    out[f"{prefix}.bias"] = _np(p["bias"])


def _res(out: Dict, prefix: str, p: Dict) -> None:
    """Fused-ResBlock leaves → double_conv = [conv3 no-bias, GN, GELU,
    conv3 no-bias, GN] (unet_cond.py:9-29)."""
    out[f"{prefix}.double_conv.0.weight"] = (
        _np(p["conv1_kernel"]).transpose(3, 2, 0, 1).copy())
    out[f"{prefix}.double_conv.1.weight"] = _np(p["gn1_scale"])
    out[f"{prefix}.double_conv.1.bias"] = _np(p["gn1_bias"])
    out[f"{prefix}.double_conv.3.weight"] = (
        _np(p["conv2_kernel"]).transpose(3, 2, 0, 1).copy())
    out[f"{prefix}.double_conv.4.weight"] = _np(p["gn2_scale"])
    out[f"{prefix}.double_conv.4.bias"] = _np(p["gn2_bias"])


def _attn(out: Dict, prefix: str, p: Dict) -> None:
    """Fused attention leaves → ln + 4-head MHA + ff_self
    (unet_cond.py:31-51)."""
    out[f"{prefix}.ln.weight"] = _np(p["ln_scale"])
    out[f"{prefix}.ln.bias"] = _np(p["ln_bias"])
    out[f"{prefix}.mha.in_proj_weight"] = _np(p["qkv_w"]).T.copy()
    out[f"{prefix}.mha.in_proj_bias"] = _np(p["qkv_b"])
    out[f"{prefix}.mha.out_proj.weight"] = _np(p["out_w"]).T.copy()
    out[f"{prefix}.mha.out_proj.bias"] = _np(p["out_b"])
    out[f"{prefix}.ff_self.0.weight"] = _np(p["ff_ln_scale"])
    out[f"{prefix}.ff_self.0.bias"] = _np(p["ff_ln_bias"])
    out[f"{prefix}.ff_self.1.weight"] = _np(p["ff1_w"]).T.copy()
    out[f"{prefix}.ff_self.1.bias"] = _np(p["ff1_b"])
    out[f"{prefix}.ff_self.3.weight"] = _np(p["ff2_w"]).T.copy()
    out[f"{prefix}.ff_self.3.bias"] = _np(p["ff2_b"])


def _down(out: Dict, prefix: str, p: Dict) -> None:
    _res(out, f"{prefix}.maxpool_conv.1", p["res1"])
    _res(out, f"{prefix}.maxpool_conv.2", p["res2"])
    _dense(out, f"{prefix}.emb_layer.1", p["emb"]["proj"])


def _up(out: Dict, prefix: str, p: Dict) -> None:
    _res(out, f"{prefix}.conv.0", p["res1"])
    _res(out, f"{prefix}.conv.1", p["res2"])
    _dense(out, f"{prefix}.emb_layer.1", p["emb"]["proj"])


# ---------------------------------------------------------------------------
# entry points
# ---------------------------------------------------------------------------

def export_unet_params(tree: Dict) -> Dict[str, np.ndarray]:
    """flax ``CondUNet`` param tree → reference ``Unet``/``UnetCond``/
    ``UnetCondWithGeomHead`` state_dict (numpy values)."""
    arch = infer_unet_arch_from_tree(tree)
    sd: Dict[str, np.ndarray] = {}
    if arch["num_classes"] is not None:
        sd["class_emb.weight"] = _np(tree["class_emb"]["embedding"])
    if "cond_fc1" in tree:
        _dense(sd, "cond_mlp.0", tree["cond_fc1"])
        _dense(sd, "cond_mlp.2", tree["cond_fc2"])
    _res(sd, "inc", tree["inc"])
    for i in (1, 2, 3):
        _down(sd, f"down{i}", tree[f"down{i}"])
        _attn(sd, f"sa{i}", tree[f"sa{i}"])
    _res(sd, "bot1", tree["bot1"])
    if not arch["remove_deep_conv"]:
        _res(sd, "bot2", tree["bot2"])
    _res(sd, "bot3", tree["bot3"])
    for i, sa in ((1, 4), (2, 5), (3, 6)):
        _up(sd, f"up{i}", tree[f"up{i}"])
        _attn(sd, f"sa{sa}", tree[f"sa{sa}"])
    _conv(sd, "out", tree["out"])
    if arch["with_geom_head"]:
        _dense(sd, "geom_head.mlp.0", tree["geom_head"]["fc1"])
        _dense(sd, "geom_head.mlp.2", tree["geom_head"]["fc2"])
    return sd


def export_vae_params(tree: Dict) -> Dict[str, np.ndarray]:
    """flax ``VAE`` param tree → reference ``VAE`` state_dict
    (models/vae.py layout: Sequential indices 6i/6i+3, output at dec.18)."""
    enc, dec = tree["encoder"], tree["decoder"]
    sd: Dict[str, np.ndarray] = {}
    for i in range(3):
        _conv(sd, f"enc.{6 * i}", enc[f"conv{i}a"])
        sd[f"enc.{6 * i + 1}.weight"] = _np(enc[f"gn{i}a"]["scale"])
        sd[f"enc.{6 * i + 1}.bias"] = _np(enc[f"gn{i}a"]["bias"])
        _conv(sd, f"enc.{6 * i + 3}", enc[f"conv{i}b"])
        sd[f"enc.{6 * i + 4}.weight"] = _np(enc[f"gn{i}b"]["scale"])
        sd[f"enc.{6 * i + 4}.bias"] = _np(enc[f"gn{i}b"]["bias"])
    _conv(sd, "to_mu", enc["to_mu"])
    _conv(sd, "to_logvar", enc["to_logvar"])
    for i in range(3):
        _conv(sd, f"dec.{6 * i}", dec[f"conv{i}"])
        sd[f"dec.{6 * i + 1}.weight"] = _np(dec[f"gn{i}a"]["scale"])
        sd[f"dec.{6 * i + 1}.bias"] = _np(dec[f"gn{i}a"]["bias"])
        _convT(sd, f"dec.{6 * i + 3}", dec[f"up{i}"])
        sd[f"dec.{6 * i + 4}.weight"] = _np(dec[f"gn{i}b"]["scale"])
        sd[f"dec.{6 * i + 4}.bias"] = _np(dec[f"gn{i}b"]["bias"])
    _conv(sd, "dec.18", dec["out"])
    return sd

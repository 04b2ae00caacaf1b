"""Reference-checkpoint importer (tools/torch_import.py + the
convert_checkpoint CLI).

Strategy: test_torch_parity.py already pins forward parity of flax
models loaded with its ``port_vae``/``port_unet`` trees (ported from
live replica modules). Here we prove the *state_dict* converter emits
the exact same trees — so the importer inherits the parity guarantee —
plus arch inference, validation failure modes, a CLI round-trip, and
(when /root/reference exists) conversion of a state_dict produced by
the REAL reference model classes."""
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from diffusion_model_tpu.tools.torch_import import (  # noqa: E402
    convert_unet_state_dict, convert_vae_state_dict, detect_arch,
    infer_unet_arch)
from test_torch_parity import (  # noqa: E402  (pytest puts tests/ on path)
    TUNetGeom, TVAE, port_unet, port_vae)

REFERENCE_DIR = "/root/reference"


def _flat(d, pre=""):
    out = {}
    for k, v in d.items():
        if hasattr(v, "shape"):
            out[pre + k] = np.asarray(v)
        else:
            out.update(_flat(v, pre + k + "/"))
    return out


def _assert_trees_equal(a, b):
    fa, fb = _flat(a), _flat(b)
    assert set(fa) == set(fb), (
        sorted(set(fa) ^ set(fb))[:10])
    for k in fa:
        np.testing.assert_array_equal(fa[k], fb[k], err_msg=k)


def _reference_keyed(sd):
    """Rename the test-replica state_dict keys to the reference's module
    attribute names (unet_cond.py uses double_conv/maxpool_conv/emb_layer/
    ff_self/conv; unet_cond_geom.py nests the head under geom_head.mlp)."""
    import re
    out = {}
    for k, v in sd.items():
        k = k.replace(".body.", ".double_conv.")
        k = re.sub(r"^(down\d)\.res1\.", r"\1.maxpool_conv.1.", k)
        k = re.sub(r"^(down\d)\.res2\.", r"\1.maxpool_conv.2.", k)
        k = re.sub(r"^(up\d)\.res1\.", r"\1.conv.0.", k)
        k = re.sub(r"^(up\d)\.res2\.", r"\1.conv.1.", k)
        k = re.sub(r"^(down\d|up\d)\.emb\.", r"\1.emb_layer.", k)
        k = re.sub(r"^(sa\d)\.ff\.", r"\1.ff_self.", k)
        k = re.sub(r"^geom_head\.", "geom_head.mlp.", k)
        out[k] = v
    return out


def test_vae_converter_equals_ported_tree():
    torch.manual_seed(0)
    tm = TVAE(b=8).eval()
    # the replica's attribute names already equal the reference's
    # (enc/dec/to_mu/to_logvar with identical Sequential indices)
    tree, arch = convert_vae_state_dict(tm.state_dict())
    _assert_trees_equal(tree, port_vae(tm))
    assert arch == {"in_channels": 3, "base_channels": 8, "z_channels": 4}


def test_unet_converter_equals_ported_tree():
    torch.manual_seed(1)
    tm = TUNetGeom().eval()
    sd = _reference_keyed(tm.state_dict())
    tree, arch = convert_unet_state_dict(sd)
    _assert_trees_equal(tree, port_unet(tm))
    assert arch == {
        "in_ch": 4, "base_ch": 64, "time_dim": 256, "num_classes": 3,
        "with_geom_head": True, "geom_dim": 12, "geom_hidden": 256,
        "remove_deep_conv": False,
    }


def test_detect_arch_and_errors():
    tm = TVAE(b=8)
    assert detect_arch(tm.state_dict()) == "vae"
    um = _reference_keyed(TUNetGeom().state_dict())
    assert detect_arch(um) == "unet"
    with pytest.raises(ValueError):
        detect_arch({"foo.weight": np.zeros(3)})
    # a truncated state_dict must fail loudly, not half-convert
    missing = dict(um)
    missing.pop("bot1.double_conv.0.weight")
    with pytest.raises(KeyError):
        convert_unet_state_dict(missing)
    # unknown extra keys must fail loudly too
    extra = dict(um)
    extra["mystery.weight"] = np.zeros(3)
    with pytest.raises(ValueError):
        convert_unet_state_dict(extra)


def test_cli_round_trip(tmp_path):
    """convert_checkpoint CLI: .pth → msgpack + arch sidecar; the msgpack
    must load back leaf-identical."""
    from diffusion_model_tpu.cli.convert_checkpoint import main as cli_main
    from diffusion_model_tpu.train.checkpoints import load_params

    torch.manual_seed(2)
    tm = TVAE(b=8).eval()
    pth = tmp_path / "vae_best.pth"
    out = tmp_path / "vae_best.msgpack"
    torch.save(tm.state_dict(), str(pth))
    cli_main(["--input", str(pth), "--output", str(out)])
    assert out.exists()
    import json
    meta = json.loads((tmp_path / "vae_best.msgpack.arch.json").read_text())
    assert meta["kind"] == "vae" and meta["base_channels"] == 8
    target = port_vae(tm)
    loaded = load_params(str(out), target)
    _assert_trees_equal(loaded, target)


def test_cli_unwraps_resumable_checkpoint(tmp_path):
    """{"model": state_dict, "opt": ...} wrappers (the resumable-trainer
    format) are unwrapped automatically."""
    from diffusion_model_tpu.cli.convert_checkpoint import main as cli_main
    from diffusion_model_tpu.train.checkpoints import load_params

    torch.manual_seed(3)
    tm = TVAE(b=8).eval()
    pth = tmp_path / "ck.pth"
    torch.save({"model": tm.state_dict(), "epoch": 7}, str(pth))
    cli_main(["--input", str(pth), "--output",
              str(tmp_path / "ck.msgpack")])
    target = port_vae(tm)
    loaded = load_params(str(tmp_path / "ck.msgpack"), target)
    _assert_trees_equal(loaded, target)


def test_generate_cond_arch_sidecar_override(tmp_path, monkeypatch):
    """generate_cond auto-reads the importer's <ckpt>.arch.json sidecars so
    converted checkpoints need no manual shape flags."""
    import json

    from diffusion_model_tpu.cli import generate_cond as gc

    ua = {"kind": "unet", "in_ch": 4, "base_ch": 32, "time_dim": 128,
          "num_classes": 3, "with_geom_head": False, "geom_dim": 12,
          "remove_deep_conv": True}
    va = {"kind": "vae", "in_channels": 3, "base_channels": 16,
          "z_channels": 4}
    (tmp_path / "u.msgpack.arch.json").write_text(json.dumps(ua))
    (tmp_path / "v.msgpack.arch.json").write_text(json.dumps(va))

    captured = {}

    def fake_from_checkpoints(unet_ckpt, vae_ckpt, unet, vae, **kw):
        captured["unet"], captured["vae"] = unet, vae
        return type("P", (), {"prediction_type": "epsilon"})()

    monkeypatch.setattr(gc.DiffusionPipeline, "from_checkpoints",
                        staticmethod(fake_from_checkpoints))
    args = gc.build_parser().parse_args(
        ["--unet_ckpt", str(tmp_path / "u.msgpack"),
         "--vae_ckpt", str(tmp_path / "v.msgpack")])
    gc.build_pipeline_from_args(args)
    ucfg = captured["unet"].config
    assert (ucfg.base_ch, ucfg.time_dim) == (32, 128)
    assert ucfg.remove_deep_conv and not ucfg.with_geom_head
    assert captured["vae"].config.base_channels == 16
    # no sidecar -> CLI flag defaults (reference sizes)
    args2 = gc.build_parser().parse_args(
        ["--unet_ckpt", str(tmp_path / "no.msgpack"),
         "--vae_ckpt", str(tmp_path / "no2.msgpack")])
    gc.build_pipeline_from_args(args2)
    assert captured["unet"].config.base_ch == 64
    assert captured["unet"].config.with_geom_head


@pytest.mark.heavy
@pytest.mark.skipif(not os.path.isdir(REFERENCE_DIR),
                    reason="reference checkout not available")
def test_real_reference_unet_state_dict_forward_parity():
    """Gold test: a state_dict saved by the REAL reference model classes
    (not our replicas) converts and matches the torch forward ≤1e-4."""
    import jax
    import jax.numpy as jnp

    from diffusion_model_tpu.models import CondUNet, UNetConfig

    sys.path.insert(0, REFERENCE_DIR)
    try:
        from models.unet_cond_geom import UnetCondWithGeomHead
    finally:
        sys.path.remove(REFERENCE_DIR)

    torch.manual_seed(4)
    tm = UnetCondWithGeomHead(cfg_drop_prob=0.0).eval()
    tree, arch = convert_unet_state_dict(tm.state_dict())
    assert arch["with_geom_head"] and arch["num_classes"] == 3

    fm = CondUNet(UNetConfig(in_ch=4, time_dim=256, num_classes=3,
                             geom_dim=12, with_geom_head=True))
    rng = np.random.default_rng(5)
    x = rng.normal(size=(2, 4, 12, 12)).astype(np.float32)
    t = np.array([3, 890], np.int64)
    y = np.array([2, 1], np.int64)
    vals = rng.uniform(size=(2, 12)).astype(np.float32)
    mask = (rng.uniform(size=(2, 12)) > 0.5).astype(np.float32)
    with torch.no_grad():
        eps_t, geom_t = tm(torch.from_numpy(x), torch.from_numpy(t),
                           torch.from_numpy(y), torch.from_numpy(vals),
                           torch.from_numpy(mask))
    eps_f, geom_f = fm.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, tree)},
        jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t),
        jnp.asarray(y), jnp.asarray(vals), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(eps_f).transpose(0, 3, 1, 2),
                               eps_t.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(geom_f), geom_t.numpy(),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.heavy
@pytest.mark.skipif(not os.path.isdir(REFERENCE_DIR),
                    reason="reference checkout not available")
def test_real_reference_vae_state_dict_forward_parity():
    import jax
    import jax.numpy as jnp

    from diffusion_model_tpu.models import VAE, VAEConfig

    sys.path.insert(0, REFERENCE_DIR)
    try:
        from models.vae import VAE as RefVAE
    finally:
        sys.path.remove(REFERENCE_DIR)

    torch.manual_seed(6)
    tm = RefVAE(base_channels=16).eval()
    tree, arch = convert_vae_state_dict(tm.state_dict())
    assert arch == {"in_channels": 3, "base_channels": 16, "z_channels": 4}

    fm = VAE(VAEConfig(base_channels=16))
    rng = np.random.default_rng(7)
    z = (rng.normal(size=(1, 4, 8, 8)) * 0.2).astype(np.float32)
    with torch.no_grad():
        rec_t = tm.decode(torch.from_numpy(z))
    rec_f = fm.apply({"params": jax.tree_util.tree_map(jnp.asarray, tree)},
                     jnp.asarray(z.transpose(0, 2, 3, 1)),
                     method=VAE.decode)
    np.testing.assert_allclose(np.asarray(rec_f).transpose(0, 3, 1, 2),
                               rec_t.numpy(), rtol=1e-4, atol=1e-4)

"""Framework→reference checkpoint exporter (tools/torch_export.py + the
convert_checkpoint CLI's export direction).

Strategy: the importer is parity-pinned (test_torch_import.py /
test_torch_parity.py), so (a) export→import round-trips must be
leaf-identical — the exporter then inherits the importer's parity
guarantee transitively — and (b) a gold test loads an exported
state_dict into the REAL reference classes with ``strict=True`` and
pins forward parity ≤1e-4 (when /root/reference exists)."""
import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from diffusion_model_tpu.models import (  # noqa: E402
    VAE, CondUNet, UNetConfig, VAEConfig)
from diffusion_model_tpu.tools.torch_export import (  # noqa: E402
    detect_tree_arch, export_unet_params, export_vae_params,
    infer_unet_arch_from_tree)
from diffusion_model_tpu.tools.torch_import import (  # noqa: E402
    convert_unet_state_dict, convert_vae_state_dict)

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
    assert set(fa) == set(fb), sorted(set(fa) ^ set(fb))[:10]
    for k in fa:
        np.testing.assert_array_equal(fa[k], fb[k], err_msg=k)


def _init_unet(cfg: UNetConfig):
    model = CondUNet(cfg)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 16, 16, cfg.in_ch))
    t = jnp.ones((1,), jnp.int32)
    if cfg.num_classes is not None and cfg.with_geom_head:
        args = (t, jnp.ones((1,), jnp.int32), jnp.zeros((1, cfg.geom_dim)),
                jnp.ones((1, cfg.geom_dim)))
    elif cfg.num_classes is not None:
        args = (t, jnp.ones((1,), jnp.int32))
    else:
        args = (t,)
    return model, model.init(rng, x, *args)["params"]


UNET_VARIANTS = {
    "uncond": UNetConfig(in_ch=3, base_ch=8, time_dim=32, num_classes=None),
    "cond": UNetConfig(in_ch=4, base_ch=8, time_dim=32, num_classes=3),
    "geom": UNetConfig(in_ch=4, base_ch=8, time_dim=32, num_classes=3,
                       with_geom_head=True, geom_dim=12, geom_hidden=64),
    "shallow": UNetConfig(in_ch=4, base_ch=8, time_dim=32, num_classes=3,
                          remove_deep_conv=True),
}


@pytest.mark.parametrize("name", sorted(UNET_VARIANTS))
def test_unet_export_import_round_trip(name):
    cfg = UNET_VARIANTS[name]
    _, params = _init_unet(cfg)
    sd = export_unet_params(params)
    back, arch = convert_unet_state_dict(sd)
    _assert_trees_equal(params, back)
    assert arch["base_ch"] == cfg.base_ch
    assert arch["num_classes"] == cfg.num_classes
    assert arch["with_geom_head"] == cfg.with_geom_head
    assert arch["remove_deep_conv"] == cfg.remove_deep_conv
    # and the tree-side arch inference agrees with the torch-side one
    assert infer_unet_arch_from_tree(params) == arch


def test_vae_export_import_round_trip():
    model = VAE(VAEConfig(base_channels=8))
    rng = jax.random.PRNGKey(1)
    params = model.init({"params": rng, "sample": rng},
                        jnp.zeros((1, 32, 32, 3)))["params"]
    sd = export_vae_params(params)
    back, arch = convert_vae_state_dict(sd)
    _assert_trees_equal(params, back)
    assert arch == {"in_channels": 3, "base_channels": 8, "z_channels": 4}


def test_detect_tree_arch():
    _, params = _init_unet(UNET_VARIANTS["geom"])
    assert detect_tree_arch(params) == "unet"
    model = VAE(VAEConfig(base_channels=8))
    rng = jax.random.PRNGKey(1)
    vp = model.init({"params": rng, "sample": rng},
                    jnp.zeros((1, 32, 32, 3)))["params"]
    assert detect_tree_arch(vp) == "vae"
    with pytest.raises(ValueError):
        detect_tree_arch({"foo": {"bar": np.zeros(3)}})


def test_cli_export_round_trip(tmp_path):
    """msgpack → .pth → msgpack through the CLI is leaf-identical, and
    both directions write matching arch sidecars."""
    from diffusion_model_tpu.train.checkpoints import save_params

    _, params = _init_unet(UNET_VARIANTS["geom"])
    src = tmp_path / "unet.msgpack"
    save_params(str(src), params)

    env = dict(os.environ, DIFFUSION_TPU_PLATFORM="cpu",
               PYTHONPATH="/root/repo")
    pth = tmp_path / "unet.pth"
    r = subprocess.run(
        [sys.executable, "-m", "diffusion_model_tpu.cli.convert_checkpoint",
         "--input", str(src), "--output", str(pth)],
        capture_output=True, text=True, env=env)
    assert r.returncode == 0, r.stderr
    with open(str(pth) + ".arch.json") as f:
        meta = json.load(f)
    assert meta["kind"] == "unet" and meta["with_geom_head"]

    back = tmp_path / "back.msgpack"
    r = subprocess.run(
        [sys.executable, "-m", "diffusion_model_tpu.cli.convert_checkpoint",
         "--input", str(pth), "--output", str(back)],
        capture_output=True, text=True, env=env)
    assert r.returncode == 0, r.stderr

    from flax import serialization
    with open(back, "rb") as f:
        tree = serialization.msgpack_restore(f.read())
    _assert_trees_equal(params, tree)


def test_cli_export_vpred_guard(tmp_path):
    """VERDICT r4 next #5: exporting a v-prediction (distilled) checkpoint
    to reference .pth must refuse without --force — the reference Diffuser
    unconditionally treats model output as ε (diff.py:32-56), so the
    export would strict-load and silently generate garbage. --force
    exports but records the semantics in the output sidecar."""
    from diffusion_model_tpu.train.checkpoints import save_params

    _, params = _init_unet(UNET_VARIANTS["geom"])
    src = tmp_path / "distilled.msgpack"
    save_params(str(src), params)
    with open(str(src) + ".arch.json", "w") as f:
        json.dump({"kind": "unet", "prediction_type": "v",
                   "schedule_kind": "linear", "num_timesteps": 1000,
                   "timestep_spacing": "trailing", "guidance_scale": 0.0,
                   "distilled_steps": 8}, f)

    env = dict(os.environ, DIFFUSION_TPU_PLATFORM="cpu",
               PYTHONPATH="/root/repo")
    pth = tmp_path / "distilled.pth"
    cmd = [sys.executable, "-m",
           "diffusion_model_tpu.cli.convert_checkpoint",
           "--input", str(src), "--output", str(pth)]
    r = subprocess.run(cmd, capture_output=True, text=True, env=env)
    assert r.returncode != 0
    assert "NOT reference-compatible" in r.stderr
    assert not pth.exists()

    r = subprocess.run(cmd + ["--force"], capture_output=True, text=True,
                       env=env)
    assert r.returncode == 0, r.stderr
    with open(str(pth) + ".arch.json") as f:
        meta = json.load(f)
    assert meta["prediction_type"] == "v"
    assert meta["timestep_spacing"] == "trailing"
    assert meta["distilled_steps"] == 8


@pytest.mark.skipif(not os.path.isdir(REFERENCE_DIR),
                    reason="reference checkout not available")
def test_real_reference_unet_loads_exported_state_dict():
    """Gold test: an exported state_dict loads into the REAL reference
    UnetCondWithGeomHead with strict=True and matches the framework
    forward ≤1e-4."""
    sys.path.insert(0, REFERENCE_DIR)
    try:
        from models.unet_cond_geom import UnetCondWithGeomHead
    finally:
        sys.path.remove(REFERENCE_DIR)

    cfg = UNetConfig(in_ch=4, time_dim=256, num_classes=3,
                     with_geom_head=True, geom_dim=12)
    model, params = _init_unet(cfg)
    sd = export_unet_params(params)

    tm = UnetCondWithGeomHead(cfg_drop_prob=0.0).eval()
    missing, unexpected = tm.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in sd.items()}, strict=True)
    assert not missing and not unexpected

    rng = np.random.default_rng(11)
    x = rng.normal(size=(2, 4, 12, 12)).astype(np.float32)
    t = np.array([3, 890], np.int64)
    y = np.array([2, 1], np.int64)
    vals = rng.uniform(size=(2, 12)).astype(np.float32)
    mask = (rng.uniform(size=(2, 12)) > 0.5).astype(np.float32)
    with torch.no_grad():
        eps_t, geom_t = tm(torch.from_numpy(x), torch.from_numpy(t),
                           torch.from_numpy(y), torch.from_numpy(vals),
                           torch.from_numpy(mask))
    eps_f, geom_f = model.apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(t), jnp.asarray(y), jnp.asarray(vals),
        jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(eps_f).transpose(0, 3, 1, 2),
                               eps_t.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(geom_f), geom_t.numpy(),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.skipif(not os.path.isdir(REFERENCE_DIR),
                    reason="reference checkout not available")
def test_real_reference_vae_loads_exported_state_dict():
    sys.path.insert(0, REFERENCE_DIR)
    try:
        from models.vae import VAE as RefVAE
    finally:
        sys.path.remove(REFERENCE_DIR)

    model = VAE(VAEConfig(base_channels=16))
    rng = jax.random.PRNGKey(3)
    params = model.init({"params": rng, "sample": rng},
                        jnp.zeros((1, 32, 32, 3)))["params"]
    sd = export_vae_params(params)

    tm = RefVAE(base_channels=16).eval()
    missing, unexpected = tm.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in sd.items()}, strict=True)
    assert not missing and not unexpected

    rng2 = np.random.default_rng(13)
    z = (rng2.normal(size=(1, 4, 8, 8)) * 0.2).astype(np.float32)
    with torch.no_grad():
        rec_t = tm.decode(torch.from_numpy(z))
    rec_f = model.apply({"params": params},
                        jnp.asarray(z.transpose(0, 2, 3, 1)),
                        method=VAE.decode)
    np.testing.assert_allclose(np.asarray(rec_f).transpose(0, 3, 1, 2),
                               rec_t.numpy(), rtol=1e-4, atol=1e-4)

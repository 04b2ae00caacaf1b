"""Train-step tests: loss decreases, CFG dropout behavior, masked geom loss,
early stopping, recorder artifacts."""
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_model_tpu.config import LatentTrainConfig, VAETrainConfig
from diffusion_model_tpu.diffusion import DiffusionSchedule
from diffusion_model_tpu.models import VAE, VAEConfig, CondUNet, UNetConfig
from diffusion_model_tpu.train import (
    EarlyStopping,
    create_vae_state,
    make_latent_eval_step,
    make_latent_train_step,
    make_vae_train_step,
    masked_geom_mse,
    save_params,
    load_params,
)
from diffusion_model_tpu.train.train_latent import create_latent_state


def test_masked_geom_mse():
    pred = jnp.array([[1.0, 2.0], [3.0, 4.0]])
    gt = jnp.array([[0.0, 2.0], [3.0, 0.0]])
    mask = jnp.array([[1.0, 1.0], [0.0, 0.0]])
    # only (0,0) contributes: (1-0)^2 / 2 masked elems
    assert float(masked_geom_mse(pred, gt, mask)) == pytest.approx(0.5)
    # all-zero mask → 0/eps = 0
    assert float(masked_geom_mse(pred, gt, jnp.zeros_like(mask))) == 0.0


def test_vae_train_step_reduces_loss():
    cfg = VAETrainConfig(base_channels=8, bf16=False)
    rng = jax.random.PRNGKey(0)
    model, state = create_vae_state(rng, cfg, image_hw=(32, 32))
    step = make_vae_train_step(model)
    x = jax.random.uniform(jax.random.PRNGKey(1), (8, 32, 32, 3))
    losses = []
    for i in range(12):
        state, m = step(state, x, jax.random.fold_in(rng, i))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    assert all(math.isfinite(l) for l in losses)


@pytest.fixture(scope="module")
def latent_setup():
    cfg = LatentTrainConfig(
        base_ch=16, time_dim=64, vae_base_channels=8, bf16=False,
        num_timesteps=16, cfg_drop_prob=0.5, geom_lambda=0.1,
    )
    vae = VAE(VAEConfig(base_channels=8))
    unet = CondUNet(UNetConfig(in_ch=4, time_dim=64, num_classes=3,
                               with_geom_head=True, base_ch=16))
    rng = jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, 32, 32, 3))
    vae_params = vae.init({"params": rng, "sample": rng}, dummy)["params"]
    state = create_latent_state(rng, cfg, unet, (4, 4))
    schedule = DiffusionSchedule.create(16)
    return cfg, vae, unet, vae_params, state, schedule


@pytest.mark.heavy
def test_latent_train_step_runs_and_descends(latent_setup):
    cfg, vae, unet, vae_params, state, schedule = latent_setup
    # the step donates its input state; keep the fixture's copy alive
    state = jax.tree_util.tree_map(jnp.copy, state)
    step = make_latent_train_step(unet, vae, schedule, cfg.cfg_drop_prob,
                                  cfg.geom_lambda)
    batch = {
        "image": jax.random.uniform(jax.random.PRNGKey(1), (8, 32, 32, 3)),
        "vals": jax.random.uniform(jax.random.PRNGKey(2), (8, 12)),
        "mask": jnp.ones((8, 12)),
        "y": jnp.array([1, 2, 3, 1, 2, 3, 1, 2], jnp.int32),
    }
    losses = []
    for i in range(10):
        state, m = step(state, vae_params, batch, jax.random.fold_in(
            jax.random.PRNGKey(3), i))
        losses.append(float(m["loss"]))
        assert math.isfinite(losses[-1])
        assert float(m["loss_geom"]) >= 0.0
    assert losses[-1] < losses[0]


def test_latent_eval_step(latent_setup):
    cfg, vae, unet, vae_params, state, schedule = latent_setup
    ev = make_latent_eval_step(unet, vae, schedule, cfg.geom_lambda)
    batch = {
        "image": jax.random.uniform(jax.random.PRNGKey(1), (4, 32, 32, 3)),
        "vals": jnp.zeros((4, 12)),
        "mask": jnp.ones((4, 12)),
        "y": jnp.array([1, 2, 3, 1], jnp.int32),
    }
    m = ev(state.params, vae_params, batch, jax.random.PRNGKey(0))
    assert math.isfinite(float(m["loss"]))


def test_early_stopping_patience(tmp_path):
    saves = []
    es = EarlyStopping(patience=2, delta=0.0,
                       save_fn=lambda: saves.append(1))
    es(1.0)      # first → save
    es(0.5)      # improvement → save
    es(float("nan"))  # ignored
    es(0.6)      # counter 1
    es(0.7)      # counter 2 → stop
    assert es.early_stop
    assert len(saves) == 2


def test_save_load_params_roundtrip(tmp_path, latent_setup):
    _, _, _, vae_params, _, _ = latent_setup
    p = str(tmp_path / "x.msgpack")
    save_params(p, vae_params)
    loaded = load_params(p, vae_params)
    flat1 = jax.tree_util.tree_leaves(vae_params)
    flat2 = jax.tree_util.tree_leaves(loaded)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_recorder_artifacts(tmp_path):
    from diffusion_model_tpu.train import (
        record_result, save_train_val_loss_csv,
    )

    run = record_result(
        result_root=str(tmp_path / "result"),
        model_params={"w": np.ones(3, np.float32)},
        train_losses=[1.0, 0.5, 0.4],
        val_losses=[1.1, float("nan"), 0.45],
        images=[np.zeros((8, 8, 3), np.float32)],
        batch_size=32,
        learning_time=12.5,
    )
    assert os.path.exists(os.path.join(run, "record.txt"))
    assert os.path.exists(os.path.join(run, "trained_para.msgpack"))
    assert os.path.exists(os.path.join(run, "losses_train_val.png"))
    assert os.path.exists(os.path.join(run, "losses_train_val.csv"))
    assert os.path.exists(os.path.join(run, "generated_pic_arc", "pic1.png"))
    txt = open(os.path.join(run, "record.txt")).read()
    assert "learning_time : 12.5 (s)" in txt
    with open(os.path.join(run, "losses_train_val.csv")) as f:
        lines = f.read().splitlines()
    assert lines[0] == "epoch,train_loss,val_loss"
    assert lines[2].endswith(",")  # NaN val epoch → blank
    assert lines[-2].startswith("min_train,0.4")


@pytest.mark.heavy
@pytest.mark.parametrize("stream_side", ["train", "val"])
def test_vae_mixed_residency(tmp_path, monkeypatch, stream_side):
    """Residency is decided per dataset: one side streaming while the other
    is device-resident must still train (regression: the epoch-fused and
    per-step functions were once defined keyed on train_dev but selected at
    use time by val_dev → NameError on mixed residency)."""
    from diffusion_model_tpu.config import DataConfig
    from diffusion_model_tpu.train import device_data
    from diffusion_model_tpu.train.train_vae import train_vae

    real = device_data.maybe_device_resident
    calls = {"n": 0}

    def fake(dataset, mesh, max_bytes=device_data.DEFAULT_MAX_BYTES):
        i = calls["n"]
        calls["n"] += 1
        # train_vae resolves train residency first, then val
        if (stream_side == "train") == (i == 0):
            return None
        return real(dataset, mesh, max_bytes)

    monkeypatch.setattr(device_data, "maybe_device_resident", fake)
    cfg = VAETrainConfig(
        epochs=1, batch_size=4, base_channels=8, bf16=False,
        save_dir=str(tmp_path / "vae"),
        data=DataConfig(
            synthetic_root=str(tmp_path / "data"), synthetic_count=8,
            synthetic_val_count=4, image_size=(32, 32),
        ),
    )
    out = train_vae(cfg, out_dir=str(tmp_path / "out"))
    assert calls["n"] == 2
    assert math.isfinite(out["train_losses"][-1])
    assert math.isfinite(out["val_losses"][-1])


def test_remat_step_matches_plain(tmp_path):
    """remat=True (jax.checkpoint around the U-Net forward) must be a pure
    memory/FLOP trade: identical losses and updated params vs remat=False
    for the same inputs and keys."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffusion_model_tpu.config import LatentTrainConfig
    from diffusion_model_tpu.diffusion import DiffusionSchedule
    from diffusion_model_tpu.models import VAE, VAEConfig
    from diffusion_model_tpu.train.train_latent import (
        build_models, create_latent_state, make_latent_train_step,
    )

    cfg = LatentTrainConfig(base_ch=8, time_dim=32, vae_base_channels=8,
                            bf16=False, num_timesteps=8)
    vae, unet = build_models(cfg)
    rng = jax.random.PRNGKey(0)
    vae_params = vae.init({"params": rng, "sample": rng},
                          jnp.zeros((1, 32, 32, 3)))["params"]
    schedule = DiffusionSchedule.create(cfg.num_timesteps)
    batch = {
        "image": jax.random.uniform(rng, (4, 32, 32, 3)),
        "vals": jnp.zeros((4, 12)),
        "mask": jnp.ones((4, 12)),
        "y": jnp.array([1, 2, 3, 1], jnp.int32),
    }
    # gradients must agree directly (comparing post-Adam params would
    # amplify recompute's float reassociation through 1/sqrt(v))
    from diffusion_model_tpu.train.train_latent import _unet_apply

    params = create_latent_state(jax.random.PRNGKey(1), cfg, unet,
                                 (4, 4)).params
    z = jax.random.normal(rng, (4, 4, 4, 4))
    t = jnp.array([1, 3, 5, 7])
    noise = jax.random.normal(jax.random.PRNGKey(3), z.shape)

    def loss_with(fwd):
        def loss(p):
            eps, geom = fwd(p, z, t, batch["y"], batch["vals"],
                            batch["mask"])
            return (jnp.mean(jnp.square(eps - noise))
                    + 0.1 * jnp.mean(jnp.square(geom)))
        return loss

    g_plain = jax.grad(loss_with(_unet_apply(unet, False)))(params)
    g_remat = jax.grad(loss_with(_unet_apply(unet, True)))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_plain),
                    jax.tree_util.tree_leaves(g_remat)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)

    # and the production step still runs + descends with remat on
    state = create_latent_state(jax.random.PRNGKey(1), cfg, unet, (4, 4))
    step = make_latent_train_step(unet, vae, schedule, 0.1, 0.1, remat=True)
    state, m = step(state, vae_params, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(m["loss"]))


@pytest.mark.heavy
def test_epoch_fused_vs_stepped_parity(tmp_path, monkeypatch):
    """The stepped device-resident mode (CPU fast path, one jitted step
    per index row) must train identically to the epoch-fused lax.scan
    (TPU fast path): same RNG stream, same losses up to XLA refusion."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffusion_model_tpu.config import DataConfig, LatentTrainConfig
    from diffusion_model_tpu.models import VAE, VAEConfig
    from diffusion_model_tpu.train import train_latent_cond

    def run(fuse, root):
        monkeypatch.setenv("DIFFUSION_TPU_EPOCH_FUSE", fuse)
        cfg = LatentTrainConfig(
            epochs=2, batch_size=8, num_timesteps=8, base_ch=8, time_dim=32,
            vae_base_channels=8, bf16=False, val_interval=2,
            post_train_samples=0,
            model_para_dir=str(root / "model_para"),
            result_root=str(root / "result"),
            data=DataConfig(synthetic_root=str(tmp_path / "data"),
                            synthetic_count=8, synthetic_val_count=4,
                            image_size=(32, 32)),
        )
        vae = VAE(VAEConfig(base_channels=8))
        rng = jax.random.PRNGKey(0)
        vae_params = vae.init({"params": rng, "sample": rng},
                              jnp.zeros((1, 32, 32, 3)))["params"]
        monkeypatch.chdir(root)
        return train_latent_cond(cfg, vae_params=vae_params)

    (tmp_path / "a").mkdir()
    (tmp_path / "b").mkdir()
    fused = run("1", tmp_path / "a")
    stepped = run("0", tmp_path / "b")
    np.testing.assert_allclose(fused["train_losses"],
                               stepped["train_losses"], rtol=2e-4)
    np.testing.assert_allclose(fused["val_losses"], stepped["val_losses"],
                               rtol=2e-4)

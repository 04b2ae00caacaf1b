"""Min-SNR-γ loss weighting (Hang et al. 2023, arXiv:2303.09556 —
beyond-reference training lever): closed-form weight checks for both
parameterizations, uniform-path equivalence with the reference's plain
MSE, and trainer integration."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_model_tpu.diffusion import DiffusionSchedule
from diffusion_model_tpu.train.losses import (snr_loss_weights,
                                              weighted_noise_mse)


def _snr(sch, t):
    ab = sch.alpha_bars[np.asarray(t) - 1].astype(np.float64)
    return ab / (1.0 - ab)


def test_min_snr_weights_eps_closed_form():
    sch = DiffusionSchedule.create(1000)
    t = jnp.array([1, 10, 100, 500, 1000])
    g = 5.0
    w = np.asarray(snr_loss_weights(sch, t, "epsilon", "min_snr", g))
    snr = _snr(sch, t)
    np.testing.assert_allclose(w, np.minimum(snr, g) / snr, rtol=1e-4)
    # low t = high SNR -> clamped, tiny weight; late t -> weight exactly 1
    assert w[0] < 1e-2
    assert snr[-1] < g and abs(w[-1] - 1.0) < 1e-5
    # monotone non-decreasing in t for the linear schedule
    assert (np.diff(w) >= -1e-7).all()


def test_min_snr_weights_v_closed_form():
    sch = DiffusionSchedule.create(1000)
    t = jnp.arange(1, 1001, 37)
    g = 5.0
    w = np.asarray(snr_loss_weights(sch, t, "v", "min_snr", g))
    snr = _snr(sch, t)
    np.testing.assert_allclose(w, np.minimum(snr, g) / (snr + 1.0),
                               rtol=1e-4)
    assert (w <= 1.0 + 1e-6).all()  # min(SNR,γ)/(SNR+1) < 1 always


def test_uniform_weights_reproduce_plain_mse():
    sch = DiffusionSchedule.create(100)
    rng = jax.random.PRNGKey(0)
    pred = jax.random.normal(rng, (6, 8, 8, 4))
    tgt = jax.random.normal(jax.random.fold_in(rng, 1), pred.shape)
    t = jnp.array([1, 5, 20, 50, 80, 100])
    w = snr_loss_weights(sch, t, "epsilon", "uniform")
    np.testing.assert_allclose(np.asarray(w), 1.0)
    got = weighted_noise_mse(pred, tgt, w)
    want = jnp.mean(jnp.square(pred - tgt))
    # mean-of-means vs overall mean differ only by f32 reassociation
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_weighted_mse_manual():
    pred = jnp.stack([jnp.zeros((4, 4)), jnp.ones((4, 4))])
    tgt = jnp.zeros((2, 4, 4))
    w = jnp.array([3.0, 0.5])
    # per-sample MSEs are 0 and 1 -> mean(w * [0, 1]) = 0.25
    np.testing.assert_allclose(float(weighted_noise_mse(pred, tgt, w)), 0.25)


def test_unknown_weighting_raises():
    sch = DiffusionSchedule.create(10)
    with pytest.raises(ValueError):
        snr_loss_weights(sch, jnp.array([1]), "epsilon", "bogus")


def test_train_step_min_snr_integration():
    """The weighted step must run, produce a finite loss, and differ from
    the uniform loss on identical inputs/keys."""
    from diffusion_model_tpu.config import LatentTrainConfig
    from diffusion_model_tpu.train.train_latent import (
        build_models, create_latent_state, make_latent_train_step)

    cfg = LatentTrainConfig(batch_size=4, num_timesteps=50, base_ch=8,
                            time_dim=32, vae_base_channels=8, bf16=False)
    vae, unet = build_models(cfg)
    rng = jax.random.PRNGKey(0)
    vae_params = vae.init({"params": rng, "sample": rng},
                          jnp.zeros((1, 32, 32, 3)))["params"]
    batch = {
        "image": jax.random.uniform(jax.random.fold_in(rng, 1),
                                    (4, 32, 32, 3)),
        "y": jnp.array([1, 2, 3, 1], jnp.int32),
        "vals": jnp.zeros((4, 12)), "mask": jnp.zeros((4, 12)),
    }
    losses = {}
    for weighting in ("uniform", "min_snr"):
        state = create_latent_state(rng, cfg, unet, (4, 4))
        step = make_latent_train_step(
            unet, vae, schedule=DiffusionSchedule.create(cfg.num_timesteps),
            cfg_drop_prob=0.0, geom_lambda=0.0, loss_weighting=weighting,
            snr_gamma=5.0,
        )
        _, out = step(state, vae_params, batch, jax.random.PRNGKey(7))
        losses[weighting] = float(out["loss"])
        assert np.isfinite(losses[weighting])
    # same key -> same t draws; min-SNR down-weights low-t samples so the
    # scalar must differ from the plain mean
    assert abs(losses["uniform"] - losses["min_snr"]) > 1e-8


@pytest.mark.heavy
def test_trainer_min_snr_smoke(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from diffusion_model_tpu.config import DataConfig, LatentTrainConfig
    from diffusion_model_tpu.models import VAE, VAEConfig
    from diffusion_model_tpu.train import train_latent_cond

    cfg = LatentTrainConfig(
        epochs=2, batch_size=8, num_timesteps=8, base_ch=8, time_dim=32,
        vae_base_channels=8, bf16=False, val_interval=2,
        post_train_samples=0, loss_weighting="min_snr", snr_gamma=5.0,
        data=DataConfig(synthetic_root=str(tmp_path / "data"),
                        synthetic_count=8, synthetic_val_count=4,
                        image_size=(32, 32)),
    )
    vae = VAE(VAEConfig(base_channels=8))
    rng = jax.random.PRNGKey(0)
    vae_params = vae.init({"params": rng, "sample": rng},
                          jnp.zeros((1, 32, 32, 3)))["params"]
    res = train_latent_cond(cfg, vae_params=vae_params)
    assert np.isfinite(res["train_losses"][-1])
    assert np.isfinite(res["val_losses"][-1])

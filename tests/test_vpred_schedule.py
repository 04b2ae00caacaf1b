"""Cosine noise schedule + v-prediction (beyond-reference options):
closed-form properties, exact v<->eps identities, trainer + pipeline
integration."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_model_tpu.diffusion import DiffusionSchedule, q_sample
from diffusion_model_tpu.diffusion.sampling import v_target, v_to_eps


def test_cosine_schedule_properties():
    T = 1000
    sch = DiffusionSchedule.create(T, kind="cosine")
    assert sch.betas.shape == (T,)
    assert (sch.betas > 0).all() and (sch.betas <= 0.999).all()
    ab = sch.alpha_bars
    assert (np.diff(ab) < 0).all()          # strictly decreasing
    assert ab[-1] < 1e-3                     # ~fully noised at t=T
    # closed form: ᾱ_t == f(t/T)/f(0) within cumprod rounding
    s = 0.008
    f = lambda u: np.cos((u + s) / (1 + s) * np.pi / 2) ** 2
    want = f(np.arange(1, T + 1) / T) / f(0.0)
    # betas are clipped at 0.999 near t=T, so compare where unclipped
    m = sch.betas < 0.999
    np.testing.assert_allclose(ab[m], want[m], rtol=1e-3, atol=1e-6)


def test_linear_schedule_unchanged():
    sch = DiffusionSchedule.create(10)
    np.testing.assert_allclose(sch.betas[0], 1e-4, rtol=1e-6)
    np.testing.assert_allclose(sch.betas[-1], 0.02, rtol=1e-6)


@pytest.mark.parametrize("kind", ["linear", "cosine"])
def test_v_eps_roundtrip_identity(kind):
    """x_t from q_sample, v from v_target: v_to_eps must recover ε
    exactly (algebraic identity, any schedule)."""
    sch = DiffusionSchedule.create(50, kind=kind)
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.normal(rng, (4, 8, 8, 2))
    noise = jax.random.normal(jax.random.fold_in(rng, 1), x0.shape)
    t = jnp.array([1, 17, 33, 50])
    x_t = q_sample(sch, x0, t, noise)
    v = v_target(sch, x0, t, noise)
    eps_back = v_to_eps(sch, x_t, t, v)
    np.testing.assert_allclose(np.asarray(eps_back), np.asarray(noise),
                               atol=2e-5)


def test_pipeline_v_prediction_runs():
    """prediction_type='v' converts inside the jitted sampler; the same
    raw network interpreted as v vs ε must give different samples."""
    from diffusion_model_tpu.models import CondUNet, UNetConfig
    from diffusion_model_tpu.pipeline import DiffusionPipeline

    unet = CondUNet(UNetConfig(in_ch=4, time_dim=32, num_classes=3,
                               geom_dim=12, with_geom_head=True, base_ch=8,
                               remove_deep_conv=True))
    rng = jax.random.PRNGKey(0)
    params = unet.init(rng, jnp.zeros((2, 8, 8, 4)),
                       jnp.ones((2,), jnp.int32),
                       jnp.zeros((2,), jnp.int32), jnp.zeros((2, 12)),
                       jnp.zeros((2, 12)))["params"]
    outs = {}
    for ptype in ("epsilon", "v"):
        pipe = DiffusionPipeline(
            unet=unet, unet_params=params, vae=None, vae_params=None,
            schedule=DiffusionSchedule.create(6), use_data_parallel=False,
            prediction_type=ptype,
        )
        z = pipe.sample_latent_cond(
            (1, 2), z_shape=(4, 8, 8), guidance_scale=3.0,
            key=jax.random.PRNGKey(4), to_pil=False, decode=False,
        )
        outs[ptype] = np.asarray(z)
        assert np.isfinite(outs[ptype]).all()
    assert np.abs(outs["epsilon"] - outs["v"]).max() > 1e-6


@pytest.mark.heavy
def test_trainer_v_cosine_smoke(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from diffusion_model_tpu.config import DataConfig, LatentTrainConfig
    from diffusion_model_tpu.models import VAE, VAEConfig
    from diffusion_model_tpu.train import train_latent_cond

    cfg = LatentTrainConfig(
        epochs=2, batch_size=8, num_timesteps=8, base_ch=8, time_dim=32,
        vae_base_channels=8, bf16=False, val_interval=2,
        post_train_samples=0, prediction_type="v", schedule_kind="cosine",
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

"""DDIM sampler: timestep subsequences, oracle-model recovery, determinism,
pipeline integration."""
import jax
import jax.numpy as jnp
import numpy as np

from diffusion_model_tpu.diffusion import (
    DiffusionSchedule,
    ddim_step,
    ddim_timesteps,
    q_sample,
    sample_loop,
    sample_loop_ddim,
)


def test_ddim_timesteps_subsequence():
    ts = np.asarray(ddim_timesteps(1000, 50))
    assert ts.shape == (50,)
    assert ts[0] == 1000 and ts[-1] == 1
    assert (np.diff(ts) < 0).all()
    # S >= T degenerates to the full schedule
    full = np.asarray(ddim_timesteps(10, 100))
    np.testing.assert_array_equal(full, np.arange(10, 0, -1))


def test_ddim_final_step_alpha_prev_is_one():
    """t_prev=0 must target ᾱ=1 (clean sample), not wrap."""
    s = DiffusionSchedule.create(10)
    x = jnp.ones((2, 4, 4, 1))
    eps = jnp.zeros_like(x)
    out = ddim_step(s, x, jnp.array([1, 1]), jnp.array([0, 0]), eps,
                    jnp.zeros_like(x), eta=0.0)
    # eps=0 -> x0_pred = x/sqrt(ab_1); ab_prev=1 -> out = x0_pred exactly
    expected = 1.0 / np.sqrt(s.alpha_bars[0])
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5)


def test_ddim_oracle_recovers_signal():
    T = 100
    s = DiffusionSchedule.create(T)
    x0 = jnp.full((2, 4, 4, 1), 0.5)
    key = jax.random.PRNGKey(0)

    def eps_fn(x, t, y, cv, cm):
        ab = jnp.asarray(s.alpha_bars)[t - 1].reshape(-1, 1, 1, 1)
        return (x - jnp.sqrt(ab) * x0) / jnp.sqrt(1 - ab)

    x_init = q_sample(s, x0, jnp.full((2,), T, jnp.int32),
                      jax.random.normal(key, x0.shape))
    out = sample_loop_ddim(s, eps_fn, x_init, key, num_inference_steps=10)
    # deterministic DDIM with an oracle model recovers x0 ~exactly
    np.testing.assert_allclose(np.asarray(out), 0.5, atol=2e-2)


def test_ddim_eta_zero_deterministic():
    T = 20
    s = DiffusionSchedule.create(T)

    def eps_fn(x, t, y, cv, cm):
        return 0.1 * x

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 4, 2))
    a = sample_loop_ddim(s, eps_fn, x, jax.random.PRNGKey(2),
                         num_inference_steps=5)
    b = sample_loop_ddim(s, eps_fn, x, jax.random.PRNGKey(99),
                         num_inference_steps=5)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_ddim_full_schedule_close_to_ddpm_mean():
    """With S=T and eta=1 DDIM is the DDPM ancestral sampler; with an oracle
    model both walk back to the same signal."""
    T = 64
    s = DiffusionSchedule.create(T)
    x0 = jnp.full((2, 4, 4, 1), 0.3)
    key = jax.random.PRNGKey(0)

    def eps_fn(x, t, y, cv, cm):
        ab = jnp.asarray(s.alpha_bars)[t - 1].reshape(-1, 1, 1, 1)
        return (x - jnp.sqrt(ab) * x0) / jnp.sqrt(1 - ab)

    x_init = q_sample(s, x0, jnp.full((2,), T, jnp.int32),
                      jax.random.normal(key, x0.shape))
    ddpm = sample_loop(s, eps_fn, x_init, key)
    ddim = sample_loop_ddim(s, eps_fn, x_init, key, num_inference_steps=T,
                            eta=1.0)
    assert abs(float(ddpm.mean()) - 0.3) < 0.1
    assert abs(float(ddim.mean()) - 0.3) < 0.1


def test_pipeline_ddim(tmp_path):
    from diffusion_model_tpu.models import VAE, VAEConfig, CondUNet, UNetConfig
    from diffusion_model_tpu.pipeline import DiffusionPipeline

    rng = jax.random.PRNGKey(0)
    vae = VAE(VAEConfig(base_channels=8))
    unet = CondUNet(UNetConfig(in_ch=4, time_dim=32, num_classes=3,
                               with_geom_head=True, base_ch=8,
                               remove_deep_conv=True))
    vae_params = vae.init({"params": rng, "sample": rng},
                          jnp.zeros((1, 32, 32, 3)))["params"]
    z = jnp.zeros((1, 4, 4, 4))
    unet_params = unet.init(
        rng, z, jnp.ones((1,), jnp.int32), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 12)), jnp.zeros((1, 12)))["params"]
    pipe = DiffusionPipeline(
        unet=unet, unet_params=unet_params, vae=vae, vae_params=vae_params,
        schedule=DiffusionSchedule.create(100), use_data_parallel=False,
    )
    imgs = pipe.sample_latent_cond(
        (2, 3), image_hw=(32, 32), to_pil=False, method="ddim",
        num_inference_steps=8, key=jax.random.PRNGKey(5),
    )
    assert imgs.shape == (3, 32, 32, 3)
    assert np.isfinite(imgs).all()


def test_ddim_timesteps_dedupe_large_ratio():
    """S close to T makes round(linspace) collide; duplicates must be
    dropped so no model evaluation is spent on a no-op step."""
    from diffusion_model_tpu.diffusion.sampling import ddim_timesteps

    ts = np.asarray(ddim_timesteps(10, 9))
    assert len(np.unique(ts)) == len(ts)
    assert (np.diff(ts) < 0).all()          # strictly descending
    assert ts[-1] == 1 and ts[0] == 10
    # oversampling request degrades to the full unique schedule
    ts2 = np.asarray(ddim_timesteps(8, 100))
    assert ts2.tolist() == [8, 7, 6, 5, 4, 3, 2, 1]

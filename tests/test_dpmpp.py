"""DPM-Solver++(2M) sampler: analytic-ODE accuracy (second-order), oracle
recovery, determinism, CFG batching, pipeline integration.

The discriminating test uses Gaussian data x0 ~ N(0, s²I): the probability-
flow ODE then has the closed-form solution x(0) = x(T)·s/√(ᾱ_T s² + 1−ᾱ_T)
(linear score ⇒ the flow preserves x/√Var(x_t)), so solver error is
measurable exactly — and the 2M update must beat first-order DDIM at equal
step counts and converge ~h² instead of ~h.
"""
import jax
import jax.numpy as jnp
import numpy as np

from diffusion_model_tpu.diffusion import (
    DiffusionSchedule,
    q_sample,
    sample_loop_ddim,
    sample_loop_dpmpp,
)


def _gaussian_oracle(schedule, s):
    """Exact eps predictor for x0 ~ N(0, s²I): eps*(x,t) = σ·x/(α²s²+σ²)."""

    def eps_fn(x, t, y, cv, cm):
        ab = schedule.alpha_bar(t).reshape((-1,) + (1,) * (x.ndim - 1))
        a2 = ab
        s2 = 1.0 - ab
        return x * jnp.sqrt(s2) / (a2 * s**2 + s2)

    return eps_fn


def _gaussian_exact(schedule, s, x_T):
    ab_T = float(np.asarray(schedule.alpha_bars)[-1])
    return np.asarray(x_T) * s / np.sqrt(ab_T * s**2 + (1.0 - ab_T))


def test_dpmpp_beats_ddim_on_analytic_ode():
    sched = DiffusionSchedule.create(1000)
    s = 2.0
    eps_fn = _gaussian_oracle(sched, s)
    x_T = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 8, 2))
    exact = _gaussian_exact(sched, s, x_T)

    for S, min_ratio in ((20, 1.5), (50, 3.0)):
        xd = np.asarray(sample_loop_ddim(sched, eps_fn, x_T,
                                         jax.random.PRNGKey(1),
                                         num_inference_steps=S))
        xp = np.asarray(sample_loop_dpmpp(sched, eps_fn, x_T,
                                          num_inference_steps=S))
        err_ddim = np.abs(xd - exact).max() / s
        err_dpmpp = np.abs(xp - exact).max() / s
        assert err_dpmpp * min_ratio < err_ddim, (S, err_ddim, err_dpmpp)


def test_dpmpp_second_order_convergence():
    """Error should fall ~h² ≈ 6× when steps go 20 → 50 (first order: 2.5×)."""
    sched = DiffusionSchedule.create(1000)
    s = 2.0
    eps_fn = _gaussian_oracle(sched, s)
    x_T = jax.random.normal(jax.random.PRNGKey(2), (4, 8, 8, 2))
    exact = _gaussian_exact(sched, s, x_T)

    errs = {}
    for S in (20, 50):
        xp = np.asarray(sample_loop_dpmpp(sched, eps_fn, x_T,
                                          num_inference_steps=S))
        errs[S] = np.abs(xp - exact).max() / s
    assert errs[20] / errs[50] > 4.0, errs  # clearly super-linear


def test_dpmpp_oracle_recovers_signal():
    """With a delta-data oracle (x0 always the same image) every x0
    prediction is exact, so even few steps land on the signal."""
    T = 100
    sched = DiffusionSchedule.create(T)
    x0 = jnp.full((2, 4, 4, 1), 0.5)

    def eps_fn(x, t, y, cv, cm):
        ab = jnp.asarray(sched.alpha_bars)[t - 1].reshape(-1, 1, 1, 1)
        return (x - jnp.sqrt(ab) * x0) / jnp.sqrt(1 - ab)

    key = jax.random.PRNGKey(0)
    x_init = q_sample(sched, x0, jnp.full((2,), T, jnp.int32),
                      jax.random.normal(key, x0.shape))
    out = sample_loop_dpmpp(sched, eps_fn, x_init, num_inference_steps=10)
    np.testing.assert_allclose(np.asarray(out), 0.5, atol=2e-2)


def test_dpmpp_deterministic_and_key_ignored():
    sched = DiffusionSchedule.create(50)

    def eps_fn(x, t, y, cv, cm):
        return 0.1 * x

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 4, 2))
    a = sample_loop_dpmpp(sched, eps_fn, x, jax.random.PRNGKey(2),
                          num_inference_steps=7)
    b = sample_loop_dpmpp(sched, eps_fn, x, jax.random.PRNGKey(99),
                          num_inference_steps=7)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_dpmpp_single_and_two_steps():
    """Degenerate step counts: S=1 is one first-order step to ᾱ=1 (pure x0
    prediction); S=2 must stay finite (no 2M extrapolation available)."""
    sched = DiffusionSchedule.create(10)

    def eps_fn(x, t, y, cv, cm):
        return jnp.zeros_like(x)

    x = jnp.ones((2, 4, 4, 1))
    out1 = sample_loop_dpmpp(sched, eps_fn, x, num_inference_steps=1)
    # t=1 only (ddim_timesteps(10, 1) = [1]? linspace(1,10,1)=[1]); eps=0
    # -> x0 = x/sqrt(ab at that t); just require finiteness + shape here
    assert out1.shape == x.shape and np.isfinite(np.asarray(out1)).all()
    out2 = sample_loop_dpmpp(sched, eps_fn, x, num_inference_steps=2)
    assert np.isfinite(np.asarray(out2)).all()


def test_dpmpp_cfg_guided_matches_manual_mix():
    """guidance_scale>0 must mix uncond/cond epsilon exactly like cfg_eps:
    a model whose eps depends only on the label lets us verify the 2B mix."""
    sched = DiffusionSchedule.create(20)

    def eps_fn(x, t, y, cv, cm):
        return jnp.where(y.reshape(-1, 1, 1, 1) > 0, 0.2, 0.1) * x

    def eps_mixed(x, t, y, cv, cm):
        # cfg with scale 3: e_u + 3(e_c - e_u) = 0.1x + 3(0.1x) = 0.4x
        return 0.4 * x

    x = jax.random.normal(jax.random.PRNGKey(3), (2, 4, 4, 1))
    y = jnp.ones((2,), jnp.int32)
    guided = sample_loop_dpmpp(sched, eps_fn, x, num_inference_steps=6,
                               y=y, guidance_scale=3.0)
    manual = sample_loop_dpmpp(sched, eps_mixed, x, num_inference_steps=6,
                               y=y, guidance_scale=0.0)
    np.testing.assert_allclose(np.asarray(guided), np.asarray(manual),
                               atol=1e-5)


def test_pipeline_dpmpp(tmp_path):
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
        (2, 3), image_hw=(32, 32), to_pil=False, method="dpmpp",
        num_inference_steps=8, key=jax.random.PRNGKey(5),
    )
    assert imgs.shape == (3, 32, 32, 3)
    assert np.isfinite(imgs).all()

"""Karras (EDM, arXiv:2206.00364) rho=7 timestep spacing for the fast
samplers: grid properties, analytic-ODE accuracy, pipeline integration."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_model_tpu.diffusion import DiffusionSchedule
from diffusion_model_tpu.diffusion.sampling import (
    _ddim_timesteps_np,
    sample_loop_ddim,
    sample_loop_dpmpp,
    sampler_timesteps_np,
)
from tests.test_dpmpp import _gaussian_exact, _gaussian_oracle


@pytest.mark.parametrize("kind", ["linear", "cosine"])
def test_karras_grid_properties(kind):
    T, S = 1000, 30
    sched = DiffusionSchedule.create(T, kind=kind)
    ts = sampler_timesteps_np(sched, S, "karras")
    assert ts.dtype == np.int32
    assert (np.diff(ts) < 0).all()            # strictly descending (deduped)
    assert ts[0] == T and ts[-1] == 1          # spans sigma_max .. sigma_min
    assert 1 <= ts.min() and ts.max() <= T
    # rho=7 concentrates evaluations at low noise: more grid points in the
    # bottom decile of t than the uniform grid puts there
    lin = _ddim_timesteps_np(T, S)
    assert (ts <= T // 10).sum() > (lin <= T // 10).sum()


def test_karras_grid_degenerate_counts():
    sched = DiffusionSchedule.create(100)
    assert list(sampler_timesteps_np(sched, 1, "karras")) == [1]
    ts2 = sampler_timesteps_np(sched, 2, "karras")
    assert ts2[0] == 100 and ts2[-1] == 1
    with pytest.raises(ValueError):
        sampler_timesteps_np(sched, 10, "quadratic")


def test_dpmpp_karras_accuracy_on_analytic_ode():
    """On the Gaussian closed-form ODE, karras spacing must stay in the
    same accuracy class as the linear grid (and far better than
    first-order DDIM at equal steps)."""
    sched = DiffusionSchedule.create(1000)
    s = 2.0
    eps_fn = _gaussian_oracle(sched, s)
    x_T = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 8, 2))
    exact = _gaussian_exact(sched, s, x_T)

    S = 20
    err = {}
    for spacing in ("linear", "karras"):
        xp = np.asarray(sample_loop_dpmpp(sched, eps_fn, x_T,
                                          num_inference_steps=S,
                                          timestep_spacing=spacing))
        err[spacing] = np.abs(xp - exact).max() / s
    xd = np.asarray(sample_loop_ddim(sched, eps_fn, x_T,
                                     jax.random.PRNGKey(1),
                                     num_inference_steps=S))
    err_ddim_lin = np.abs(xd - exact).max() / s
    assert err["karras"] < err_ddim_lin, err
    assert err["karras"] < 3.0 * err["linear"], err


def test_ddim_karras_runs_and_differs_from_linear():
    sched = DiffusionSchedule.create(200)

    def eps_fn(x, t, y, cv, cm):
        ab = sched.alpha_bar(t).reshape((-1,) + (1,) * (x.ndim - 1))
        return x * jnp.sqrt(1.0 - ab) / (ab * 4.0 + (1.0 - ab))

    x = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 4, 2))
    out = {}
    for spacing in ("linear", "karras"):
        out[spacing] = np.asarray(sample_loop_ddim(
            sched, eps_fn, x, jax.random.PRNGKey(3),
            num_inference_steps=12, timestep_spacing=spacing))
        assert np.isfinite(out[spacing]).all()
    assert np.abs(out["linear"] - out["karras"]).max() > 1e-6


def test_pipeline_karras_spacing():
    from diffusion_model_tpu.models import CondUNet, UNetConfig
    from diffusion_model_tpu.pipeline import DiffusionPipeline

    unet = CondUNet(UNetConfig(in_ch=4, time_dim=32, num_classes=3,
                               geom_dim=12, with_geom_head=True, base_ch=8,
                               remove_deep_conv=True))
    rng = jax.random.PRNGKey(0)
    params = unet.init(rng, jnp.zeros((2, 8, 8, 4)),
                       jnp.ones((2,), jnp.int32), jnp.zeros((2,), jnp.int32),
                       jnp.zeros((2, 12)), jnp.zeros((2, 12)))["params"]
    pipe = DiffusionPipeline(
        unet=unet, unet_params=params, vae=None, vae_params=None,
        schedule=DiffusionSchedule.create(100), use_data_parallel=False,
    )
    outs = {}
    for spacing in ("linear", "karras"):
        z = pipe.sample_latent_cond(
            (1, 2), z_shape=(4, 8, 8), guidance_scale=3.0, method="dpmpp",
            num_inference_steps=8, timestep_spacing=spacing,
            key=jax.random.PRNGKey(4), to_pil=False, decode=False,
        )
        outs[spacing] = np.asarray(z)
        assert np.isfinite(outs[spacing]).all()
    assert np.abs(outs["linear"] - outs["karras"]).max() > 1e-6

"""Encoder-cached DDPM sampling (sample_loop_encoder_cached +
CondUNet.embed/encode/decode split): equivalence at cache_interval=1,
split-vs-monolithic forward parity, pipeline integration."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_model_tpu.diffusion import (
    DiffusionSchedule, sample_loop, sample_loop_encoder_cached,
)
from diffusion_model_tpu.models import CondUNet, UNetConfig, VAE, VAEConfig


def _tiny():
    unet = CondUNet(UNetConfig(in_ch=4, time_dim=32, num_classes=3,
                               geom_dim=12, with_geom_head=True, base_ch=8,
                               remove_deep_conv=True))
    rng = jax.random.PRNGKey(0)
    B = 2
    z = jnp.zeros((B, 16, 16, 4))
    params = unet.init(rng, z, jnp.ones((B,), jnp.int32),
                       jnp.zeros((B,), jnp.int32), jnp.zeros((B, 12)),
                       jnp.zeros((B, 12)))["params"]
    return unet, params


def _split_fns(unet, params):
    embed = lambda t, y, cv, cm: unet.apply(
        {"params": params}, t, y, cv, cm, method=CondUNet.embed)
    encode = lambda x, emb: unet.apply(
        {"params": params}, x, emb, method=CondUNet.encode)

    def decode(feats, emb):
        out = unet.apply({"params": params}, feats, emb,
                         method=CondUNet.decode)
        return out[0] if isinstance(out, tuple) else out

    return embed, encode, decode


def test_split_forward_matches_call():
    unet, params = _tiny()
    embed, encode, decode = _split_fns(unet, params)
    rng = jax.random.PRNGKey(1)
    x = jax.random.normal(rng, (2, 16, 16, 4))
    t = jnp.array([5, 900])
    y = jnp.array([1, 2])
    v = jax.random.normal(jax.random.fold_in(rng, 1), (2, 12))
    m = jnp.ones((2, 12))
    eps_ref, _ = unet.apply({"params": params}, x, t, y, v, m)
    emb = embed(t, y, v, m)
    eps_split = decode(encode(x, emb), emb)
    np.testing.assert_allclose(np.asarray(eps_ref), np.asarray(eps_split),
                               atol=1e-6)


def test_cache_interval_one_equals_sample_loop():
    unet, params = _tiny()
    embed, encode, decode = _split_fns(unet, params)
    schedule = DiffusionSchedule.create(12)
    rng = jax.random.PRNGKey(2)
    x0 = jax.random.normal(rng, (2, 16, 16, 4))
    y = jnp.array([1, 2])
    v = jnp.zeros((2, 12))
    m = jnp.ones((2, 12))

    def eps_fn(x, t, y_, cv, cm):
        out = unet.apply({"params": params}, x, t, y_, cv, cm)
        return out[0]

    ref = sample_loop(schedule, eps_fn, x0, jax.random.PRNGKey(3), y=y,
                      cond_vals=v, cond_mask=m, guidance_scale=3.0)
    got = sample_loop_encoder_cached(
        schedule, embed, encode, decode, x0, jax.random.PRNGKey(3), y=y,
        cond_vals=v, cond_mask=m, guidance_scale=3.0, cache_interval=1)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-4)


def test_cached_interval_runs_and_differs():
    unet, params = _tiny()
    embed, encode, decode = _split_fns(unet, params)
    schedule = DiffusionSchedule.create(12)
    rng = jax.random.PRNGKey(2)
    x0 = jax.random.normal(rng, (2, 16, 16, 4))
    y = jnp.array([1, 2])
    common = dict(y=y, cond_vals=jnp.zeros((2, 12)),
                  cond_mask=jnp.ones((2, 12)), guidance_scale=3.0)
    exact = sample_loop_encoder_cached(
        schedule, embed, encode, decode, x0, jax.random.PRNGKey(3),
        cache_interval=1, **common)
    cached = sample_loop_encoder_cached(
        schedule, embed, encode, decode, x0, jax.random.PRNGKey(3),
        cache_interval=3, **common)
    assert np.isfinite(np.asarray(cached)).all()
    # caching is an approximation: same RNG, different trajectory
    assert float(jnp.max(jnp.abs(exact - cached))) > 0.0


def test_pipeline_ddpm_cached_end_to_end():
    unet, params = _tiny()
    vae = VAE(VAEConfig(base_channels=8))
    rng = jax.random.PRNGKey(0)
    vae_params = vae.init({"params": rng, "sample": rng},
                          jnp.zeros((1, 128, 128, 3)))["params"]
    from diffusion_model_tpu.pipeline import DiffusionPipeline

    pipe = DiffusionPipeline(
        unet=unet, unet_params=params, vae=vae, vae_params=vae_params,
        schedule=DiffusionSchedule.create(8), use_data_parallel=False,
    )
    imgs = pipe.sample_latent_cond(
        (1, 2), guidance_scale=3.0, key=jax.random.PRNGKey(5),
        to_pil=False, image_hw=(128, 128), method="ddpm_cached",
        cache_interval=2,
    )
    assert np.asarray(imgs).shape == (2, 128, 128, 3)
    assert np.isfinite(np.asarray(imgs)).all()

"""Extra pipeline-surface coverage: pixel-space sampling, drawing-canvas
inference in the CSV sampler, uncond CLI parser."""
import csv

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_model_tpu.diffusion import DiffusionSchedule
from diffusion_model_tpu.models import CondUNet, UNetConfig
from diffusion_model_tpu.pipeline import CsvConditionSampler, DiffusionPipeline


@pytest.fixture(scope="module")
def pixel_pipeline():
    unet = CondUNet(UNetConfig(in_ch=3, time_dim=32, num_classes=None,
                               with_geom_head=False, base_ch=8,
                               remove_deep_conv=True))
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 16, 16, 3))
    params = unet.init(rng, x, jnp.ones((1,), jnp.int32))["params"]
    return DiffusionPipeline(
        unet=unet, unet_params=params, vae=None, vae_params=None,
        schedule=DiffusionSchedule.create(5), use_data_parallel=False,
    )


@pytest.mark.heavy
def test_sample_pixel(pixel_pipeline):
    imgs = pixel_pipeline.sample_pixel((2, 16, 16, 3),
                                       key=jax.random.PRNGKey(1))
    assert len(imgs) == 2
    assert imgs[0].size == (16, 16)
    arr = pixel_pipeline.sample_pixel((2, 16, 16, 3), to_pil=False,
                                      key=jax.random.PRNGKey(1))
    assert arr.shape == (2, 16, 16, 3)
    assert np.isfinite(arr).all()


def test_sample_latent_uncond_requires_vae(pixel_pipeline):
    # decode=False path works without a VAE via explicit z_shape
    z = pixel_pipeline.sample_latent(2, z_shape=(3, 4, 4), decode=False,
                                     key=jax.random.PRNGKey(0))
    assert z.shape == (2, 4, 4, 3)


def test_csv_sampler_infers_drawing_canvas(tmp_path, pixel_pipeline):
    """base_wh=None must infer + snap the canvas from CSV maxima
    (entityCsvSampler.py:167-190 behavior)."""
    p = tmp_path / "line.csv"
    with open(p, "w", newline="") as f:
        w = csv.writer(f)
        r = [0.0] * 13
        r[1:5] = [10.0, 20.0, 399.5, 280.2]  # max x ≈ 400 → snap, y ≈ 280
        w.writerow(r)
    s = CsvConditionSampler(pixel_pipeline, class_id=1, base_wh=None)
    vals, mask = s.load_cond(str(p))
    # x normalized by snapped 400, y by snapped 280
    assert vals[0, 0] == pytest.approx(10.0 / 400.0)
    assert vals[0, 1] == pytest.approx(1.0 - 20.0 / 280.0, rel=1e-5)


@pytest.fixture(scope="module")
def latent_pipeline():
    from diffusion_model_tpu.models import VAE, VAEConfig

    unet = CondUNet(UNetConfig(in_ch=4, time_dim=32, num_classes=3,
                               geom_dim=12, with_geom_head=True, base_ch=8,
                               remove_deep_conv=True))
    vae = VAE(VAEConfig(base_channels=8))
    rng = jax.random.PRNGKey(0)
    z = jnp.zeros((1, 4, 4, 4))
    up = unet.init(rng, z, jnp.ones((1,), jnp.int32),
                   jnp.zeros((1,), jnp.int32), jnp.zeros((1, 12)),
                   jnp.zeros((1, 12)))["params"]
    vp = vae.init({"params": rng, "sample": rng},
                  jnp.zeros((1, 32, 32, 3)))["params"]
    return DiffusionPipeline(
        unet=unet, unet_params=up, vae=vae, vae_params=vp,
        schedule=DiffusionSchedule.create(4), use_data_parallel=False,
        decode_chunk=2,
    )


@pytest.mark.heavy
def test_quantize_on_device_matches_host(latent_pipeline):
    """quantize=True (device uint8) must be bit-identical to quantizing the
    f32 output on host (reverse_to_img semantics, diff.py:58-64), and B=4 >
    decode_chunk=2 exercises the lax.map chunked decode."""
    k = jax.random.PRNGKey(3)
    u8 = latent_pipeline.sample_latent_cond(
        (1, 4), guidance_scale=1.5, key=k, to_pil=False,
        image_hw=(32, 32), quantize=True)
    f32 = latent_pipeline.sample_latent_cond(
        (1, 4), guidance_scale=1.5, key=k, to_pil=False,
        image_hw=(32, 32), quantize=False)
    u8, f32 = np.asarray(u8), np.asarray(f32)
    assert u8.dtype == np.uint8 and f32.dtype == np.float32
    np.testing.assert_array_equal(
        u8, np.clip(f32 * 255.0, 0, 255).astype(np.uint8))


def test_quantize_without_decode_rejected(latent_pipeline):
    """quantize=True with decode=False would uint8-saturate raw latents;
    the combination must raise instead of silently returning garbage."""
    import pytest

    with pytest.raises(ValueError, match="quantize"):
        latent_pipeline.sample_latent_cond(
            (1, 2), key=jax.random.PRNGKey(0), to_pil=False,
            image_hw=(32, 32), decode=False, quantize=True)


def test_save_params_atomic_preserves_previous_on_crash(tmp_path):
    """save_params writes via temp+os.replace: an interrupted save must
    leave the previous checkpoint intact (ADVICE r2)."""
    from unittest import mock

    from diffusion_model_tpu.train.checkpoints import load_params, save_params

    tree = {"w": np.arange(4, dtype=np.float32)}
    path = str(tmp_path / "ck.msgpack")
    save_params(path, tree)
    # simulate a crash mid-write of the NEW file: os.replace never runs
    with mock.patch("os.replace", side_effect=OSError("killed")):
        try:
            save_params(path, {"w": np.zeros(4, dtype=np.float32)})
        except OSError:
            pass
    restored = load_params(path, {"w": np.zeros(4, dtype=np.float32)})
    np.testing.assert_array_equal(restored["w"], tree["w"])


@pytest.mark.heavy
def test_decode_chunking_matches_whole_batch(latent_pipeline):
    """Chunked decode (decode_chunk=2) must equal whole-batch decode."""
    import dataclasses

    whole = dataclasses.replace(latent_pipeline, decode_chunk=0)
    k = jax.random.PRNGKey(7)
    a = latent_pipeline.sample_latent_cond(
        (2, 4), guidance_scale=0.0, key=k, to_pil=False, image_hw=(32, 32),
        quantize=False)
    b = whole.sample_latent_cond(
        (2, 4), guidance_scale=0.0, key=k, to_pil=False, image_hw=(32, 32),
        quantize=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-6)


def test_generate_uncond_parser():
    from diffusion_model_tpu.cli.generate_uncond import build_parser

    a = build_parser().parse_args([
        "--unet_ckpt", "x.msgpack", "--num", "4", "--size", "16", "16",
        "--remove_deep_conv",
    ])
    assert a.num == 4 and a.remove_deep_conv and tuple(a.size) == (16, 16)

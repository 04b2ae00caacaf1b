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


def test_generate_uncond_parser():
    from diffusion_model_tpu.cli.generate_uncond import build_parser

    a = build_parser().parse_args([
        "--unet_ckpt", "x.msgpack", "--num", "4", "--size", "16", "16",
        "--remove_deep_conv",
    ])
    assert a.num == 4 and a.remove_deep_conv and tuple(a.size) == (16, 16)

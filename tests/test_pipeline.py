"""Pipeline tests: class-count normalization, CFG sampling shapes, CSV
sampler bridge, snapshot capture, checkpoint round-trip."""
import csv
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_model_tpu.diffusion import DiffusionSchedule
from diffusion_model_tpu.models import VAE, VAEConfig, CondUNet, UNetConfig
from diffusion_model_tpu.pipeline import (
    CsvConditionSampler,
    DiffusionPipeline,
    normalize_class_counts,
    to_uint8,
)


def test_normalize_class_counts():
    assert normalize_class_counts({1: 2, 2: 0, 3: 1}) == [(1, 2), (3, 1)]
    assert normalize_class_counts((2, 5)) == [(2, 5)]
    assert normalize_class_counts([(1, 1), (3, 2)]) == [(1, 1), (3, 2)]
    with pytest.raises(ValueError):
        normalize_class_counts({1: 0})
    with pytest.raises(ValueError):
        normalize_class_counts("nope")


def test_to_uint8_clamps():
    x = np.array([[-0.5, 0.0], [0.5, 2.0]], np.float32)
    out = to_uint8(x)
    assert out.dtype == np.uint8
    assert out.tolist() == [[0, 0], [127, 255]]


@pytest.fixture(scope="module")
def tiny_pipeline():
    rng = jax.random.PRNGKey(0)
    vae = VAE(VAEConfig(base_channels=8))
    unet = CondUNet(UNetConfig(in_ch=4, time_dim=32, num_classes=3,
                               with_geom_head=True, base_ch=8,
                               remove_deep_conv=True))
    img = jnp.zeros((1, 32, 32, 3))
    vae_params = vae.init({"params": rng, "sample": rng}, img)["params"]
    z = jnp.zeros((1, 4, 4, 4))
    unet_params = unet.init(
        rng, z, jnp.ones((1,), jnp.int32), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 12)), jnp.zeros((1, 12)),
    )["params"]
    sched = DiffusionSchedule.create(6)
    return DiffusionPipeline(
        unet=unet, unet_params=unet_params, vae=vae, vae_params=vae_params,
        schedule=sched, use_data_parallel=False,
    )


def test_sample_latent_cond_classes_and_shapes(tiny_pipeline):
    imgs = tiny_pipeline.sample_latent_cond(
        {1: 2, 2: 1}, image_hw=(32, 32), to_pil=False,
        key=jax.random.PRNGKey(1),
    )
    assert imgs.shape == (3, 32, 32, 3)
    assert imgs.min() >= 0.0 and imgs.max() <= 1.0


def test_sample_latent_cond_pil_and_cond_dict(tiny_pipeline):
    pil = tiny_pipeline.sample_latent_cond(
        (2, 2), cond={2: {"cx": 0.5, "cy": 0.5, "cr": 0.2}},
        image_hw=(32, 32), key=jax.random.PRNGKey(2),
    )
    assert len(pil) == 2
    assert pil[0].size == (32, 32)


def test_sample_latent_cond_batched_chunks(tiny_pipeline):
    imgs = tiny_pipeline.sample_latent_cond(
        (1, 5), image_hw=(32, 32), to_pil=False, batch_size=2,
        key=jax.random.PRNGKey(3),
    )
    assert imgs.shape == (5, 32, 32, 3)


def test_sample_latent_cond_exact_remainder(tiny_pipeline):
    """remainder='exact' runs the short final chunk unpadded (no wasted
    scan compute); count and shapes still honor the request."""
    imgs = tiny_pipeline.sample_latent_cond(
        (1, 5), image_hw=(32, 32), to_pil=False, batch_size=2,
        key=jax.random.PRNGKey(3), remainder="exact",
    )
    assert imgs.shape == (5, 32, 32, 3)
    import pytest

    with pytest.raises(ValueError):
        tiny_pipeline.sample_latent_cond(
            (1, 2), image_hw=(32, 32), to_pil=False, batch_size=2,
            remainder="bogus",
        )


def test_sample_latent_decode_false_returns_latents(tiny_pipeline):
    z = tiny_pipeline.sample_latent(3, image_hw=(32, 32), decode=False)
    assert z.shape == (3, 4, 4, 4)


def test_snapshots_capture_before_step(tiny_pipeline):
    vals = np.zeros((1, 12), np.float32)
    mask = np.ones((1, 12), np.float32)
    zf, snaps = tiny_pipeline.sample_latent_cond_with_steps(
        1, vals, mask, snapshot_ts=[6, 3, 1], image_hw=(32, 32),
        key=jax.random.PRNGKey(4),
    )
    assert snaps.shape == (3, 1, 4, 4, 4)
    assert zf.shape == (1, 4, 4, 4)
    # t=T snapshot is the untouched initial noise: unit-ish std
    assert 0.5 < snaps[0].std() < 2.0
    # snapshots must differ across steps
    assert not np.allclose(snaps[0], snaps[2])


def test_csv_condition_sampler(tiny_pipeline, tmp_path):
    csv_path = tmp_path / "circle.csv"
    with open(csv_path, "w", newline="") as f:
        w = csv.writer(f)
        for i in range(4):
            row = [0.0] * 13
            row[5:8] = [200.0 + i, 200.0, 50.0]
            w.writerow(row)
    s = CsvConditionSampler(tiny_pipeline, class_id=2, image_hw=(32, 32))
    vals, mask = s.load_cond(str(csv_path), count=2, start=1)
    assert vals.shape == (2, 12)
    assert vals[0, 4] == pytest.approx(201.0 / 400.0)
    assert mask[0, 4] == 1.0 and mask[0, 0] == 0.0
    with pytest.raises(ValueError):
        s.load_cond(str(csv_path), count=1, start=10)
    imgs = s.sample(str(csv_path), count=2, to_pil=False,
                    key=jax.random.PRNGKey(0))
    assert imgs.shape == (2, 32, 32, 3)


@pytest.mark.heavy
def test_from_checkpoints_roundtrip(tiny_pipeline, tmp_path):
    from diffusion_model_tpu.train import save_params

    up = str(tmp_path / "unet.msgpack")
    vp = str(tmp_path / "vae.msgpack")
    save_params(up, tiny_pipeline.unet_params)
    save_params(vp, tiny_pipeline.vae_params)
    pipe2 = DiffusionPipeline.from_checkpoints(
        up, vp, tiny_pipeline.unet, tiny_pipeline.vae,
        schedule=tiny_pipeline.schedule, latent_hw=(4, 4), image_hw=(32, 32),
    )
    a = tiny_pipeline.sample_latent_cond((1, 1), image_hw=(32, 32),
                                         to_pil=False,
                                         key=jax.random.PRNGKey(7))
    b = pipe2.sample_latent_cond((1, 1), image_hw=(32, 32), to_pil=False,
                                 key=jax.random.PRNGKey(7))
    np.testing.assert_allclose(a, b, atol=1e-5)


@pytest.mark.heavy
def test_sample_cond_pixel_space(tiny_pipeline):
    """Diffuser.sample_cond parity (diff.py:165-172): class-conditional
    sampling with NO vae decode; guidance_scale=0 must not crash (the
    reference's unbound-eps bug is consciously fixed, SURVEY.md §7)."""
    y = [1, 2, 3, 1]
    out0 = tiny_pipeline.sample_cond(y, (4, 4, 4, 4), guidance_scale=0.0,
                                     key=jax.random.PRNGKey(5))
    assert out0.shape == (4, 4, 4, 4)
    assert np.isfinite(out0).all()
    # CFG path (2B batched forward) and the raw-vs-PIL surface
    out3 = tiny_pipeline.sample_cond(y, (4, 4, 4, 4), guidance_scale=3.0,
                                     key=jax.random.PRNGKey(5))
    assert not np.allclose(out0, out3)  # guidance changes the trajectory
    pil = tiny_pipeline.sample_cond([1], (1, 4, 4, 4), to_pil=False,
                                    key=jax.random.PRNGKey(6))
    assert pil.shape == (1, 4, 4, 4)
    with pytest.raises(ValueError):
        tiny_pipeline.sample_cond([1, 2], (3, 4, 4, 4))


def test_sampler_cache_thread_safe(tiny_pipeline):
    """Concurrent first-compiles for one sampler key must produce a single
    cache entry (serve.py drives the pipeline from HTTP threads)."""
    import threading

    tiny_pipeline._compiled.clear()
    fns, errs = [], []

    def hit():
        try:
            fns.append(tiny_pipeline._sampler(7.0, False, False))
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=hit) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    assert len(set(map(id, fns))) == 1

"""On-device jump-flooding EDT vs exact native EDT.

All masks share one 32x32 shape so the JFA scan compiles once per entry
point (the suite is CPU-compile-bound)."""
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_model_tpu.eval import native
from diffusion_model_tpu.ops.edt_jax import (
    batch_pair_metrics_jax,
    edt_jax,
    pair_metrics_jax,
)


def test_edt_jax_matches_exact_on_random_masks():
    rng = np.random.default_rng(0)
    for _ in range(4):
        mask = rng.random((32, 32)) < 0.05
        if not mask.any():
            mask[10, 10] = True
        ours = np.asarray(edt_jax(jnp.asarray(mask)))
        ref = native.distance_map(mask)
        # JFA+1 is near-exact; allow sub-pixel deviation on rare pixels
        assert np.abs(ours - ref).max() < 0.75
        assert np.abs(ours - ref).mean() < 0.01


def test_edt_jax_line_mask_exact():
    mask = np.zeros((32, 32), bool)
    mask[16, 4:28] = True
    ours = np.asarray(edt_jax(jnp.asarray(mask)))
    ref = native.distance_map(mask)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_edt_jax_empty_mask_sentinel():
    out = np.asarray(edt_jax(jnp.zeros((32, 32), bool)))
    assert (out > 1e4).all()


def test_pair_metrics_jax_matches_host():
    from diffusion_model_tpu.eval import compute_metrics

    rng = np.random.default_rng(1)
    gt = rng.random((32, 32)) < 0.08
    pred = rng.random((32, 32)) < 0.08
    host = compute_metrics(gt, pred, sigma=2.0)
    dev = {k: float(v) for k, v in
           pair_metrics_jax(jnp.asarray(gt), jnp.asarray(pred), 2.0).items()}
    for k in ("iou", "gt_iou", "inter", "union", "gt_area", "pred_area"):
        assert dev[k] == pytest.approx(host[k], abs=1e-5)
    # distance-based metrics: JFA near-exact
    assert dev["far_noise_ratio"] == pytest.approx(host["far_noise_ratio"],
                                                   abs=0.02)
    assert dev["gauss_recall"] == pytest.approx(host["gauss_recall"],
                                                abs=0.02)


def test_batch_pair_metrics_jax():
    gt = np.zeros((3, 32, 32), bool)
    gt[:, 8, 4:24] = True
    pred = gt.copy()
    out = batch_pair_metrics_jax(jnp.asarray(gt), jnp.asarray(pred))
    np.testing.assert_allclose(np.asarray(out["iou"]), 1.0)
    assert out["iou"].shape == (3,)

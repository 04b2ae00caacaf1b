"""Checkpoint-resume (Orbax) and profiling utilities."""
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_model_tpu.utils.profiling import StepTimer, trace


def test_step_timer_skips_first():
    t = StepTimer()
    t.tick(4)   # first tick: baseline
    t.tick(4)   # step 1 measured? (first interval skipped)
    t.tick(4)   # step 2
    s = t.summary()
    assert s["steps"] == 1  # first interval excluded
    assert s["items_per_sec"] > 0


def test_trace_noop_without_dir():
    with trace(None):
        pass  # must not raise


@pytest.mark.heavy
def test_vae_train_resume(tmp_path):
    """Interrupt after 2 epochs, resume, and check the epoch counter and
    optimizer state carry over."""
    jax.config.update("jax_platforms", "cpu")
    from diffusion_model_tpu.config import DataConfig, VAETrainConfig
    from diffusion_model_tpu.train import train_vae

    data = DataConfig(
        synthetic_root=str(tmp_path / "data"), synthetic_count=8,
        synthetic_val_count=4, image_size=(32, 32),
    )
    resume_dir = str(tmp_path / "orbax")
    base = dict(
        batch_size=4, base_channels=8, bf16=False, data=data,
        save_dir=str(tmp_path / "vae"), patience=10, seed=0,
        resume_dir=resume_dir,
    )
    r1 = train_vae(VAETrainConfig(epochs=2, **base))
    assert len(r1["train_losses"]) == 2

    r2 = train_vae(VAETrainConfig(epochs=4, **base),
                   out_dir=r1["out_dir"])
    # resumed from epoch 3 → only 2 more epochs of history
    assert len(r2["train_losses"]) == 2
    assert int(r2["final_state"].step) > int(r1["final_state"].step)


def test_orbax_manager_roundtrip(tmp_path):
    from diffusion_model_tpu.train import CheckpointManager

    m = CheckpointManager(str(tmp_path / "ck"), max_to_keep=2)
    state = {"w": jnp.arange(4, dtype=jnp.float32), "n": jnp.asarray(3)}
    m.save(1, {"state": state, "epoch": 1}, force=True)
    m.wait()
    assert m.latest_step() == 1
    out = m.restore({"state": {"w": jnp.zeros(4), "n": jnp.asarray(0)},
                     "epoch": 0})
    np.testing.assert_allclose(np.asarray(out["state"]["w"]),
                               [0, 1, 2, 3])
    assert int(out["epoch"]) == 1
    m.close()

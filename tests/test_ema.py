"""EMA parameter tracking (train/ema.py): update math, trainer
integration, checkpoint artifact."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from diffusion_model_tpu.train import EMATrainState, make_train_state


def _state(decay):
    params = {"w": jnp.ones((4,)), "b": jnp.zeros((2,))}
    return make_train_state(lambda p, x: x, params, optax.sgd(0.1),
                            ema_decay=decay)


def test_make_train_state_plain_when_disabled():
    from flax.training.train_state import TrainState

    s = _state(0.0)
    assert type(s) is TrainState  # structure unchanged for old checkpoints
    s2 = _state(0.9)
    assert isinstance(s2, EMATrainState)
    np.testing.assert_array_equal(np.asarray(s2.ema_params["w"]),
                                  np.ones((4,)))


def test_ema_update_math():
    s = _state(0.9)
    grads = {"w": jnp.ones((4,)), "b": jnp.ones((2,))}
    s1 = s.apply_gradients(grads=grads)
    # sgd(0.1): w 1 -> 0.9; ema_w = 0.9*1 + 0.1*0.9 = 0.99
    np.testing.assert_allclose(np.asarray(s1.params["w"]), 0.9, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s1.ema_params["w"]), 0.99,
                               rtol=1e-6)
    s2 = s1.apply_gradients(grads=grads)
    # w 0.9 -> 0.8; ema = 0.9*0.99 + 0.1*0.8 = 0.971
    np.testing.assert_allclose(np.asarray(s2.ema_params["w"]), 0.971,
                               rtol=1e-6)


def test_ema_inside_jitted_scan():
    """The update must compile into a scan body (the epoch-fused path)."""
    s = _state(0.5)

    @jax.jit
    def run(state):
        def body(st, _):
            return st.apply_gradients(
                grads={"w": jnp.ones((4,)), "b": jnp.zeros((2,))}), None
        return jax.lax.scan(body, state, None, length=3)[0]

    out = run(s)
    # w: 1 -> .9 -> .8 -> .7; ema: 1->.95->.875->.7875
    np.testing.assert_allclose(np.asarray(out.params["w"]), 0.7, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out.ema_params["w"]), 0.7875,
                               rtol=1e-5)


@pytest.mark.heavy
def test_trainer_ema_artifact(tmp_path, monkeypatch):
    """ema_decay>0 through the production trainer writes
    trained_para_ema.msgpack and the EMA tree lags the raw params."""
    import os

    monkeypatch.chdir(tmp_path)
    from diffusion_model_tpu.config import DataConfig, LatentTrainConfig
    from diffusion_model_tpu.models import VAE, VAEConfig
    from diffusion_model_tpu.train import train_latent_cond

    cfg = LatentTrainConfig(
        epochs=2, batch_size=8, num_timesteps=4, base_ch=8, time_dim=32,
        vae_base_channels=8, bf16=False, val_interval=5, ckpt_interval=1,
        post_train_samples=0, ema_decay=0.9,
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
    assert os.path.exists(res["ema_ckpt"])
    st = res["final_state"]
    diffs = jax.tree_util.tree_map(
        lambda p, e: float(jnp.max(jnp.abs(p - e))), st.params,
        st.ema_params)
    assert max(jax.tree_util.tree_leaves(diffs)) > 0.0

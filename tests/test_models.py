"""Model shape/behavior tests: VAE round-trip geometry, U-Net odd-size path,
conditioning plumbing, geometry head."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_model_tpu.models import (
    VAE,
    VAEConfig,
    make_unet,
    make_unet_cond_with_geom_head,
)


@pytest.fixture(scope="module")
def vae_small():
    cfg = VAEConfig(base_channels=8)
    model = VAE(cfg)
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((2, 64, 64, 3))
    params = model.init({"params": key, "sample": key}, x)
    return model, params


def test_vae_shapes(vae_small):
    model, params = vae_small
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3))
    recon, z, loss, aux = model.apply(
        params, x, rngs={"sample": jax.random.PRNGKey(2)}
    )
    assert z.shape == (2, 8, 8, 4)  # ÷8 spatial, 4 channels
    assert recon.shape == x.shape
    assert np.isfinite(float(loss))
    assert float(recon.min()) >= 0.0 and float(recon.max()) <= 1.0  # sigmoid
    assert set(aux) == {"recon_mse", "kl"}


def test_vae_latent_scale_factor(vae_small):
    model, params = vae_small
    x = jnp.full((1, 64, 64, 3), 0.5)
    z, kl = model.apply(
        params, x, method=VAE.encode, rngs={"sample": jax.random.PRNGKey(0)}
    )
    mu, logvar = model.apply(params, x, method=VAE.encode_stats)
    # z should be near mu * 0.18215 (std is small at init? not guaranteed) —
    # instead verify determinism of the stats path and the clamp contract
    assert mu.shape == z.shape
    assert float(logvar.max()) <= 20.0 and float(logvar.min()) >= -30.0
    assert float(kl) >= 0.0


@pytest.fixture(scope="module")
def unet_geom():
    """Model + params + ONE jitted B=2 apply reused by every test in this
    module (the un-jitted per-op dispatch was the suite's slowest setup)."""
    model = make_unet_cond_with_geom_head(base_ch=16, time_dim=64)
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 28, 28, 4))
    t = jnp.array([1])
    y = jnp.array([1])
    params = model.init(key, x, t, y, jnp.zeros((1, 12)), jnp.zeros((1, 12)))
    fwd = jax.jit(model.apply)
    return model, params, fwd


def test_unet_geom_shapes_28(unet_geom):
    """28 → 14 → 7 → 3 → (pad back) 7 → 14 → 28: the odd-size contract."""
    model, params, fwd = unet_geom
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 28, 28, 4))
    t = jnp.array([500, 17])
    y = jnp.array([1, 2])
    vals = jax.random.uniform(jax.random.PRNGKey(2), (2, 12))
    mask = jnp.ones((2, 12))
    eps, geom = fwd(params, x, t, y, vals, mask)
    assert eps.shape == (2, 28, 28, 4)
    assert geom.shape == (2, 12)
    assert np.isfinite(np.asarray(eps)).all()
    assert np.isfinite(np.asarray(geom)).all()


def test_unet_conditioning_changes_output(unet_geom):
    """Class id and numeric conditioning must both steer eps; batched pairs
    reuse the fixture's single compiled forward."""
    model, params, fwd = unet_geom
    x = jnp.tile(jax.random.normal(jax.random.PRNGKey(1), (1, 28, 28, 4)),
                 (2, 1, 1, 1))
    t = jnp.array([100, 100])
    mask = jnp.ones((2, 12))
    # row 0 vs row 1: same x/t/vals, different class id
    eps_cls, _ = fwd(params, x, t, jnp.array([1, 2]),
                     jnp.full((2, 12), 0.5), mask)
    assert not np.allclose(np.asarray(eps_cls[0]), np.asarray(eps_cls[1]))
    # row 0 vs row 1: same class id, different cond values
    eps_val, _ = fwd(params, x, t, jnp.array([1, 1]),
                     jnp.stack([jnp.full((12,), 0.5),
                                jnp.full((12,), 0.05)]), mask)
    assert not np.allclose(np.asarray(eps_val[0]), np.asarray(eps_val[1]))


@pytest.mark.heavy
def test_unet_uncond_variant():
    model = make_unet(in_ch=3, num_classes=None, base_ch=16, time_dim=64,
                      remove_deep_conv=True)
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 16, 16, 3))
    t = jnp.array([5])
    params = model.init(key, x, t)
    eps = model.apply(params, x, t)
    assert eps.shape == (1, 16, 16, 3)


def test_time_embedding_structure():
    from diffusion_model_tpu.models import sinusoidal_time_embedding

    emb = sinusoidal_time_embedding(jnp.array([0.0]), 8)
    # sin(0)=0 for first half, cos(0)=1 for second half
    np.testing.assert_allclose(np.asarray(emb[0, :4]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(emb[0, 4:]), 1.0, atol=1e-6)
    # distinct t → distinct embeddings
    e2 = sinusoidal_time_embedding(jnp.array([1.0, 2.0]), 64)
    assert not np.allclose(np.asarray(e2[0]), np.asarray(e2[1]))

"""Schedule math: closed-form endpoints, q-sample statistics, posterior step.

Pins the cross-layer contracts from SURVEY.md §1: linear betas
linspace(1e-4, 0.02, T), 1-indexed t, alpha_bar_prev clamped at t=1.
"""
import jax
import jax.numpy as jnp
import numpy as np

from diffusion_model_tpu.diffusion import (
    DiffusionSchedule,
    ddpm_posterior_step,
    q_sample,
    sample_loop,
)


def test_schedule_endpoints():
    s = DiffusionSchedule.create(num_timesteps=1000)
    assert s.betas.shape == (1000,)
    np.testing.assert_allclose(s.betas[0], 1e-4, rtol=1e-6)
    np.testing.assert_allclose(s.betas[-1], 0.02, rtol=1e-6)
    np.testing.assert_allclose(s.alphas, 1.0 - s.betas, rtol=1e-6)
    np.testing.assert_allclose(
        s.alpha_bars, np.cumprod(1.0 - s.betas.astype(np.float64)), rtol=1e-4
    )
    # monotone decreasing
    assert np.all(np.diff(s.alpha_bars) < 0)


def test_one_indexed_lookup():
    s = DiffusionSchedule.create(num_timesteps=10)
    t = jnp.array([1, 5, 10])
    np.testing.assert_allclose(np.asarray(s.alpha(t)), s.alphas[[0, 4, 9]])
    np.testing.assert_allclose(np.asarray(s.alpha_bar(t)), s.alpha_bars[[0, 4, 9]])
    # t=1 must clamp to index 0, not wrap to the end (reference bug diff.py:39)
    ab_prev = np.asarray(s.alpha_bar_prev(t))
    np.testing.assert_allclose(ab_prev, s.alpha_bars[[0, 3, 8]])


def test_q_sample_statistics():
    s = DiffusionSchedule.create(num_timesteps=100)
    key = jax.random.PRNGKey(0)
    x0 = jnp.ones((4, 8, 8, 2)) * 3.0
    noise = jax.random.normal(key, x0.shape)
    t = jnp.array([50, 50, 50, 50])
    xt = q_sample(s, x0, t, noise)
    ab = s.alpha_bars[49]
    expected_mean = np.sqrt(ab) * 3.0
    assert abs(float(xt.mean()) - expected_mean) < 0.1
    # exact reconstruction given the noise
    rec = (xt - np.sqrt(1 - ab) * noise) / np.sqrt(ab)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x0), atol=1e-4)


def test_posterior_step_no_noise_at_t1():
    s = DiffusionSchedule.create(num_timesteps=10)
    x = jnp.ones((2, 4, 4, 1))
    eps = jnp.zeros_like(x)
    noise = jnp.ones_like(x) * 100.0  # would blow up if not masked
    t = jnp.array([1, 1])
    out = ddpm_posterior_step(s, x, t, eps, noise)
    expected = 1.0 / np.sqrt(s.alphas[0])
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5)


def test_posterior_step_matches_reference_formula():
    s = DiffusionSchedule.create(num_timesteps=50)
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (3, 4, 4, 2))
    eps = jax.random.normal(jax.random.fold_in(key, 1), x.shape)
    noise = jax.random.normal(jax.random.fold_in(key, 2), x.shape)
    t = jnp.array([30, 2, 50])
    out = np.asarray(ddpm_posterior_step(s, x, t, eps, noise))
    for i, ti in enumerate([30, 2, 50]):
        a = s.alphas[ti - 1]
        ab = s.alpha_bars[ti - 1]
        ab_prev = s.alpha_bars[max(ti - 2, 0)]
        mu = (np.asarray(x[i]) - ((1 - a) / np.sqrt(1 - ab)) * np.asarray(eps[i])) / np.sqrt(a)
        std = np.sqrt((1 - a) * (1 - ab_prev) / (1 - ab))
        expected = mu + np.asarray(noise[i]) * std
        np.testing.assert_allclose(out[i], expected, rtol=1e-4, atol=1e-5)


def test_sample_loop_perfect_model_recovers_signal():
    """With an oracle eps-model, the reverse loop must walk back to ~x0."""
    T = 64
    s = DiffusionSchedule.create(num_timesteps=T)
    x0 = jnp.full((2, 4, 4, 1), 0.5)
    key = jax.random.PRNGKey(0)

    def eps_fn(x, t, y, cv, cm):
        # oracle: eps implied by x_t and the true x0
        ab = jnp.asarray(s.alpha_bars)[t - 1].reshape(-1, 1, 1, 1)
        return (x - jnp.sqrt(ab) * x0) / jnp.sqrt(1 - ab)

    x_init = q_sample(
        s, x0, jnp.full((2,), T, jnp.int32),
        jax.random.normal(key, x0.shape),
    )
    out = sample_loop(s, eps_fn, x_init, jax.random.fold_in(key, 7))
    assert abs(float(out.mean()) - 0.5) < 0.15


def test_cfg_guidance_zero_is_plain_conditional():
    """guidance_scale=0 with a label must still produce a defined eps
    (fixes the reference's unbound-eps bug, diff.py:146-156)."""
    T = 4
    s = DiffusionSchedule.create(num_timesteps=T)
    calls = []

    def eps_fn(x, t, y, cv, cm):
        calls.append(x.shape[0])
        return jnp.zeros_like(x)

    x = jnp.ones((2, 4, 4, 1))
    out = sample_loop(
        s, eps_fn, x, jax.random.PRNGKey(0),
        y=jnp.array([1, 2]), guidance_scale=0.0,
    )
    assert out.shape == x.shape
    assert all(b == 2 for b in calls)  # single forward, not 2B


def test_cfg_batched_forward():
    T = 2
    s = DiffusionSchedule.create(num_timesteps=T)
    batch_sizes = []

    def eps_fn(x, t, y, cv, cm):
        batch_sizes.append(x.shape[0])
        # uncond half (y==0) predicts 0; cond half predicts 1
        return jnp.where((y > 0).reshape(-1, 1, 1, 1),
                         jnp.ones_like(x), jnp.zeros_like(x))

    x = jnp.zeros((3, 2, 2, 1))
    out = sample_loop(
        s, eps_fn, x, jax.random.PRNGKey(0),
        y=jnp.array([1, 2, 3]), guidance_scale=3.0,
    )
    assert out.shape == x.shape
    assert all(b == 6 for b in batch_sizes)  # 2B batched CFG


def test_sample_loop_unroll_bit_identical():
    """unroll is a pure lax.scan scheduling knob: any factor (including
    ones that do not divide T) must reproduce the default bit-for-bit."""
    T = 10
    s = DiffusionSchedule.create(num_timesteps=T)

    def eps_fn(x, t, y, cv, cm):
        ab = s.alpha_bar(t).reshape((-1,) + (1,) * (x.ndim - 1))
        return x * jnp.sqrt(1.0 - ab) / (ab * 4.0 + (1.0 - ab))

    x = jax.random.normal(jax.random.PRNGKey(7), (2, 4, 4, 2))
    base = sample_loop(s, eps_fn, x, jax.random.PRNGKey(1),
                       y=jnp.array([1, 2]), guidance_scale=3.0)
    for u in (2, 3, 4):
        out = sample_loop(s, eps_fn, x, jax.random.PRNGKey(1),
                          y=jnp.array([1, 2]), guidance_scale=3.0, unroll=u)
        np.testing.assert_array_equal(np.asarray(base), np.asarray(out))

"""Time-parallel (Picard sliding-window) DDIM sampler: equivalence to the
sequential sampler, guaranteed progress, sweep-count efficiency, and
mesh-sharded execution of the window batch."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_model_tpu.diffusion import (
    DiffusionSchedule,
    q_sample,
    sample_loop_ddim,
    sample_loop_ddim_parallel,
)


def _oracle(sched, x0):
    def eps_fn(x, t, y, cv, cm):
        ab = jnp.asarray(sched.alpha_bars)[t - 1].reshape(
            (-1,) + (1,) * (x.ndim - 1))
        return (x - jnp.sqrt(ab) * x0) / jnp.sqrt(1 - ab)

    return eps_fn


def _contractive(sched):
    # nonlinear, state-dependent model so Picard has real work to do
    def eps_fn(x, t, y, cv, cm):
        return 0.3 * jnp.tanh(x) + 0.05 * x

    return eps_fn


def test_parallel_matches_sequential_ddim():
    sched = DiffusionSchedule.create(200)
    eps_fn = _contractive(sched)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 2))
    seq = sample_loop_ddim(sched, eps_fn, x, jax.random.PRNGKey(1),
                           num_inference_steps=40)
    par, sweeps = sample_loop_ddim_parallel(
        sched, eps_fn, x, num_inference_steps=40, window=8, tol=1e-4)
    np.testing.assert_allclose(np.asarray(par), np.asarray(seq),
                               atol=5e-3, rtol=0)
    assert int(sweeps) <= 40  # never slower than sequential


def test_parallel_tol_zero_is_exact_sequential():
    """tol=0 accepts a position only when its state is bit-unchanged under
    a sweep — a true Picard fixed point, i.e. the exact trajectory (by
    induction over the accepted prefix). The result must match sequential
    DDIM to float tolerance; sweeps can undershoot S when the tail reaches
    the fixed point early, but never exceed it."""
    sched = DiffusionSchedule.create(100)
    eps_fn = _contractive(sched)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 6, 6, 1))
    seq = sample_loop_ddim(sched, eps_fn, x, jax.random.PRNGKey(1),
                           num_inference_steps=12)
    par, sweeps = sample_loop_ddim_parallel(
        sched, eps_fn, x, num_inference_steps=12, window=4, tol=0.0)
    assert int(sweeps) <= 12
    # 5e-6: the parallel map uses the algebraically-equal closed-form
    # coefficients (c_x·x + c_e·eps), which round differently from
    # ddim_step's x0_pred/dir_xt order of operations
    np.testing.assert_allclose(np.asarray(par), np.asarray(seq),
                               atol=5e-6, rtol=0)


def test_parallel_saves_sweeps():
    """On a smooth model the frontier should advance several positions per
    sweep — the whole point of time-parallelism."""
    sched = DiffusionSchedule.create(1000)
    eps_fn = _contractive(sched)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 8, 2))
    S = 48
    _, sweeps = sample_loop_ddim_parallel(
        sched, eps_fn, x, num_inference_steps=S, window=12, tol=1e-3)
    assert int(sweeps) <= S // 2, int(sweeps)


def test_parallel_oracle_recovers_signal():
    T = 100
    sched = DiffusionSchedule.create(T)
    # (1, ...) so the oracle broadcasts over the sampler's window·B rows
    x0 = jnp.full((1, 4, 4, 1), 0.5)
    eps_fn = _oracle(sched, x0)
    key = jax.random.PRNGKey(0)
    x_init = q_sample(sched, jnp.broadcast_to(x0, (2, 4, 4, 1)),
                      jnp.full((2,), T, jnp.int32),
                      jax.random.normal(key, (2, 4, 4, 1)))
    out, _ = sample_loop_ddim_parallel(sched, eps_fn, x_init,
                                       num_inference_steps=10, window=5,
                                       tol=1e-3)
    np.testing.assert_allclose(np.asarray(out), 0.5, atol=2e-2)


def test_parallel_cfg_and_conditioning_plumbed():
    sched = DiffusionSchedule.create(50)

    def eps_fn(x, t, y, cv, cm):
        scale = jnp.where(y.reshape((-1,) + (1,) * (x.ndim - 1)) > 0,
                          0.2, 0.1)
        return scale * x + 0.01 * cv.sum(axis=-1).reshape(
            (-1,) + (1,) * (x.ndim - 1))

    x = jax.random.normal(jax.random.PRNGKey(4), (2, 4, 4, 1))
    y = jnp.ones((2,), jnp.int32)
    cv = jnp.ones((2, 12)) * 0.3
    cm = jnp.ones((2, 12))
    seq = sample_loop_ddim(sched, eps_fn, x, jax.random.PRNGKey(1),
                           num_inference_steps=10, y=y, cond_vals=cv,
                           cond_mask=cm, guidance_scale=3.0)
    par, _ = sample_loop_ddim_parallel(
        sched, eps_fn, x, num_inference_steps=10, window=4, tol=1e-5,
        y=y, cond_vals=cv, cond_mask=cm, guidance_scale=3.0)
    np.testing.assert_allclose(np.asarray(par), np.asarray(seq),
                               atol=1e-3, rtol=0)


def test_parallel_tol_frame_x0_bounds_end_to_end_error():
    """The round-4 production-scale cert failed with the raw per-position
    criterion (tol_frame='x'): an accepted error at a high-noise position
    is amplified by 1/sqrt(ᾱ_p) — ~150× on a linear T=1000 schedule — so
    tol=1e-3 allowed full-range uint8 deltas on ~0.2% of pixels
    (quality_r2/parallel_dev_cert.json). 'x0' scales the acceptance test
    by that amplification, bounding the END-TO-END deviation by O(S·tol)
    regardless of the schedule."""
    sched = DiffusionSchedule.create(1000)
    eps_fn = _contractive(sched)
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 8, 8, 2))
    S, tol = 40, 1e-3
    seq = sample_loop_ddim(sched, eps_fn, x, jax.random.PRNGKey(1),
                           num_inference_steps=S)
    par_x0, sw_x0 = sample_loop_ddim_parallel(
        sched, eps_fn, x, num_inference_steps=S, window=10, tol=tol,
        tol_frame="x0")
    dev_x0 = float(np.abs(np.asarray(par_x0) - np.asarray(seq)).max())
    assert dev_x0 <= S * tol, dev_x0
    assert int(sw_x0) <= S
    # the raw frame accepts no later (its criterion is strictly looser),
    # and stays available for speed-over-accuracy callers
    _, sw_x = sample_loop_ddim_parallel(
        sched, eps_fn, x, num_inference_steps=S, window=10, tol=tol,
        tol_frame="x")
    assert int(sw_x) <= int(sw_x0)
    with pytest.raises(ValueError):
        sample_loop_ddim_parallel(sched, eps_fn, x, num_inference_steps=S,
                                  tol_frame="bogus")


@pytest.mark.multidevice
def test_parallel_window_sharded_over_mesh():
    """B=1 request, window=8 sharded over the 8-device CPU mesh: the model
    batch axis (window·B) distributes across chips that plain batch-DP
    would leave idle."""
    from diffusion_model_tpu.parallel import make_mesh

    if jax.device_count() < 8:
        pytest.skip("needs the 8-device CPU mesh")
    mesh = make_mesh(("data",))
    sched = DiffusionSchedule.create(200)
    eps_fn = _contractive(sched)
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 8, 8, 2))

    seq = sample_loop_ddim(sched, eps_fn, x, jax.random.PRNGKey(1),
                           num_inference_steps=24)

    fn = jax.jit(lambda x_: sample_loop_ddim_parallel(
        sched, eps_fn, x_, num_inference_steps=24, window=8, tol=1e-4,
        mesh=mesh, shard_axis="data"))
    par, sweeps = fn(x)
    np.testing.assert_allclose(np.asarray(par), np.asarray(seq),
                               atol=5e-3, rtol=0)
    assert int(sweeps) <= 24

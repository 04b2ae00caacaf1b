"""Progressive guided distillation: grid algebra, exact-teacher target
recovery, trailing-grid consistency, end-to-end halving on a tiny model."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_model_tpu.diffusion import DiffusionSchedule
from diffusion_model_tpu.diffusion.sampling import (
    sample_loop_ddim,
    sampler_timesteps_np,
)
from diffusion_model_tpu.models import CondUNet, UNetConfig
from diffusion_model_tpu.train import (
    distill_grid,
    implied_x0_target,
    make_distill_step,
    progressive_distill,
)
from diffusion_model_tpu.train.distill import stage_tables


def test_distill_grid_properties():
    g = distill_grid(1000, 8)
    assert g.shape == (17,)
    assert g[0] == 1000 and g[-1] == 0
    assert (np.diff(g) < 0).all()
    # student grid = trailing sampler grid (the student must be SAMPLED on
    # the grid it was trained on)
    sched = DiffusionSchedule.create(1000)
    trailing = sampler_timesteps_np(sched, 8, "trailing")
    np.testing.assert_array_equal(g[0::2][:8], trailing)
    with pytest.raises(ValueError):
        distill_grid(10, 8)  # 2S > T


def test_implied_target_terminal_step_is_x_n():
    """At the terminal jump (s_n = 0, a_n = 1) the implied x0 IS x_n."""
    x_t = jnp.ones((2, 4, 4, 1)) * 3.0
    x_n = jnp.ones((2, 4, 4, 1)) * 0.5
    out = implied_x0_target(x_t, x_n, jnp.asarray(0.9), jnp.asarray(0.436),
                            jnp.asarray(1.0), jnp.asarray(0.0))
    np.testing.assert_allclose(np.asarray(out), 0.5, atol=1e-6)


def _tiny_student(key, T_dim=32):
    unet = CondUNet(UNetConfig(in_ch=2, time_dim=T_dim, num_classes=3,
                               geom_dim=12, with_geom_head=True, base_ch=8,
                               remove_deep_conv=True))
    params = unet.init(key, jnp.zeros((2, 8, 8, 2)),
                       jnp.ones((2,), jnp.int32), jnp.zeros((2,), jnp.int32),
                       jnp.zeros((2, 12)), jnp.zeros((2, 12)))["params"]
    return unet, params


def test_exact_teacher_gives_x0_as_target():
    """With an oracle teacher (exact eps for the known z0 batch) the
    implied one-step target must equal the true data x0 — the core
    algebraic identity of progressive distillation."""
    T = 16
    sched = DiffusionSchedule.create(T)
    key = jax.random.PRNGKey(0)
    unet, params = _tiny_student(key)

    n = 8
    z0 = jax.random.normal(jax.random.fold_in(key, 1), (n, 8, 8, 2))
    data = {
        "z0": z0,
        "y": jnp.ones((n,), jnp.int32),
        "vals": jnp.zeros((n, 12)),
        "mask": jnp.zeros((n, 12)),
    }

    def oracle_apply(tvars, x, t, y, vals, mask):
        # exact eps* for x drawn from q(x_t | z0): both CFG halves see the
        # duplicated z0, so the guided mix equals the exact eps too
        del tvars, vals, mask
        B = x.shape[0]
        z = jnp.concatenate([z0_batch, z0_batch], axis=0)[:B]
        ab = sched.alpha_bar(t).reshape(-1, 1, 1, 1)
        return ((x - jnp.sqrt(ab) * z) / jnp.sqrt(1.0 - ab), None)

    idx = jnp.arange(n, dtype=jnp.int32)
    z0_batch = jnp.take(z0, idx, axis=0)
    step = make_distill_step(unet, oracle_apply, None, sched,
                             guidance_w=3.0, debug_targets=True)
    tables, n_steps = stage_tables(sched, 4, pad_to=6)  # exercise padding
    import optax
    from flax.training import train_state
    state = train_state.TrainState.create(
        apply_fn=None, params=params, tx=optax.adam(1e-4))
    _, aux = step(state, params, None, data, idx, jax.random.PRNGKey(2),
                  tables, jnp.asarray(n_steps, jnp.int32))
    np.testing.assert_allclose(np.asarray(aux["x0_tgt"]),
                               np.asarray(aux["z0"]), atol=5e-4)


def test_preencoded_moments_path():
    """The z_mu/z_std data path (round-4 host-OOM fix: posterior moments
    pre-encoded once, reparameterized draw inside the step). With
    z_std=0 the draw IS z_mu, so the oracle-teacher identity must hold
    exactly as in the data["z0"] path; with z_std>0 the draw must
    actually perturb x0_tgt (the eps stream is live)."""
    T = 16
    sched = DiffusionSchedule.create(T)
    key = jax.random.PRNGKey(0)
    unet, params = _tiny_student(key)

    n = 8
    z0 = jax.random.normal(jax.random.fold_in(key, 1), (n, 8, 8, 2))

    def oracle_apply(tvars, x, t, y, vals, mask):
        del tvars, vals, mask
        B = x.shape[0]
        z = jnp.concatenate([z0, z0], axis=0)[:B]
        ab = sched.alpha_bar(t).reshape(-1, 1, 1, 1)
        return ((x - jnp.sqrt(ab) * z) / jnp.sqrt(1.0 - ab), None)

    base = {
        "y": jnp.ones((n,), jnp.int32),
        "vals": jnp.zeros((n, 12)),
        "mask": jnp.zeros((n, 12)),
    }
    idx = jnp.arange(n, dtype=jnp.int32)
    step = make_distill_step(unet, oracle_apply, None, sched,
                             guidance_w=3.0, debug_targets=True)
    tables, n_steps = stage_tables(sched, 4, pad_to=6)
    import optax
    from flax.training import train_state

    def fresh_state():
        # the step donates the state; each call needs its own buffers
        return train_state.TrainState.create(
            apply_fn=None,
            params=jax.tree_util.tree_map(jnp.copy, params),
            tx=optax.adam(1e-4))

    data0 = dict(base, z_mu=z0, z_std=jnp.zeros_like(z0))
    _, aux = step(fresh_state(), params, None, data0, idx,
                  jax.random.PRNGKey(2), tables,
                  jnp.asarray(n_steps, jnp.int32))
    np.testing.assert_allclose(np.asarray(aux["z0"]), np.asarray(z0),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(aux["x0_tgt"]),
                               np.asarray(aux["z0"]), atol=5e-4)

    data1 = dict(base, z_mu=z0, z_std=0.1 * jnp.ones_like(z0))
    _, aux1 = step(fresh_state(), params, None, data1, idx,
                   jax.random.PRNGKey(2), tables,
                   jnp.asarray(n_steps, jnp.int32))
    spread = float(jnp.abs(aux1["z0"] - z0).mean())
    assert 0.01 < spread < 0.5  # a real N(0, 0.1²) perturbation


def test_fold_step_target_is_guided_mix():
    """The guidance-fold stage regresses the student onto
    ε_u + w·(ε_c − ε_u) in ε-space at matched t (Meng et al. Alg. 1 stage
    one) — pinned with a teacher whose ε depends only on the label."""
    from diffusion_model_tpu.train.distill import make_fold_step

    T = 16
    sched = DiffusionSchedule.create(T)
    key = jax.random.PRNGKey(0)
    unet, params = _tiny_student(key)

    def teacher_apply(tvars, x, t, y, vals, mask):
        del tvars, vals, mask
        e = jnp.where(y.reshape(-1, 1, 1, 1) > 0,
                      jnp.ones_like(x), -jnp.ones_like(x))
        return (e, None)

    n, w = 8, 2.5
    data = {
        "z_mu": jnp.zeros((n, 8, 8, 2)),
        "z_std": jnp.ones((n, 8, 8, 2)),
        "y": jnp.ones((n,), jnp.int32),
        "vals": jnp.zeros((n, 12)),
        "mask": jnp.zeros((n, 12)),
    }
    import optax
    from flax.training import train_state
    step = make_fold_step(unet, teacher_apply, None, sched, guidance_w=w,
                          debug_targets=True)
    state = train_state.TrainState.create(
        apply_fn=None, params=params, tx=optax.adam(1e-4))
    _, aux = step(state, params, None, data,
                  jnp.arange(n, dtype=jnp.int32), jax.random.PRNGKey(2))
    # e_u = -1 (label nulled), e_c = +1 → target = -1 + w·2 everywhere
    np.testing.assert_allclose(np.asarray(aux["eps_tgt"]), -1.0 + 2 * w,
                               atol=1e-6)
    assert 1 <= int(aux["t"].min()) and int(aux["t"].max()) <= T


def test_distill_x0_clip_bounds_target():
    """x0_clip caps the implied-x0 target: with a wildly miscalibrated
    teacher the unclipped target blows past the latent range, the clipped
    one cannot (the round-4 stage-1 failure mode, module docstring)."""
    T = 1000
    sched = DiffusionSchedule.create(T)
    key = jax.random.PRNGKey(0)
    unet, params = _tiny_student(key)
    n = 4
    data = {
        "z0": 0.3 * jax.random.normal(jax.random.fold_in(key, 1),
                                      (n, 8, 8, 2)),
        "y": jnp.ones((n,), jnp.int32),
        "vals": jnp.zeros((n, 12)),
        "mask": jnp.zeros((n, 12)),
    }

    def bad_teacher(tvars, x, t, y, vals, mask):
        del tvars, vals, mask  # ~0.3 off a calibrated ε at every t
        return (0.7 * x + 0.3, None)

    import optax
    from flax.training import train_state
    tables, n_steps = stage_tables(sched, 8)
    for clip, bound in ((0.0, None), (4.0, 4.0)):
        step = make_distill_step(unet, bad_teacher, None, sched,
                                 guidance_w=0.0, debug_targets=True,
                                 x0_clip=clip)
        state = train_state.TrainState.create(
            apply_fn=None,
            params=jax.tree_util.tree_map(jnp.copy, params),
            tx=optax.adam(1e-4))
        _, aux = step(state, params, None, data,
                      jnp.arange(n, dtype=jnp.int32), jax.random.PRNGKey(3),
                      tables, jnp.asarray(n_steps, jnp.int32))
        m = float(jnp.abs(aux["x0_tgt"]).max())
        if bound is None:
            unclipped_max = m
        else:
            assert m <= bound + 1e-5
    assert unclipped_max > 4.0  # the probe scenario really does blow up


@pytest.mark.heavy
def test_progressive_distill_tiny_end_to_end():
    """Full halving run (4 → 2) on a tiny v-teacher; the distilled student
    must sample finitely on its trailing grid with guidance baked in."""
    T = 16
    sched = DiffusionSchedule.create(T)
    key = jax.random.PRNGKey(0)
    unet, params = _tiny_student(key)

    n = 16
    z0 = 0.3 * jax.random.normal(jax.random.fold_in(key, 1), (n, 8, 8, 2))
    data = {
        "z0": z0,
        "y": jnp.asarray(np.resize([1, 2, 3], n), jnp.int32),
        "vals": jnp.zeros((n, 12)),
        "mask": jnp.zeros((n, 12)),
    }
    final, logs = progressive_distill(
        unet, params, None, None, sched, data,
        start_steps=4, min_steps=2, steps_per_stage=6, batch_size=8,
        lr=1e-4, guidance_w=2.0, teacher_prediction_type="epsilon",
        seed=0,
    )
    # stage 0 = the ε-space guidance fold, then the halving stages
    assert [l["steps"] for l in logs] == [0, 4, 2]
    assert all(np.isfinite(l["losses"]).all() for l in logs)

    # sample the distilled student: v-model, trailing grid, guidance OFF
    def eps_fn(x, t, y, cv, cm):
        out = unet.apply({"params": final}, x, t, y, cv, cm)
        v = out[0] if isinstance(out, tuple) else out
        from diffusion_model_tpu.diffusion.sampling import v_to_eps
        return v_to_eps(sched, x, t, v)

    x = jax.random.normal(jax.random.PRNGKey(9), (2, 8, 8, 2))
    out = sample_loop_ddim(sched, eps_fn, x, jax.random.PRNGKey(3),
                           num_inference_steps=2,
                           timestep_spacing="trailing",
                           y=jnp.asarray([1, 2], jnp.int32),
                           guidance_scale=0.0)
    assert np.isfinite(np.asarray(out)).all()

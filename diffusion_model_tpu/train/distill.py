"""Progressive guided distillation: N-step sampling quality in N/2 steps,
iterated down to single-digit step counts.

Beyond-reference capability (the reference has only the 1000-step DDPM
loop, /root/reference/diff.py:326-344). Two papers compose here:

- **Progressive distillation** (Salimans & Ho 2022, arXiv:2202.00512): a
  student initialized from the teacher learns, at every step of ITS grid,
  to land where TWO deterministic DDIM teacher steps land. Each stage
  halves the step count; repeating reaches 4-8 step samplers.
- **Guided distillation** (Meng et al. 2023, arXiv:2210.03142): the
  teacher the student matches is the classifier-free-GUIDED model
  ``ε_u + w·(ε_c − ε_u)``, so the student folds the guidance weight into
  its weights — every student forward replaces a 2B-row CFG forward.
  Combined with step halving this is a multiplicative speedup:
  1000-step CFG DDPM = 2000 net evals; an 8-step student = 8.

  Guidance folding is its OWN stage (Meng et al. Algorithm 1, stage one)
  in **ε-space at matched t** — NOT fused into the first halving stage.
  The round-4 fused attempt failed measurably: the two-step implied-x0
  target under w=3 has abs-mean ~13 / max ~75 at t=1000 (true latent x0
  std 0.36) because the guided ε̂ is miscalibrated at high noise and
  (x_t − s·ε̂)/a amplifies that by 1/a ≈ 156; the stage never converged
  (loss tail 0.40) and every later stage faithfully distilled the broken
  teacher into blank images. ε-space fold targets stay O(1) at every t
  and the student starts FROM the teacher weights, so it only learns the
  small w·(ε_c − ε_u) correction. Halving stages then run at w=0 against
  the folded, calibrated teacher, with the implied-x0 target clipped
  (``x0_clip``) as a residual-miscalibration bound.

TPU-first mechanics:

- The student is trained as a **v-model** (prediction_type="v") — at the
  distilled step sizes the ε-parameterization blows up numerically near
  ᾱ→1 (Salimans & Ho §4); v stays O(1) everywhere. Sampling a distilled
  checkpoint = ``method="ddim"``, ``timestep_spacing="trailing"``,
  ``prediction_type="v"``, ``guidance_scale=0`` (guidance is baked in).
- The whole distill step — data gather from HBM, frozen-VAE encode,
  2×teacher CFG forwards, implied-target algebra, student fwd/bwd, Adam
  update — is ONE jitted program with donated student state.
- The student's timestep grid is the "trailing" grid
  round(linspace(T, 0, S+1)); the teacher runs on its midpoint
  refinement (2S+1 points). All per-step ᾱ tables are host-precomputed
  and gathered per sample by index inside the jit.
"""
from __future__ import annotations

import functools
import gc
import os
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state

from ..diffusion import DiffusionSchedule
from ..diffusion.sampling import v_to_eps
from ..models import VAE, CondUNet


def distill_grid(num_timesteps: int, num_student_steps: int) -> np.ndarray:
    """(2S+1,) strictly-decreasing ints T → 0: the student's trailing grid
    refined with the teacher's midpoints. Requires S ≤ T/2 so midpoints
    stay distinct."""
    T, S = num_timesteps, num_student_steps
    if 2 * S > T:
        raise ValueError(f"num_student_steps {S} needs 2S <= T={T}")
    ts = np.round(np.linspace(float(T), 0.0, 2 * S + 1)).astype(np.int64)
    if not (np.diff(ts) < 0).all():
        raise ValueError(f"degenerate distill grid for T={T}, S={S}")
    return ts.astype(np.int32)


def _alpha_bar_of(schedule: DiffusionSchedule, ts: np.ndarray) -> np.ndarray:
    """Host ᾱ lookup for 0-extended timesteps (ᾱ(0) = 1 exactly)."""
    ab = np.asarray(schedule.alpha_bars, dtype=np.float64)
    out = np.ones(ts.shape, dtype=np.float64)
    pos = ts >= 1
    out[pos] = ab[ts[pos] - 1]
    return out


def implied_x0_target(
    x_t: jnp.ndarray, x_n: jnp.ndarray,
    a_t: jnp.ndarray, s_t: jnp.ndarray,
    a_n: jnp.ndarray, s_n: jnp.ndarray,
) -> jnp.ndarray:
    """The x₀ a ONE-step (x_t, t) → x_n DDIM jump must predict to land on
    x_n (Salimans & Ho eq. 6): solve x_n = a_n·x̃₀ + s_n·(x_t − a_t·x̃₀)/s_t
    for x̃₀. The denominator a_n − (s_n/s_t)·a_t > 0 whenever SNR(t_n) >
    SNR(t) (always, t_n < t), and equals a_n = 1 at the terminal s_n = 0.
    With an EXACT teacher the target is exactly the data x₀ (test-pinned).
    """
    r = s_n / s_t
    return (x_n - r * x_t) / (a_n - r * a_t)


def stage_tables(schedule: DiffusionSchedule, num_student_steps: int,
                 pad_to: Optional[int] = None) -> Tuple[dict, int]:
    """Per-stage coefficient tables for :func:`make_distill_step`, padded
    to ``pad_to`` rows so DIFFERENT stages can reuse ONE compiled step
    (table shapes are part of the jit signature; under the remote AOT
    compiler each extra compile costs many minutes). The pad rows repeat
    the last real row and are never sampled (i < n_steps). Returns
    ``(tables, n_steps)``."""
    grid = distill_grid(schedule.num_timesteps, num_student_steps)
    S = num_student_steps
    ab = _alpha_bar_of(schedule, grid)          # (2S+1,)

    def pad(a):
        a = np.asarray(a)
        if pad_to is None or pad_to <= S:
            return a
        return np.concatenate([a, np.repeat(a[-1:], pad_to - S, axis=0)])

    tables = {
        "t_start": jnp.asarray(pad(grid[0::2][:S]), jnp.int32),
        "t_mid": jnp.asarray(pad(grid[1::2]), jnp.int32),
        "a_t": jnp.asarray(pad(np.sqrt(ab[0::2][:S])), jnp.float32),
        "s_t": jnp.asarray(pad(np.sqrt(1.0 - ab[0::2][:S])), jnp.float32),
        "a_m": jnp.asarray(pad(np.sqrt(ab[1::2])), jnp.float32),
        "s_m": jnp.asarray(pad(np.sqrt(1.0 - ab[1::2])), jnp.float32),
        "a_n": jnp.asarray(pad(np.sqrt(ab[2::2])), jnp.float32),
        "s_n": jnp.asarray(pad(np.sqrt(1.0 - ab[2::2])), jnp.float32),
    }
    return tables, S


def _gather_z0(vae: Optional[VAE], data, idx, k_vae, vae_params):
    """Gather one batch's latents (and conditioning) from HBM-resident
    data: pre-drawn ``z0``, pre-encoded posterior moments, or a per-step
    frozen-VAE encode of ``image_u8`` (see make_distill_step docstring)."""
    y_b = jnp.take(data["y"], idx, axis=0).astype(jnp.int32)
    vals_b = jnp.take(data["vals"], idx, axis=0)
    mask_b = jnp.take(data["mask"], idx, axis=0)
    if vae is None and "z_mu" in data:
        mu = jnp.take(data["z_mu"], idx, axis=0)
        sd = jnp.take(data["z_std"], idx, axis=0)
        z0 = mu + sd * jax.random.normal(k_vae, mu.shape, dtype=mu.dtype)
    elif vae is None:
        z0 = jnp.take(data["z0"], idx, axis=0)
    else:
        images = jnp.take(data["image_u8"], idx, axis=0).astype(
            jnp.float32) / 255.0
        z0, _ = vae.apply({"params": vae_params}, images,
                          method=VAE.encode, rngs={"sample": k_vae})
    return z0, y_b, vals_b, mask_b


def make_fold_step(
    student: CondUNet,
    teacher_apply: Callable,
    vae: Optional[VAE],
    schedule: DiffusionSchedule,
    guidance_w: float,
    teacher_prediction_type: str = "epsilon",
    debug_targets: bool = False,
):
    """Guidance-fold step (Meng et al. 2023 Algorithm 1, stage one): the
    student — initialized FROM the teacher — learns to output the
    classifier-free-GUIDED ε̂ = ε_u + w·(ε_c − ε_u) in ONE forward, at
    the SAME (x_t, t). Matching happens in ε-space, where targets are
    O(1) at every t (the x0/v frames amplify guided-teacher
    miscalibration by 1/a(t) ≈ 156 at t=1000 — see module docstring).
    The folded student keeps the ε parameterization; timesteps are drawn
    uniformly from [1, T] so the fold covers every grid any later
    halving stage will sample."""
    w = float(guidance_w)
    T = schedule.num_timesteps

    def _teacher_eps(tvars, x, t, y, vals, mask):
        out = teacher_apply(tvars, x, t, y, vals, mask)
        out = out[0] if isinstance(out, tuple) else out
        if teacher_prediction_type == "v":
            out = v_to_eps(schedule, x, t, out)
        return out

    ab = jnp.asarray(schedule.alpha_bars, jnp.float32)

    @functools.partial(jax.jit, donate_argnums=0)
    def step(state: train_state.TrainState, teacher_params, vae_params,
             data, idx, key):
        k_vae, k_t, k_eps = jax.random.split(key, 3)
        z0, y_b, vals_b, mask_b = _gather_z0(vae, data, idx, k_vae,
                                             vae_params)
        B, nd = z0.shape[0], z0.ndim
        t = jax.random.randint(k_t, (B,), 1, T + 1)
        a_b = jnp.sqrt(ab[t - 1]).reshape((B,) + (1,) * (nd - 1))
        s_b = jnp.sqrt(1.0 - ab[t - 1]).reshape((B,) + (1,) * (nd - 1))
        eps = jax.random.normal(k_eps, z0.shape, dtype=z0.dtype)
        x_t = a_b * z0 + s_b * eps

        tvars = {"params": teacher_params}
        x2 = jnp.concatenate([x_t, x_t], axis=0)
        t2 = jnp.concatenate([t, t], axis=0)
        y2 = jnp.concatenate([jnp.zeros_like(y_b), y_b], axis=0)
        v2 = jnp.concatenate([vals_b, vals_b], axis=0)
        m2 = jnp.concatenate([mask_b, mask_b], axis=0)
        e2 = _teacher_eps(tvars, x2, t2, y2, v2, m2)
        e_u, e_c = jnp.split(e2, 2, axis=0)
        eps_tgt = jax.lax.stop_gradient(e_u + w * (e_c - e_u))

        def loss_fn(params):
            out = student.apply({"params": params}, x_t, t, y_b,
                                vals_b, mask_b)
            eps_s = out[0] if isinstance(out, tuple) else out
            return jnp.mean(jnp.square(eps_s - eps_tgt))

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        state = state.apply_gradients(grads=grads)
        aux = {"loss": loss}
        if debug_targets:
            aux["eps_tgt"] = eps_tgt
            aux["t"] = t
        return state, aux

    return step


def make_distill_step(
    student: CondUNet,
    teacher_apply: Callable,
    vae: Optional[VAE],
    schedule: DiffusionSchedule,
    guidance_w: float,
    teacher_prediction_type: str = "epsilon",
    debug_targets: bool = False,
    x0_clip: float = 0.0,
):
    """One jitted progressive-distillation step over HBM-resident data.

    ``teacher_apply(variables, x, t, y, vals, mask)`` is the frozen
    teacher's apply fn (tuple outputs allowed — geom head ignored).
    ``vae=None`` means the data dict already holds latents: either fixed
    samples ``data["z0"]``, or pre-encoded posterior moments
    ``data["z_mu"]``/``data["z_std"]`` (ALREADY multiplied by the VAE
    scale factor) from which a fresh reparameterized sample is drawn per
    step — exactly ``VAE.encode`` semantics without paying the encoder
    per step (the encoder output for a frozen VAE is a pure function of
    the image; only the eps draw varies). Otherwise ``data["image_u8"]``
    is gathered and encoded per step. The student's geometry head is
    left untouched by the distill loss (its weights ride along from the
    teacher init).

    The stage's timestep grid arrives at CALL time as runtime arguments
    (``tables``, ``n_steps`` from :func:`stage_tables`): padding every
    stage's tables to the same length lets all stages with the same
    (guidance on/off, teacher parameterization) share one compiled
    program — that is 2 compiles for a whole halving schedule instead of
    one per stage.
    """
    w = float(guidance_w)

    def _teacher_eps(tvars, x, t, y, vals, mask):
        out = teacher_apply(tvars, x, t, y, vals, mask)
        out = out[0] if isinstance(out, tuple) else out
        if teacher_prediction_type == "v":
            out = v_to_eps(schedule, x, t, out)
        return out

    def _teacher_cfg(tvars, x, t, y, vals, mask):
        # cfg_eps semantics (diff.py:147-151): vals/mask to BOTH halves,
        # label nulled in the uncond half; w<=0 → plain conditional.
        if w <= 0.0:
            return _teacher_eps(tvars, x, t, y, vals, mask)
        x2 = jnp.concatenate([x, x], axis=0)
        t2 = jnp.concatenate([t, t], axis=0)
        y2 = jnp.concatenate([jnp.zeros_like(y), y], axis=0)
        v2 = jnp.concatenate([vals, vals], axis=0)
        m2 = jnp.concatenate([mask, mask], axis=0)
        e2 = _teacher_eps(tvars, x2, t2, y2, v2, m2)
        e_u, e_c = jnp.split(e2, 2, axis=0)
        return e_u + w * (e_c - e_u)

    def _bc(a, nd):
        return a.reshape(a.shape + (1,) * (nd - a.ndim))

    @functools.partial(jax.jit, donate_argnums=0, static_argnums=())
    def step(state: train_state.TrainState, teacher_params, vae_params,
             data, idx, key, tables, n_steps):
        k_vae, k_i, k_eps = jax.random.split(key, 3)
        z0, y_b, vals_b, mask_b = _gather_z0(vae, data, idx, k_vae,
                                             vae_params)
        B = z0.shape[0]
        nd = z0.ndim

        i = jax.random.randint(k_i, (B,), 0, n_steps)
        t = jnp.take(tables["t_start"], i)
        tm = jnp.take(tables["t_mid"], i)
        at = _bc(jnp.take(tables["a_t"], i), nd)
        st = _bc(jnp.take(tables["s_t"], i), nd)
        am = _bc(jnp.take(tables["a_m"], i), nd)
        sm = _bc(jnp.take(tables["s_m"], i), nd)
        an = _bc(jnp.take(tables["a_n"], i), nd)
        sn = _bc(jnp.take(tables["s_n"], i), nd)

        eps = jax.random.normal(k_eps, z0.shape, dtype=z0.dtype)
        x_t = at * z0 + st * eps

        # two deterministic guided DDIM teacher steps: t -> mid -> next
        tvars = {"params": teacher_params}
        e1 = _teacher_cfg(tvars, x_t, t, y_b, vals_b, mask_b)
        x0_1 = (x_t - st * e1) / at
        x_m = am * x0_1 + sm * e1
        e2 = _teacher_cfg(tvars, x_m, tm, y_b, vals_b, mask_b)
        x0_2 = (x_m - sm * e2) / am
        x_n = an * x0_2 + sn * e2

        x0_tgt = implied_x0_target(x_t, x_n, at, st, an, sn)
        if x0_clip > 0.0:
            # residual-miscalibration bound: with guidance folded the
            # implied x0 should live in the latent data range; clip the
            # rare high-t blowups instead of letting them dominate the
            # regression (module docstring; real latents span |z0|≲2)
            x0_tgt = jnp.clip(x0_tgt, -x0_clip, x0_clip)
        x0_tgt = jax.lax.stop_gradient(x0_tgt)

        # truncated-SNR loss weight (Salimans & Ho §3.3): max(ᾱ/(1−ᾱ), 1)
        snr_w = jnp.maximum((at / st) ** 2, 1.0)

        def loss_fn(params):
            out = student.apply({"params": params}, x_t, t, y_b,
                                vals_b, mask_b)
            v_pred = out[0] if isinstance(out, tuple) else out
            x0_s = at * x_t - st * v_pred  # x0 from a v-prediction
            loss = jnp.mean(snr_w * jnp.square(x0_s - x0_tgt))
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        state = state.apply_gradients(grads=grads)
        aux = {"loss": loss}
        if debug_targets:
            aux["x0_tgt"] = x0_tgt
            aux["z0"] = z0
        return state, aux

    return step


def _host_rss_gb() -> float:
    """Current process resident set size in GB (Linux /proc)."""
    try:
        with open("/proc/self/statm") as f:
            pages = int(f.read().split()[1])
        return pages * os.sysconf("SC_PAGESIZE") / 1e9
    except (OSError, ValueError, IndexError):
        return 0.0


def progressive_distill(
    student: CondUNet,
    teacher_params,
    vae: Optional[VAE],
    vae_params,
    schedule: DiffusionSchedule,
    data: Dict[str, jnp.ndarray],
    *,
    start_steps: int,
    min_steps: int = 8,
    steps_per_stage: int = 2000,
    batch_size: int = 128,
    lr: float = 1e-4,
    guidance_w: float = 3.0,
    teacher_prediction_type: str = "epsilon",
    key: Optional[jax.Array] = None,
    seed: int = 0,
    on_stage_done: Optional[Callable] = None,
    sync_every: int = 25,
    rss_limit_gb: float = 100.0,
    log_rss_every: int = 0,
    fold_steps: Optional[int] = None,
    x0_clip: float = 4.0,
) -> Tuple[dict, List[dict]]:
    """Run guidance folding (when ``guidance_w > 0``) then the halving
    schedule start_steps → min_steps.

    The fold stage (Meng et al. Algorithm 1 stage one; ``fold_steps``
    optimizer steps, default = ``steps_per_stage``) trains an ε-space
    student to output the guided ε̂ in one forward; it is reported to
    ``on_stage_done`` with S=0 and saved like any stage. Every halving
    stage then runs at w=0 against the (folded) teacher: each initializes
    the student from the current teacher, trains ``steps_per_stage``
    optimizer steps with the implied-x0 target clipped to ±``x0_clip``
    (0 disables), then promotes the student to teacher (a v-model from
    the first halving stage on). Returns ``(final_params, stage_logs)``;
    ``on_stage_done(S, params, log)`` can checkpoint per stage.

    Host-memory guards (the round-4 30000-image run was SIGKILLed at
    130 GB host RSS on a 125 GB box): ``sync_every`` blocks on the loss
    every N steps so the async dispatch queue — and whatever per-dispatch
    host buffers the remote-device client retains — stays bounded;
    ``log_rss_every`` > 0 prints host RSS (with a gc.collect()) at that
    cadence; crossing ``rss_limit_gb`` checkpoints the stage-in-progress
    via ``on_stage_done`` (log carries ``"partial": it``) and raises
    RuntimeError — a clean, diagnosable failure instead of the OOM
    killer's silent SIGKILL.
    """
    key = key if key is not None else jax.random.PRNGKey(seed)
    n = int(np.asarray(data["y"]).shape[0])
    rng = np.random.default_rng(seed)

    # Pin the frozen pytrees to the device ONCE. Checkpoint loads
    # (flax.serialization.from_bytes) return host numpy arrays; passing
    # those into the jitted step re-uploads the whole teacher (~120 MB
    # fp32 for the flagship U-Net) on EVERY call — under the remote-device
    # client that retained per-dispatch host buffers at ~100 MB/step,
    # which is exactly the round-4 30000-image OOM signature (22→47 GB
    # RSS in 250 steps even after the data-side pre-encode fix).
    teacher_params = jax.device_put(teacher_params)
    if vae_params is not None:
        vae_params = jax.device_put(vae_params)
    data = {k: (v if isinstance(v, jax.Array) else jax.device_put(v))
            for k, v in data.items()}

    stages = []
    s = start_steps
    while s >= min_steps:
        stages.append(s)
        s //= 2

    teacher_ptype = teacher_prediction_type
    logs: List[dict] = []
    steps_cache: Dict[Tuple[str, str], Callable] = {}

    def run_stage(S, step, extra, n_iters):
        """Shared optimizer loop + dispatch-queue bound + RSS watchdog.
        S=0 labels the guidance-fold stage."""
        nonlocal key
        state = train_state.TrainState.create(
            apply_fn=None,
            params=jax.tree_util.tree_map(jnp.copy, teacher_params),
            tx=optax.adam(lr),
        )
        losses = []
        for it in range(n_iters):
            idx = jnp.asarray(
                rng.integers(0, n, size=batch_size), jnp.int32)
            key, k = jax.random.split(key)
            state, aux = step(state, teacher_params, vae_params, data,
                              idx, k, *extra)
            if it % max(1, n_iters // 20) == 0 or it == n_iters - 1:
                losses.append(float(aux["loss"]))
            elif sync_every and it % sync_every == 0:
                jax.block_until_ready(aux["loss"])
            if (log_rss_every and it % log_rss_every == 0) or \
                    (sync_every and it % max(sync_every * 4, 100) == 0):
                gc.collect()
                rss = _host_rss_gb()
                if log_rss_every and it % log_rss_every == 0:
                    print(f"[stage S={S} it={it}] host RSS {rss:.2f} GB",
                          flush=True)
                if rss > rss_limit_gb:
                    if on_stage_done is not None:
                        on_stage_done(S, state.params,
                                      {"steps": S, "losses": losses,
                                       "partial": it})
                    raise RuntimeError(
                        f"host RSS {rss:.1f} GB exceeded the "
                        f"{rss_limit_gb:.0f} GB limit at stage S={S} "
                        f"step {it} — aborting before the OOM killer "
                        f"does (stage-partial checkpoint saved)")
        log = {"steps": S, "losses": losses}
        logs.append(log)
        if on_stage_done is not None:
            on_stage_done(S, state.params, log)
        return state.params

    if guidance_w > 0.0:
        # stage 0: fold CFG into the weights in ε-space (student stays an
        # ε-model; see make_fold_step). All halving stages then run w=0.
        fold = make_fold_step(student, student.apply, vae, schedule,
                              guidance_w,
                              teacher_prediction_type=teacher_ptype)
        teacher_params = run_stage(0, fold, (),
                                   fold_steps or steps_per_stage)
        teacher_ptype = "epsilon"  # folded student is an ε-model

    for S in stages:
        # one compiled step per teacher parameterization — the stage grid
        # arrives as padded runtime tables, so every later stage reuses
        # the first v-teacher compile
        if teacher_ptype not in steps_cache:
            steps_cache[teacher_ptype] = make_distill_step(
                student, student.apply, vae, schedule, 0.0,
                teacher_prediction_type=teacher_ptype, x0_clip=x0_clip,
            )
        step = steps_cache[teacher_ptype]
        tables, n_steps = stage_tables(schedule, S, pad_to=stages[0])
        teacher_params = run_stage(
            S, step, (tables, jnp.asarray(n_steps, jnp.int32)),
            steps_per_stage)
        teacher_ptype = "v"  # students are v-models from here on
    return teacher_params, logs

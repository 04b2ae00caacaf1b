"""Pure-functional DDPM forward/reverse processes and scan samplers.

Behavioral parity with the reference ``Diffuser``
(/root/reference/diff.py:18-162), redesigned TPU-first:

- the whole ``T → 1`` reverse loop is a single ``lax.scan`` inside ``jit``
  (the reference runs a Python loop with 2 model calls per step);
- classifier-free guidance is evaluated as **one batched 2B forward**
  (uncond half + cond half concatenated) instead of two sequential calls;
- per-step randomness comes from ``jax.random.fold_in`` on a base key, so the
  scan carries no RNG state and stays trivially reorderable by XLA;
- "zero noise at t == 1" (diff.py:52,159) is expressed as a multiplicative
  mask, not a scatter;
- the reference's unbound-``eps`` bug for ``guidance_scale == 0`` with a
  non-null label (diff.py:146-156) is fixed: that case runs a plain
  conditional forward.

Layout note: everything here is layout-agnostic over trailing axes; shapes
are ``(B, ...)`` with per-sample scalars broadcast via reshape.
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from .schedule import DiffusionSchedule

# eps_fn(x, t, y, cond_vals, cond_mask) -> eps prediction with x's shape.
EpsFn = Callable[..., jnp.ndarray]


def _bcast(a: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Reshape (B,) scalars to (B, 1, 1, ...) for broadcasting."""
    return a.reshape(a.shape + (1,) * (ndim - a.ndim))


def q_sample(
    schedule: DiffusionSchedule,
    x0: jnp.ndarray,
    t: jnp.ndarray,
    noise: jnp.ndarray,
) -> jnp.ndarray:
    """Forward process q(x_t | x_0); reference ``add_noise`` (diff.py:18-30).

    ``t`` is 1-indexed with shape (B,).
    """
    ab = _bcast(schedule.alpha_bar(t), x0.ndim)
    return jnp.sqrt(ab) * x0 + jnp.sqrt(1.0 - ab) * noise


def ddpm_posterior_step(
    schedule: DiffusionSchedule,
    x: jnp.ndarray,
    t: jnp.ndarray,
    eps: jnp.ndarray,
    noise: jnp.ndarray,
) -> jnp.ndarray:
    """One reverse DDPM step x_t -> x_{t-1}; reference diff.py:51-56,158-162.

    ``noise`` must already be sampled; it is zeroed where ``t == 1``.
    """
    nd = x.ndim
    alpha = _bcast(schedule.alpha(t), nd)
    ab = _bcast(schedule.alpha_bar(t), nd)
    ab_prev = _bcast(schedule.alpha_bar_prev(t), nd)

    mu = (x - ((1.0 - alpha) / jnp.sqrt(1.0 - ab)) * eps) / jnp.sqrt(alpha)
    std = jnp.sqrt((1.0 - alpha) * (1.0 - ab_prev) / (1.0 - ab))
    keep_noise = _bcast((t > 1).astype(x.dtype), nd)
    return mu + noise * keep_noise * std


def v_target(
    schedule: DiffusionSchedule, x0: jnp.ndarray, t: jnp.ndarray,
    noise: jnp.ndarray,
) -> jnp.ndarray:
    """v-prediction training target (Salimans & Ho 2022, progressive
    distillation): ``v = √ᾱ_t·ε − √(1−ᾱ_t)·x₀``. Beyond-reference option —
    the reference trains ε-prediction only."""
    ab = _bcast(schedule.alpha_bar(t), x0.ndim)
    return jnp.sqrt(ab) * noise - jnp.sqrt(1.0 - ab) * x0


def v_to_eps(
    schedule: DiffusionSchedule, x_t: jnp.ndarray, t: jnp.ndarray,
    v: jnp.ndarray,
) -> jnp.ndarray:
    """Exact ε from a v-prediction: ``ε = √ᾱ_t·v + √(1−ᾱ_t)·x_t`` (algebraic
    identity from x_t = √ᾱ·x₀ + √(1−ᾱ)·ε). Lets every ε-based sampler
    (DDPM/DDIM/DPM++/cached) consume a v-trained model unchanged."""
    ab = _bcast(schedule.alpha_bar(t), x_t.ndim)
    return jnp.sqrt(ab) * v + jnp.sqrt(1.0 - ab) * x_t


def cfg_eps(
    eps_fn: EpsFn,
    x: jnp.ndarray,
    t: jnp.ndarray,
    y: jnp.ndarray,
    cond_vals: Optional[jnp.ndarray],
    cond_mask: Optional[jnp.ndarray],
    guidance_scale: float,
    null_label: int = 0,
) -> jnp.ndarray:
    """Classifier-free-guided epsilon as one 2B batched forward.

    Matches diff.py:147-151: the numeric condition (vals/mask) is passed to
    BOTH branches; only the class label is nulled in the uncond half.
    """
    if guidance_scale is None or guidance_scale <= 0.0:
        return eps_fn(x, t, y, cond_vals, cond_mask)

    x2 = jnp.concatenate([x, x], axis=0)
    t2 = jnp.concatenate([t, t], axis=0)
    y2 = jnp.concatenate([jnp.full_like(y, null_label), y], axis=0)
    cv2 = None if cond_vals is None else jnp.concatenate([cond_vals, cond_vals], axis=0)
    cm2 = None if cond_mask is None else jnp.concatenate([cond_mask, cond_mask], axis=0)

    eps2 = eps_fn(x2, t2, y2, cv2, cm2)
    eps_u, eps_c = jnp.split(eps2, 2, axis=0)
    return eps_u + guidance_scale * (eps_c - eps_u)


def sample_loop(
    schedule: DiffusionSchedule,
    eps_fn: EpsFn,
    x_init: jnp.ndarray,
    key: jax.Array,
    y: Optional[jnp.ndarray] = None,
    cond_vals: Optional[jnp.ndarray] = None,
    cond_mask: Optional[jnp.ndarray] = None,
    guidance_scale: float = 0.0,
    null_label: int = 0,
    unroll: int = 1,
) -> jnp.ndarray:
    """Full ``T → 1`` reverse diffusion as a single ``lax.scan``.

    Covers the reference's ``sample`` / ``sample_latent`` / ``sample_cond`` /
    ``sample_latent_cond`` reverse loops (diff.py:66-85, 103-113, 165-172,
    326-344) with one compiled program. Decoding back to pixels is the
    caller's job (keeps this reusable for pixel- and latent-space models).

    ``unroll`` is passed to ``lax.scan``: unrolling k step bodies per loop
    iteration amortizes the scan's per-iteration sequencing overhead —
    relevant here because the profile shows the step is latency-bound
    across many small layers, not FLOP-bound. Pure scheduling knob:
    results are bit-identical for any value.
    """
    B = x_init.shape[0]
    T = schedule.num_timesteps
    if y is None:
        y = jnp.full((B,), null_label, dtype=jnp.int32)
        guidance_scale = 0.0  # nothing to guide against

    def step(x, i):
        t_scalar = T - i  # i = 0 .. T-1  ->  t = T .. 1
        t = jnp.full((B,), t_scalar, dtype=jnp.int32)
        eps = cfg_eps(
            eps_fn, x, t, y, cond_vals, cond_mask,
            guidance_scale=guidance_scale, null_label=null_label,
        )
        step_key = jax.random.fold_in(key, i)
        noise = jax.random.normal(step_key, x.shape, dtype=x.dtype)
        x_next = ddpm_posterior_step(schedule, x, t, eps, noise)
        return x_next, None

    x_final, _ = jax.lax.scan(step, x_init, jnp.arange(T),
                              unroll=max(1, int(unroll)))
    return x_final


def sample_loop_encoder_cached(
    schedule: DiffusionSchedule,
    embed_fn,
    encode_fn,
    decode_fn,
    x_init: jnp.ndarray,
    key: jax.Array,
    y: Optional[jnp.ndarray] = None,
    cond_vals: Optional[jnp.ndarray] = None,
    cond_mask: Optional[jnp.ndarray] = None,
    guidance_scale: float = 0.0,
    null_label: int = 0,
    cache_interval: int = 2,
    model_out_to_eps=None,
) -> jnp.ndarray:
    """DDPM reverse loop with encoder-feature caching.

    After "Faster Diffusion: Rethinking the Role of the Encoder"
    (arXiv:2312.09608, PAPERS.md): across adjacent timesteps the U-Net's
    encoder/skip features drift slowly while the decoder does the
    step-to-step work, so the encoder (+bottleneck, ~27% of this model's
    step cost) is recomputed only every ``cache_interval`` steps; the
    decoder always runs with the CURRENT fused embedding, so time/class
    conditioning stays exact. ``cache_interval=1`` reproduces
    :func:`sample_loop` bit-for-bit (same RNG path, same math).

    ``embed_fn(t, y, vals, mask)``, ``encode_fn(x, emb)`` and
    ``decode_fn(feats, emb) -> eps`` are the three pieces of the split
    U-Net (models/unet.py ``embed``/``encode``/``decode``); CFG runs as the
    same single 2B-row batch as :func:`cfg_eps`, so the cached features
    cover both branches.
    """
    B = x_init.shape[0]
    T = schedule.num_timesteps
    if y is None:
        y = jnp.full((B,), null_label, dtype=jnp.int32)
        guidance_scale = 0.0
    cfg_on = guidance_scale is not None and guidance_scale > 0.0

    if cfg_on:
        y2 = jnp.concatenate([jnp.full_like(y, null_label), y])
        cv2 = None if cond_vals is None else jnp.concatenate(
            [cond_vals, cond_vals])
        cm2 = None if cond_mask is None else jnp.concatenate(
            [cond_mask, cond_mask])
        mult = 2
    else:
        y2, cv2, cm2, mult = y, cond_vals, cond_mask, 1

    def model_inputs(x, i):
        t2 = jnp.full((mult * B,), T - i, dtype=jnp.int32)
        x2 = jnp.concatenate([x, x], axis=0) if cfg_on else x
        return x2, t2, embed_fn(t2, y2, cv2, cm2)

    # carry needs concrete feature shapes; step 0 recomputes anyway, so
    # zero-filled placeholders of the traced shapes suffice
    x2_0, _t2_0, emb0 = model_inputs(x_init, jnp.asarray(0))
    feat_shapes = jax.eval_shape(encode_fn, x2_0, emb0)
    feats0 = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), feat_shapes)

    def step(carry, i):
        x, feats = carry
        x2, t2, emb = model_inputs(x, i)
        feats = jax.lax.cond(
            i % cache_interval == 0,
            lambda op: encode_fn(op[0], op[1]),
            lambda op: op[2],
            (x2, emb, feats),
        )
        eps2 = decode_fn(feats, emb)
        if model_out_to_eps is not None:  # e.g. v-prediction conversion
            eps2 = model_out_to_eps(x2, t2, eps2)
        if cfg_on:
            eps_u, eps_c = jnp.split(eps2, 2, axis=0)
            eps = eps_u + guidance_scale * (eps_c - eps_u)
        else:
            eps = eps2
        t = jnp.full((B,), T - i, dtype=jnp.int32)
        step_key = jax.random.fold_in(key, i)
        noise = jax.random.normal(step_key, x.shape, dtype=x.dtype)
        x_next = ddpm_posterior_step(schedule, x, t, eps, noise)
        return (x_next, feats), None

    (x_final, _), _ = jax.lax.scan(step, (x_init, feats0), jnp.arange(T))
    return x_final


def ddim_step(
    schedule: DiffusionSchedule,
    x: jnp.ndarray,
    t: jnp.ndarray,
    t_prev: jnp.ndarray,
    eps: jnp.ndarray,
    noise: jnp.ndarray,
    eta: float = 0.0,
) -> jnp.ndarray:
    """One DDIM step x_t → x_{t_prev} (Song et al. 2020).

    No reference counterpart (the reference only has 1000-step ancestral
    DDPM); this is the framework's fast production sampler: a strided
    timestep subsequence with ``eta=0`` is deterministic and needs ~20-50
    model evaluations instead of 1000. ``t_prev == 0`` means "final step"
    (ᾱ_prev = 1).
    """
    nd = x.ndim
    ab = _bcast(schedule.alpha_bar(t), nd)
    ab_prev = jnp.where(
        _bcast(t_prev, nd) >= 1,
        _bcast(schedule.alpha_bar(jnp.maximum(t_prev, 1)), nd),
        jnp.ones_like(ab),
    )
    x0_pred = (x - jnp.sqrt(1.0 - ab) * eps) / jnp.sqrt(ab)
    sigma = (
        eta
        * jnp.sqrt((1.0 - ab_prev) / (1.0 - ab))
        * jnp.sqrt(1.0 - ab / ab_prev)
    )
    dir_xt = jnp.sqrt(jnp.clip(1.0 - ab_prev - sigma**2, 0.0, None)) * eps
    return jnp.sqrt(ab_prev) * x0_pred + dir_xt + sigma * noise


def _ddim_timesteps_np(num_timesteps: int, num_inference_steps: int):
    """NumPy core of :func:`ddim_timesteps` — safe to call inside a ``jit``
    trace (pure host math on static ints; no staged jnp constants)."""
    import numpy as _np

    S = min(num_inference_steps, num_timesteps)
    ts = _np.unique(_np.round(_np.linspace(1.0, float(num_timesteps), S)))
    return ts[::-1].copy().astype(_np.int32)


def ddim_timesteps(num_timesteps: int, num_inference_steps: int) -> jnp.ndarray:
    """Strided descending timestep subsequence in [1, T], ending at 1.

    Computed in NumPy at trace time (both args are static) and deduplicated:
    rounding can emit repeated t at large S/T ratios, which would waste model
    evaluations on no-op steps."""
    return jnp.asarray(_ddim_timesteps_np(num_timesteps, num_inference_steps),
                       dtype=jnp.int32)


def _karras_timesteps_np(schedule: DiffusionSchedule,
                         num_inference_steps: int, rho: float = 7.0,
                         sigma_max_cap: float = 80.0):
    """Karras et al. (2022, arXiv:2206.00364) ρ-spaced sigma grid, snapped
    to the discrete schedule. Beyond-reference option: the EDM paper's
    σ_i = (σ_max^{1/ρ} + i/(S−1)·(σ_min^{1/ρ} − σ_max^{1/ρ}))^ρ spends most
    model evaluations at LOW noise where few-step samplers lose detail; the
    default ρ=7 is the paper's. Each σ maps to the nearest discrete t of
    the trained model (σ(t) = √((1−ᾱ_t)/ᾱ_t), strictly increasing), then
    dedupes — so the model always sees timesteps it was trained on.

    σ_max is capped at ``sigma_max_cap`` (EDM's 80, sized for unit-variance
    data — which the ×0.18215-scaled latents are): schedules whose ᾱ_T is
    astronomically small (e.g. cosine with betas clipped at 0.999 →
    σ_T ~ 1e15) would otherwise pull most of the ρ-grid into the last few
    timesteps and collapse it under dedup. The first evaluation is always
    pinned to t=T regardless, so x_init is consumed at the exact noise
    level it was drawn at. Host-side numpy only (safe inside a jit trace;
    see _ddim_timesteps_np).
    """
    import numpy as _np

    ab = _np.asarray(schedule.alpha_bars, dtype=_np.float64)
    sig = _np.sqrt((1.0 - ab) / ab)  # VE-parameterized sigma, increasing
    T = schedule.num_timesteps
    S = min(num_inference_steps, T)
    if S <= 1:
        return _np.asarray([1], dtype=_np.int32)
    smin = sig[0]
    smax = min(sig[-1], max(sigma_max_cap, 4.0 * smin))
    frac = _np.linspace(0.0, 1.0, S - 1) if S > 2 else _np.asarray([1.0])
    sigmas = (smax ** (1.0 / rho)
              + frac * (smin ** (1.0 / rho) - smax ** (1.0 / rho))) ** rho
    idx = _np.clip(_np.searchsorted(sig, sigmas), 1, len(sig) - 1)
    lo = idx - 1
    take_lo = _np.abs(sig[lo] - sigmas) <= _np.abs(sig[idx] - sigmas)
    t = _np.where(take_lo, lo, idx) + 1  # 1-indexed timesteps
    t = _np.concatenate([[T], t])        # pin the first eval to t=T
    return _np.unique(t)[::-1].copy().astype(_np.int32)  # descending


def _trailing_timesteps_np(num_timesteps: int, num_inference_steps: int):
    """``round(linspace(T, 0, S+1))[:-1]`` — the "trailing" grid: starts at
    exactly t=T and spaces by jumps-to-zero. This is the grid progressive
    distillation trains on (train/distill.py builds its teacher grid as
    this grid's midpoint refinement), so distilled students MUST be
    sampled with it; also a sound general-purpose choice."""
    import numpy as _np

    T = num_timesteps
    S = min(num_inference_steps, T)
    ts = _np.round(_np.linspace(float(T), 0.0, S + 1))[:-1]
    ts = _np.unique(_np.clip(ts, 1, T))[::-1]
    return ts.copy().astype(_np.int32)


def sampler_timesteps_np(schedule: DiffusionSchedule,
                         num_inference_steps: int,
                         timestep_spacing: str = "linear"):
    """Descending 1-indexed timestep grid for the fast samplers:
    ``"linear"`` (uniform stride ending at t=1, the DDIM-paper default),
    ``"trailing"`` (uniform stride starting at exactly t=T — REQUIRED for
    progressively-distilled checkpoints, which are trained on this grid),
    or ``"karras"`` (ρ=7 sigma spacing, denser near t=1)."""
    if timestep_spacing == "karras":
        return _karras_timesteps_np(schedule, num_inference_steps)
    if timestep_spacing == "trailing":
        return _trailing_timesteps_np(schedule.num_timesteps,
                                      num_inference_steps)
    if timestep_spacing == "linear":
        return _ddim_timesteps_np(schedule.num_timesteps,
                                  num_inference_steps)
    raise ValueError(f"unknown timestep_spacing {timestep_spacing!r}")


def sample_loop_ddim(
    schedule: DiffusionSchedule,
    eps_fn: EpsFn,
    x_init: jnp.ndarray,
    key: jax.Array,
    num_inference_steps: int = 50,
    eta: float = 0.0,
    y: Optional[jnp.ndarray] = None,
    cond_vals: Optional[jnp.ndarray] = None,
    cond_mask: Optional[jnp.ndarray] = None,
    guidance_scale: float = 0.0,
    null_label: int = 0,
    timestep_spacing: str = "linear",
) -> jnp.ndarray:
    """DDIM reverse process over a strided subsequence, as one lax.scan."""
    B = x_init.shape[0]
    if y is None:
        y = jnp.full((B,), null_label, dtype=jnp.int32)
        guidance_scale = 0.0

    ts = jnp.asarray(
        sampler_timesteps_np(schedule, num_inference_steps,
                             timestep_spacing), dtype=jnp.int32)
    ts_prev = jnp.concatenate([ts[1:], jnp.zeros((1,), jnp.int32)])

    def step(x, it):
        i, t_scalar, t_prev_scalar = it
        t = jnp.full((B,), t_scalar, dtype=jnp.int32)
        t_prev = jnp.full((B,), t_prev_scalar, dtype=jnp.int32)
        eps = cfg_eps(
            eps_fn, x, t, y, cond_vals, cond_mask,
            guidance_scale=guidance_scale, null_label=null_label,
        )
        noise = jax.random.normal(jax.random.fold_in(key, i), x.shape,
                                  dtype=x.dtype)
        return ddim_step(schedule, x, t, t_prev, eps, noise, eta=eta), None

    S = ts.shape[0]
    x_final, _ = jax.lax.scan(step, x_init, (jnp.arange(S), ts, ts_prev))
    return x_final


def sample_loop_dpmpp(
    schedule: DiffusionSchedule,
    eps_fn: EpsFn,
    x_init: jnp.ndarray,
    key: Optional[jax.Array] = None,
    num_inference_steps: int = 20,
    y: Optional[jnp.ndarray] = None,
    cond_vals: Optional[jnp.ndarray] = None,
    cond_mask: Optional[jnp.ndarray] = None,
    guidance_scale: float = 0.0,
    null_label: int = 0,
    timestep_spacing: str = "linear",
) -> jnp.ndarray:
    """DPM-Solver++(2M): second-order multistep ODE sampler (Lu et al. 2022).

    No reference counterpart (the reference only has 1000-step ancestral
    DDPM); this is the framework's strongest few-step sampler: a
    second-order multistep update in log-SNR (λ = log(α/σ)) space on the
    data-prediction parameterization. The first step and the final step
    (t→0, where the step size h diverges) fall back to the first-order
    update, which is exactly a DDIM(eta=0) step — the standard
    ``lower_order_final`` stabilization.

    TPU-first detail: the timestep subsequence is static, so EVERY
    per-step solver quantity (σ-ratio, α(1−e^{−h}), the 2M correction
    weight 0.5·h/h_prev) is precomputed to scalar constants at trace time
    — the scan body is the CFG model call, the x0 conversion, and three
    fused multiply-adds. ``key`` is accepted for signature parity with the
    other samplers and ignored (the solver is deterministic).

    Update rule per step i (m = x0 prediction, going t_i → t_{i+1}):
        D    = m_i + w_i · (m_i − m_{i−1})      w_i = 0.5·h_i/h_{i−1}
        x    ← (σ_{i+1}/σ_i)·x + α_{i+1}(1−e^{−h_i})·D
    with w_i = 0 on the first and final steps.
    """
    import numpy as _np

    del key  # deterministic sampler
    B = x_init.shape[0]
    if y is None:
        y = jnp.full((B,), null_label, dtype=jnp.int32)
        guidance_scale = 0.0

    # All host-side numpy: this function usually runs inside a jit trace,
    # where any jnp call would be STAGED into a traced constant (omnistaging)
    # and break the np conversions below. schedule.alpha_bars is a concrete
    # table built at schedule construction, so plain indexing stays on host.
    ts_np = sampler_timesteps_np(schedule, num_inference_steps,
                                 timestep_spacing)
    S = int(ts_np.shape[0])

    # Per-step scalar coefficients, all in float64 numpy at trace time.
    ab = _np.asarray(schedule.alpha_bars,
                     dtype=_np.float64)[ts_np - 1]  # (S,)
    alpha = _np.sqrt(ab)
    sigma = _np.sqrt(1.0 - ab)
    lam = _np.log(alpha / sigma)
    # successors: ts[1:] then the terminal t=0 state (ᾱ=1: α=1, σ=0, λ=∞)
    alpha_n = _np.concatenate([alpha[1:], [1.0]])
    sigma_n = _np.concatenate([sigma[1:], [0.0]])
    with _np.errstate(divide="ignore"):
        lam_n = _np.where(sigma_n > 0.0,
                          _np.log(alpha_n / _np.maximum(sigma_n, 1e-300)),
                          _np.inf)
    h = lam_n - lam                       # (S,) step sizes, h[-1] = inf
    c_x = sigma_n / sigma                 # σ_{i+1}/σ_i   (0 on final step)
    # α_{i+1}(1 − e^{−h}); exact at the final step: e^{−h}=0 → α_n = 1
    c_m = alpha_n * (1.0 - _np.exp(-h))
    # 2M correction weight: 0 on the first step (no m_prev) and on the
    # final step (h → ∞ makes the extrapolation diverge; first-order is
    # the standard lower_order_final choice)
    w = _np.zeros(S)
    if S > 2:
        w[1:-1] = 0.5 * h[1:-1] / h[:-2]

    dt = x_init.dtype
    coef = (
        jnp.asarray(ts_np.astype(_np.int32)),
        jnp.asarray(sigma, dtype=dt), jnp.asarray(alpha, dtype=dt),
        jnp.asarray(c_x, dtype=dt), jnp.asarray(c_m, dtype=dt),
        jnp.asarray(w, dtype=dt),
    )

    def step(carry, per_step):
        x, m_prev = carry
        t_scalar, sig_i, alp_i, cx_i, cm_i, w_i = per_step
        t = jnp.full((B,), t_scalar, dtype=jnp.int32)
        eps = cfg_eps(
            eps_fn, x, t, y, cond_vals, cond_mask,
            guidance_scale=guidance_scale, null_label=null_label,
        )
        m = (x - sig_i * eps) / alp_i
        d = m + w_i * (m - m_prev)
        x_next = cx_i * x + cm_i * d
        return (x_next, m), None

    (x_final, _), _ = jax.lax.scan(step, (x_init, jnp.zeros_like(x_init)),
                                   coef)
    return x_final


def sample_loop_with_snapshots(
    schedule: DiffusionSchedule,
    eps_fn: EpsFn,
    x_init: jnp.ndarray,
    key: jax.Array,
    snapshot_ts: jnp.ndarray,
    y: Optional[jnp.ndarray] = None,
    cond_vals: Optional[jnp.ndarray] = None,
    cond_mask: Optional[jnp.ndarray] = None,
    guidance_scale: float = 0.0,
    null_label: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Reverse diffusion that also returns x_t at selected timesteps.

    TPU-native replacement for ``generate_steps.save_reverse_steps_for_csv_row``
    (/root/reference/generate_steps.py:154-189): instead of syncing to host
    every step, the scan writes x_t (captured BEFORE the denoise step, matching
    the reference's "t1000.png is pure noise" convention) into a preallocated
    device buffer; the host fetches once at the end.

    ``snapshot_ts``: int32 (S,) of 1-indexed timesteps to capture, any order.
    Returns ``(x_final, snapshots)`` with snapshots shape ``(S,) + x.shape``.
    """
    B = x_init.shape[0]
    T = schedule.num_timesteps
    snapshot_ts = jnp.asarray(snapshot_ts, dtype=jnp.int32)
    S = snapshot_ts.shape[0]
    if y is None:
        y = jnp.full((B,), null_label, dtype=jnp.int32)
        guidance_scale = 0.0

    snaps0 = jnp.zeros((S,) + x_init.shape, dtype=x_init.dtype)

    def step(carry, i):
        x, snaps = carry
        t_scalar = T - i
        # capture x_t before the step, in every slot whose timestep matches
        match = (snapshot_ts == t_scalar).astype(x.dtype)  # (S,)
        snaps = snaps + match.reshape((S,) + (1,) * x.ndim) * x[None]
        t = jnp.full((B,), t_scalar, dtype=jnp.int32)
        eps = cfg_eps(
            eps_fn, x, t, y, cond_vals, cond_mask,
            guidance_scale=guidance_scale, null_label=null_label,
        )
        step_key = jax.random.fold_in(key, i)
        noise = jax.random.normal(step_key, x.shape, dtype=x.dtype)
        x_next = ddpm_posterior_step(schedule, x, t, eps, noise)
        return (x_next, snaps), None

    (x_final, snaps), _ = jax.lax.scan(step, (x_init, snaps0), jnp.arange(T))
    return x_final, snaps

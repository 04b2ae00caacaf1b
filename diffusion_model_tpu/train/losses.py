"""Training losses (reference /root/reference/losses/geom_losses.py:4-17)."""
from __future__ import annotations

import jax.numpy as jnp


def masked_geom_mse(
    geom_pred: jnp.ndarray,   # (B, K)
    geom_gt: jnp.ndarray,     # (B, K)
    geom_mask: jnp.ndarray,   # (B, K) 0/1
    eps: float = 1e-6,
) -> jnp.ndarray:
    """sum(mask · (pred − gt)²) / max(sum(mask), eps)."""
    num = jnp.sum(jnp.square(geom_pred - geom_gt) * geom_mask)
    den = jnp.maximum(jnp.sum(geom_mask), eps)
    return num / den


def masked_geom_mae(
    geom_pred: jnp.ndarray,   # (B, K)
    geom_gt: jnp.ndarray,     # (B, K)
    geom_mask: jnp.ndarray,   # (B, K) 0/1
    eps: float = 1e-6,
) -> jnp.ndarray:
    """Masked mean absolute error of the geometry-head prediction —
    the geom-accuracy metric (in normalized [0,1] coordinate units) reported
    alongside the val loss. No reference counterpart (the reference never
    measures geom-head accuracy); defined to mirror ``masked_geom_mse``."""
    num = jnp.sum(jnp.abs(geom_pred - geom_gt) * geom_mask)
    den = jnp.maximum(jnp.sum(geom_mask), eps)
    return num / den


def snr_loss_weights(
    schedule,                 # DiffusionSchedule
    t: jnp.ndarray,           # (B,) 1-indexed timesteps
    prediction_type: str = "epsilon",
    weighting: str = "uniform",
    snr_gamma: float = 5.0,
) -> jnp.ndarray:
    """Per-sample weights ``w(t)`` for the noise-regression MSE.

    ``weighting="uniform"`` returns ones — the reference's (implicit)
    weighting (/root/reference/train_latent_cond.py:151-159 uses a plain
    MSE). ``weighting="min_snr"`` is the min-SNR-γ truncation of Hang et
    al. 2023 (arXiv:2303.09556): treating each timestep's denoising as one
    task in a multi-task objective, clamp its effective weight so easy
    (high-SNR, low-t) steps cannot dominate training. With
    ``SNR(t) = ᾱ_t / (1 − ᾱ_t)``:

    - ε-prediction: ``w = min(SNR, γ) / SNR`` (the ε-MSE already carries an
      implicit ×SNR relative to the x₀-MSE, so dividing by SNR converts the
      clamped x₀-weight back to ε-space);
    - v-prediction: ``w = min(SNR, γ) / (SNR + 1)`` (the v-MSE carries an
      implicit ×(SNR+1)).

    Pure function of the (static) schedule and the traced ``t`` — the
    gather and two elementwise ops fuse into the loss kernel under jit.
    """
    if weighting == "uniform":
        return jnp.ones(t.shape, jnp.float32)
    if weighting != "min_snr":
        raise ValueError(f"unknown loss weighting {weighting!r}")
    ab = schedule.alpha_bar(t).astype(jnp.float32)
    snr = ab / jnp.maximum(1.0 - ab, 1e-12)
    if prediction_type == "v":
        return jnp.minimum(snr, snr_gamma) / (snr + 1.0)
    return jnp.minimum(snr, snr_gamma) / jnp.maximum(snr, 1e-12)


def weighted_noise_mse(
    eps_pred: jnp.ndarray,    # (B, ...) prediction (ε- or v-space)
    target: jnp.ndarray,      # (B, ...) regression target
    weights: jnp.ndarray,     # (B,) per-sample weights
) -> jnp.ndarray:
    """mean_b( w_b · mean_pix((pred_b − target_b)²) ). With unit weights
    this equals the plain ``mean(square(pred − target))`` the reference
    computes (all samples have equal pixel counts)."""
    per = jnp.mean(
        jnp.square(eps_pred - target).reshape(eps_pred.shape[0], -1), axis=1
    )
    return jnp.mean(weights * per)


def per_class_noise_loss(
    eps_pred: jnp.ndarray,    # (B, ...) prediction
    noise: jnp.ndarray,       # (B, ...) target
    y: jnp.ndarray,           # (B,) class ids (1-indexed)
    num_classes: int = 3,
) -> tuple:
    """Per-class ε-MSE sums and counts for class-imbalance diagnostics
    (VERDICT r2: line-class regressions were invisible to the global loss).

    Returns ``(sums, counts)`` each shaped (num_classes,), class c at
    index c-1; divide after accumulating over steps."""
    per_sample = jnp.mean(
        jnp.square(eps_pred - noise).reshape(eps_pred.shape[0], -1), axis=1
    )
    onehot = (y[:, None] == jnp.arange(1, num_classes + 1)[None, :])
    onehot = onehot.astype(per_sample.dtype)
    return per_sample @ onehot, jnp.sum(onehot, axis=0)

"""Noise schedule for DDPM diffusion.

Capability parity with the reference ``Diffuser`` constructor
(/root/reference/diff.py:11-16): linear betas in ``[beta_start, beta_end]``
over ``num_timesteps`` steps, ``alphas = 1 - betas`` and
``alpha_bars = cumprod(alphas)``.

Conventions (shared with the reference, see SURVEY.md §1):
- timesteps are **1-indexed**: ``t ∈ [1, T]``; array index is ``t - 1``.
- ``alpha_bar_prev`` at ``t == 1`` is clamped to index 0 (the reference reads
  ``alpha_bars[-1]`` there, harmlessly masked by zeroed noise — we fix it,
  see diff.py:39 vs diff.py:144).

Everything here is a pure function of static configuration, so schedules are
computed once with NumPy at trace time and baked into the jitted programs as
constants; nothing is recomputed per step on device.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """Precomputed linear-beta DDPM schedule.

    Attributes are NumPy float32 arrays of shape ``(num_timesteps,)`` indexed
    by ``t - 1``; they become XLA constants when captured inside ``jit``.
    """

    num_timesteps: int
    betas: np.ndarray
    alphas: np.ndarray
    alpha_bars: np.ndarray

    @classmethod
    def create(
        cls,
        num_timesteps: int = 1000,
        beta_start: float = 1e-4,
        beta_end: float = 0.02,
        kind: str = "linear",
        cosine_s: float = 0.008,
    ) -> "DiffusionSchedule":
        """``kind="linear"`` is the reference schedule (diff.py:11-16).
        ``kind="cosine"`` is the Nichol & Dhariwal (2021) improved-DDPM
        schedule — ᾱ(t) = cos²(((t/T + s)/(1 + s))·π/2), betas derived as
        1 − ᾱ_t/ᾱ_{t−1} and clipped to ≤0.999. Beyond-reference option:
        every sampler (DDPM/DDIM/DPM++/cached) reads only betas/ᾱ, so the
        schedule choice composes with all of them."""
        if kind == "linear":
            betas = np.linspace(beta_start, beta_end, num_timesteps,
                                dtype=np.float64)
        elif kind == "cosine":
            def f(u):
                return np.cos((u + cosine_s) / (1.0 + cosine_s)
                              * np.pi / 2.0) ** 2
            ts = np.arange(num_timesteps + 1, dtype=np.float64)
            ab = f(ts / num_timesteps) / f(0.0)
            betas = np.clip(1.0 - ab[1:] / ab[:-1], 0.0, 0.999)
        else:
            raise ValueError(f"unknown schedule kind {kind!r}")
        alphas = 1.0 - betas
        alpha_bars = np.cumprod(alphas)
        return cls(
            num_timesteps=num_timesteps,
            betas=betas.astype(np.float32),
            alphas=alphas.astype(np.float32),
            alpha_bars=alpha_bars.astype(np.float32),
        )

    # ---- indexed lookups (t is 1-indexed, may be traced) ----
    def alpha(self, t: jnp.ndarray) -> jnp.ndarray:
        return jnp.asarray(self.alphas)[t - 1]

    def alpha_bar(self, t: jnp.ndarray) -> jnp.ndarray:
        return jnp.asarray(self.alpha_bars)[t - 1]

    def alpha_bar_prev(self, t: jnp.ndarray) -> jnp.ndarray:
        """ᾱ_{t-1}, clamped so that t=1 reads ᾱ_1's predecessor as index 0."""
        idx = jnp.clip(t - 2, 0, self.num_timesteps - 1)
        return jnp.asarray(self.alpha_bars)[idx]

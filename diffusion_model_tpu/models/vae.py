"""Convolutional VAE: 224×224×3 images ↔ 28×28×4 latents (÷8 spatial).

Capability parity with /root/reference/models/vae.py:6-76 (note its docstring
claims ÷4 but the code has three stride-2 stages — SURVEY.md §1): encoder of
three (conv3×3 s1 → GN(8)+GELU → conv4×4 s2 → GN(8)+GELU) stages doubling
channels 64→128→256, 1×1 convs to μ/logvar with logvar clamped to [-30, 20],
reparameterization, SD-style ``scale_factor=0.18215`` applied at encode and
inverted at decode, decoder mirroring with ×2 transposed convs and a final
sigmoid, per-pixel-normalized KL, ``loss = MSE + 1e-6·KL``.

TPU-first notes: NHWC layout; the stride-2 4×4 convs and transposed convs map
directly onto the MXU; compute dtype is configurable (bf16 for the frozen
encode inside the latent train step and the decode tail of sampling).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import TorchGroupNorm

Dtype = Any


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    z_channels: int = 4
    base_channels: int = 64
    scale_factor: float = 0.18215
    kl_weight: float = 1e-6
    gn_groups: int = 8
    dtype: Any = jnp.float32
    use_pallas: Optional[bool] = None

    def latent_hw(self, h: int, w: int) -> Tuple[int, int]:
        """Spatial latent size for an input (three stride-2 stages → ÷8)."""
        return h // 8, w // 8


class Encoder(nn.Module):
    config: VAEConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cfg = self.config
        dt = cfg.dtype
        b = cfg.base_channels
        h = x.astype(dt)
        for i, ch in enumerate((b, b * 2, b * 4)):
            h = nn.Conv(ch, (3, 3), padding=1, dtype=dt,
                        name=f"conv{i}a")(h)
            h = TorchGroupNorm(cfg.gn_groups, apply_gelu=True,
                               use_pallas=cfg.use_pallas, name=f"gn{i}a")(h)
            h = nn.Conv(ch, (4, 4), strides=(2, 2), padding=1, dtype=dt,
                        name=f"conv{i}b")(h)
            h = TorchGroupNorm(cfg.gn_groups, apply_gelu=True,
                               use_pallas=cfg.use_pallas, name=f"gn{i}b")(h)
        mu = nn.Conv(cfg.z_channels, (1, 1), dtype=dt, name="to_mu")(h)
        logvar = nn.Conv(cfg.z_channels, (1, 1), dtype=dt, name="to_logvar")(h)
        logvar = jnp.clip(logvar.astype(jnp.float32), -30.0, 20.0)
        return mu.astype(jnp.float32), logvar


class Decoder(nn.Module):
    config: VAEConfig

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        dt = cfg.dtype
        b = cfg.base_channels
        h = z.astype(dt)
        for i, (conv_ch, up_ch) in enumerate(
            ((b * 4, b * 4), (b * 2, b * 2), (b, b))
        ):
            h = nn.Conv(conv_ch, (3, 3), padding=1, dtype=dt,
                        name=f"conv{i}")(h)
            h = TorchGroupNorm(cfg.gn_groups, apply_gelu=True,
                               use_pallas=cfg.use_pallas, name=f"gn{i}a")(h)
            h = nn.ConvTranspose(up_ch, (4, 4), strides=(2, 2),
                                 padding="SAME", dtype=dt, name=f"up{i}")(h)
            h = TorchGroupNorm(cfg.gn_groups, apply_gelu=True,
                               use_pallas=cfg.use_pallas, name=f"gn{i}b")(h)
        h = nn.Conv(cfg.in_channels, (3, 3), padding=1, dtype=dt,
                    name="out")(h)
        return jax.nn.sigmoid(h.astype(jnp.float32))


class VAE(nn.Module):
    """Methods mirror the reference surface: ``encode``/``decode``/``__call__``.

    ``encode`` consumes the ``sample`` RNG stream for reparameterization; use
    ``apply(..., method=VAE.encode, rngs={"sample": key})`` or
    ``encode_stats`` + explicit noise for a deterministic path.
    """

    config: VAEConfig = VAEConfig()

    def setup(self):
        self.encoder = Encoder(self.config)
        self.decoder = Decoder(self.config)

    def encode_stats(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return self.encoder(x)

    def encode(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (z, kl): scaled latent sample and mean per-pixel KL
        (vae.py:51-62)."""
        mu, logvar = self.encoder(x)
        std = jnp.exp(0.5 * logvar)
        eps = jax.random.normal(self.make_rng("sample"), std.shape,
                                dtype=jnp.float32)
        z = (mu + eps * std) * self.config.scale_factor
        kl = 0.5 * jnp.sum(
            jnp.exp(logvar) + jnp.square(mu) - 1.0 - logvar, axis=(1, 2, 3)
        ) / (x.shape[1] * x.shape[2])
        return z, kl.mean()

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        """Scaled latent → image in [0, 1] (vae.py:64-69)."""
        return self.decoder(z / self.config.scale_factor)

    def __call__(self, x: jnp.ndarray):
        """Returns (x_recon, z, loss, aux) with loss = MSE + 1e-6·KL
        (vae.py:71-76)."""
        z, kl = self.encode(x)
        x_recon = self.decode(z)
        recon_mse = jnp.mean(jnp.square(x_recon - x))
        loss = recon_mse + self.config.kl_weight * kl
        return x_recon, z, loss, {"recon_mse": recon_mse, "kl": kl}

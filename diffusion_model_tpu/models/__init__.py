from .layers import (
    AttentionBlock,
    Down,
    ResBlock,
    TimeEmbedAdd,
    TorchGroupNorm,
    Up,
    sinusoidal_time_embedding,
)
from .unet import CondUNet, GeomHead, UNetConfig, make_unet, make_unet_cond_with_geom_head
from .vae import VAE, VAEConfig

__all__ = [
    "AttentionBlock", "Down", "ResBlock", "TimeEmbedAdd", "TorchGroupNorm",
    "Up", "sinusoidal_time_embedding",
    "CondUNet", "GeomHead", "UNetConfig", "make_unet",
    "make_unet_cond_with_geom_head",
    "VAE", "VAEConfig",
]

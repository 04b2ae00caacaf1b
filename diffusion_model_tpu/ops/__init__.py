from .resize import (
    pad_to_match,
    upsample2x,
    upsample_bilinear_align_corners,
)
from .groupnorm import group_norm, group_norm_pallas, group_norm_reference
from .resblock import resblock, resblock_pallas, resblock_reference
from .attention import (
    attention_block,
    attention_block_pallas,
    attention_block_reference,
)

__all__ = [
    "resblock", "resblock_pallas", "resblock_reference",
    "pad_to_match",
    "upsample2x",
    "upsample_bilinear_align_corners",
    "group_norm",
    "group_norm_pallas",
    "group_norm_reference",
    "attention_block",
    "attention_block_pallas",
    "attention_block_reference",
]

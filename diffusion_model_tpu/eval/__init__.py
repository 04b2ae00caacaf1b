from .metrics import (
    compute_metrics,
    far_noise_ratio,
    gaussian_weighted_recall,
    load_binary_mask,
    mask_to_pil,
    mean_std,
    overdraw_rate,
    quantiles,
    save_diff_visual,
    save_side_by_side,
    distance_map_to_gt,
)
from .iou_noise import evaluate_dirs, pair_files
from .recon_check import image_grid, recon_check
from . import native

__all__ = [
    "compute_metrics", "far_noise_ratio", "gaussian_weighted_recall",
    "load_binary_mask", "mask_to_pil", "mean_std", "overdraw_rate",
    "quantiles", "save_diff_visual", "save_side_by_side",
    "distance_map_to_gt", "evaluate_dirs", "pair_files", "image_grid",
    "recon_check", "native",
]

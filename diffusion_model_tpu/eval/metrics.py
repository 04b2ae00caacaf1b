"""Generation-quality metrics: IoU / GT-IoU / far-noise-ratio / Gaussian-
weighted recall.

Numeric parity with /root/reference/eval_iou_noise.py:77-297, with the
per-pair heavy lifting (EDT + counters) done by the native C++ core
(eval/native.py; scipy fallback).

Conventions preserved exactly:
- ``iou``: inter/union; both masks empty → 1.0 (eval_iou_noise.py:250)
- ``gt_iou``: inter/gt_area; empty GT → 1.0 (:253)
- ``far_noise_ratio``: |pred ∧ dist>σ| / |pred|; empty pred → 0.0 (:211-232)
- ``gauss_recall``: Σ_pred exp(−d²/2σ²) / |gt|; empty GT → 1.0 (:185-208)
- summary stats: mean/std (ddof=0), median/p90/p95, overdraw-rate(>1)
  (:275-297)
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np
from PIL import Image

from . import native


def load_binary_mask(
    image_path, threshold: int = 128, *, invert: bool
) -> np.ndarray:
    """Grayscale → bool mask; invert=True treats dark pixels as foreground
    (line art / CAD convention, eval_iou_noise.py:77-94).

    ``invert`` is keyword-required on purpose: the reference's *library*
    default (True, eval_iou_noise.py:80) and its *CLI* default (False via
    a store_true flag, eval_iou_noise.py:309) disagree, so any default
    here silently picks a side and misbinarizes half the use cases.
    Black-on-white line art wants ``invert=True``."""
    img = Image.open(image_path).convert("L")
    arr = np.array(img, dtype=np.uint8)
    return native.binarize_bytes(arr, threshold, invert)


def mask_to_pil(mask: np.ndarray) -> Image.Image:
    return Image.fromarray(mask.astype(np.uint8) * 255, mode="L")


def save_side_by_side(gt_mask, gen_mask, out_path) -> None:
    """Left = GT, right = GEN (eval_iou_noise.py:103-119)."""
    gt_img = mask_to_pil(gt_mask)
    gen_img = mask_to_pil(gen_mask)
    w, h = gt_img.size
    if gen_img.size != (w, h):
        gen_img = gen_img.resize((w, h), resample=Image.NEAREST)
    canvas = Image.new("L", (w * 2, h), color=0)
    canvas.paste(gt_img, (0, 0))
    canvas.paste(gen_img, (w, 0))
    canvas.save(out_path)


def save_diff_visual(gt_mask, gen_mask, out_path) -> None:
    """White bg; TP black, FN blue, FP red (eval_iou_noise.py:122-156)."""
    tp = np.logical_and(gt_mask, gen_mask)
    fn = np.logical_and(gt_mask, ~gen_mask)
    fp = np.logical_and(gen_mask, ~gt_mask)
    h, w = gt_mask.shape
    rgb = np.full((h, w, 3), 255, dtype=np.uint8)
    rgb[tp] = (0, 0, 0)
    rgb[fn] = (0, 0, 255)
    rgb[fp] = (255, 0, 0)
    Image.fromarray(rgb, mode="RGB").save(out_path)


def distance_map_to_gt(gt_mask: np.ndarray) -> np.ndarray:
    """Distance to GT foreground (native EDT; scipy fallback)."""
    return native.distance_map(gt_mask)


def gaussian_weighted_recall(gt, pred, sigma: float = 2.0) -> float:
    if sigma <= 0:
        raise ValueError("sigma must be > 0")
    c = native.pair_counts(gt, pred, sigma)
    if c["gt_area"] == 0:
        return 1.0
    return float(c["gauss_sum"] / c["gt_area"])


def far_noise_ratio(gt, pred, sigma: float = 2.0) -> float:
    if sigma <= 0:
        raise ValueError("sigma must be > 0")
    c = native.pair_counts(gt, pred, sigma)
    if c["pred_area"] == 0:
        return 0.0
    return float(c["far_noise"] / c["pred_area"])


def compute_metrics(gt: np.ndarray, pred: np.ndarray,
                    sigma: float = 2.0) -> Dict[str, float]:
    """All per-pair metrics from ONE native pass (the reference computes the
    EDT twice per pair — far_noise_ratio and gauss_recall each rebuild it,
    eval_iou_noise.py:256-259)."""
    if gt.shape != pred.shape:
        raise ValueError(f"Shape mismatch: gt{gt.shape} vs pred{pred.shape}")
    if sigma <= 0:
        raise ValueError("sigma must be > 0")
    c = native.pair_counts(gt, pred, sigma)
    iou = c["inter"] / c["union"] if c["union"] > 0 else 1.0
    gt_iou = c["inter"] / c["gt_area"] if c["gt_area"] > 0 else 1.0
    fnr = c["far_noise"] / c["pred_area"] if c["pred_area"] > 0 else 0.0
    gr = c["gauss_sum"] / c["gt_area"] if c["gt_area"] > 0 else 1.0
    return {
        "iou": float(iou),
        "gt_iou": float(gt_iou),
        "far_noise_ratio": float(fnr),
        "gauss_recall": float(gr),
        "inter": c["inter"],
        "union": c["union"],
        "gt_area": c["gt_area"],
        "pred_area": c["pred_area"],
        "fp": c["fp"],
    }


def mean_std(x: np.ndarray) -> Tuple[float, float]:
    if x.size == 0:
        return float("nan"), float("nan")
    return float(x.mean()), float(x.std(ddof=0))


def quantiles(x: np.ndarray, ps: List[float]) -> Dict[str, float]:
    if x.size == 0:
        return {f"p{int(p)}": float("nan") for p in ps}
    vals = np.percentile(x, ps)
    return {f"p{int(p)}": float(v) for p, v in zip(ps, vals)}


def overdraw_rate(x: np.ndarray, threshold: float = 1.0) -> float:
    if x.size == 0:
        return float("nan")
    return float((x > threshold).mean())

"""Diversity check for a generated image set (VERDICT r4 next #1).

A distilled deterministic sampler that "beats its teacher" on recall
could do so by mode-collapsing onto a few easy shapes. This measures
within-class diversity as the mean pairwise IoU between binarized
generated images (sampled pairs): near-identical outputs → IoU → 1,
healthy conditioned variety → low IoU (every image is a different
line/circle/arc placement). Compared side by side for two directories
(teacher vs student) the stat says whether the student's quality win
came with a diversity loss.

Binarization matches the eval pipeline (threshold 128, invert — black
strokes on white, /root/reference/eval_iou_noise.py:77-94).

Usage:
  python scripts/diversity_stat.py \
      --dirs quality_r2/generated_by_cond/continued_cos_ema/line \
             quality_r2/generated_by_cond/distill8_cos/line \
      --labels teacher student
"""
from __future__ import annotations

import argparse
import itertools
import json
import os

import numpy as np
from PIL import Image


def pairwise_iou(d: str, max_pairs: int, seed: int) -> dict:
    files = sorted(f for f in os.listdir(d) if f.endswith(".png"))
    masks = []
    for f in files:
        g = np.asarray(Image.open(os.path.join(d, f)).convert("L"))
        masks.append(g < 128)  # invert: ink is dark
    rng = np.random.default_rng(seed)
    pairs = list(itertools.combinations(range(len(masks)), 2))
    if len(pairs) > max_pairs:
        pairs = [pairs[i] for i in
                 rng.choice(len(pairs), size=max_pairs, replace=False)]
    ious = []
    for i, j in pairs:
        inter = np.logical_and(masks[i], masks[j]).sum()
        union = np.logical_or(masks[i], masks[j]).sum()
        ious.append(inter / union if union else 0.0)
    ink = [float(m.mean()) for m in masks]
    return {
        "n_images": len(masks),
        "n_pairs": len(pairs),
        "pairwise_iou_mean": round(float(np.mean(ious)), 4),
        "pairwise_iou_p95": round(float(np.percentile(ious, 95)), 4),
        "ink_fraction_mean": round(float(np.mean(ink)), 5),
        "ink_fraction_std": round(float(np.std(ink)), 5),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dirs", nargs="+", required=True)
    ap.add_argument("--labels", nargs="+", default=None)
    ap.add_argument("--max_pairs", type=int, default=2000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    labels = args.labels or [os.path.basename(os.path.dirname(d)) + "/" +
                             os.path.basename(d) for d in args.dirs]
    out = {}
    for lab, d in zip(labels, args.dirs):
        out[lab] = pairwise_iou(d, args.max_pairs, args.seed)
        print(lab, out[lab], flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()

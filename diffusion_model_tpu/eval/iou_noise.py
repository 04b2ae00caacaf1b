"""IoU / noise evaluation pipeline — flag- and layout-compatible with the
reference CLI (/root/reference/eval_iou_noise.py:303-486).

Pairing rule: ``p{idx}.jpg`` (GT) ↔ ``pic{idx+1}.png`` (generated)
(eval_iou_noise.py:34-49, 348-356). Outputs under
``<out_dir>/run_<YYYYMMDD_HHMMSS>/``: metrics_detail.csv,
metrics_summary.csv (both utf-8-sig), config.txt, binarized/{gt,gen,pair}/
PNGs, optional diff/ visuals (:326-340, 457-477).

TPU-native-framework upgrades over the reference: per-pair work (native EDT
+ counters + PNG writes) fans out over a thread pool (the C++ core releases
the GIL), and each pair computes its EDT once instead of twice.
"""
from __future__ import annotations

import argparse
import re
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Dict, List, Tuple

import numpy as np
import pandas as pd

from ..utils.env import timestamp_run_name
from . import native
from .metrics import (
    compute_metrics,
    load_binary_mask,
    mask_to_pil,
    mean_std,
    overdraw_rate,
    quantiles,
    save_diff_visual,
    save_side_by_side,
)

P_GT = re.compile(r"^p(\d+)\.jpg$", re.IGNORECASE)
P_GEN = re.compile(r"^pic(\d+)\.png$", re.IGNORECASE)


def list_indexed_files(d: Path, pattern: re.Pattern) -> List[Tuple[int, Path]]:
    files = []
    for p in d.iterdir():
        if p.is_file():
            m = pattern.match(p.name)
            if m:
                files.append((int(m.group(1)), p))
    files.sort(key=lambda x: x[0])
    return files


def pair_files(
    gt_dir: Path, gen_dir: Path
) -> Tuple[List[Tuple[int, Path, Path]], int]:
    """gen_idx = gt_idx + 1 pairing; returns (pairs, n_missing)."""
    gt_list = list_indexed_files(gt_dir, P_GT)
    gen_map = {i: p for i, p in list_indexed_files(gen_dir, P_GEN)}
    pairs, missing = [], 0
    for gt_idx, gt_path in gt_list:
        gen_path = gen_map.get(gt_idx + 1)
        if gen_path is None:
            missing += 1
            continue
        pairs.append((gt_idx, gt_path, gen_path))
    return pairs, missing


def evaluate_dirs(
    gt_dir: str,
    gen_dir: str,
    out_dir: str,
    threshold: int = 128,
    invert: bool = False,
    sigma: float = 2.0,
    max_pairs: int = -1,
    save_diff: bool = False,
    workers: int = 8,
) -> Dict:
    """Run the full evaluation; returns {'run_dir', 'detail', 'summary'}."""
    gt_dir_p, gen_dir_p = Path(gt_dir), Path(gen_dir)
    if not gt_dir_p.exists():
        raise FileNotFoundError(f"gt_dir not found: {gt_dir_p}")
    if not gen_dir_p.exists():
        raise FileNotFoundError(f"gen_dir not found: {gen_dir_p}")

    out_root = Path(out_dir)
    out_root.mkdir(parents=True, exist_ok=True)
    run_dir = out_root / timestamp_run_name()
    run_dir.mkdir(parents=True, exist_ok=True)
    bin_gt_dir = run_dir / "binarized" / "gt"
    bin_gen_dir = run_dir / "binarized" / "gen"
    bin_pair_dir = run_dir / "binarized" / "pair"
    for d in (bin_gt_dir, bin_gen_dir, bin_pair_dir):
        d.mkdir(parents=True, exist_ok=True)
    diff_dir = run_dir / "diff"
    if save_diff:
        diff_dir.mkdir(parents=True, exist_ok=True)

    pairs, missing = pair_files(gt_dir_p, gen_dir_p)
    if max_pairs is not None and max_pairs > 0:
        pairs = pairs[:max_pairs]
    if not pairs:
        raise RuntimeError(
            "No valid pairs found. Expected GT p00000.jpg... and generated "
            "pic1.png... with pairing p00000 <-> pic1, p00001 <-> pic2, ..."
        )

    def process(pair):
        gt_idx, gt_path, gen_path = pair
        gt_mask = load_binary_mask(gt_path, threshold=threshold, invert=invert)
        gen_mask = load_binary_mask(gen_path, threshold=threshold,
                                    invert=invert)
        gt_bin_path = bin_gt_dir / f"{gt_path.stem}_bin.png"
        gen_bin_path = bin_gen_dir / f"{gen_path.stem}_bin.png"
        mask_to_pil(gt_mask).save(gt_bin_path)
        mask_to_pil(gen_mask).save(gen_bin_path)
        pair_path = bin_pair_dir / f"pair_gt{gt_idx:05d}_vs_{gen_path.stem}.png"
        save_side_by_side(gt_mask, gen_mask, pair_path)
        diff_path = None
        if save_diff:
            diff_path = diff_dir / f"diff_gt{gt_idx:05d}_vs_{gen_path.stem}.png"
            save_diff_visual(gt_mask, gen_mask, diff_path)
        m = compute_metrics(gt_mask, gen_mask, sigma=sigma)
        return {
            "gt_index": gt_idx,
            "gt_file": gt_path.name,
            "gen_file": gen_path.name,
            "gt_bin": str(gt_bin_path.relative_to(run_dir)),
            "gen_bin": str(gen_bin_path.relative_to(run_dir)),
            "pair_bin": str(pair_path.relative_to(run_dir)),
            "diff_bin": str(diff_path.relative_to(run_dir)) if diff_path else "",
            **m,
        }

    with ThreadPoolExecutor(max_workers=max(1, workers)) as ex:
        rows = list(ex.map(process, pairs))
    rows.sort(key=lambda r: r["gt_index"])
    df = pd.DataFrame(rows)

    iou_mean, iou_std = mean_std(df["iou"].to_numpy(np.float64))
    gt_iou_mean, gt_iou_std = mean_std(df["gt_iou"].to_numpy(np.float64))
    fnr = df["far_noise_ratio"].to_numpy(np.float64)
    fnr_mean, fnr_std = mean_std(fnr)
    fnr_q = quantiles(fnr, [50, 90, 95])
    gr = df["gauss_recall"].to_numpy(np.float64)
    gr_mean, gr_std = mean_std(gr)
    gr_q = quantiles(gr, [50, 90, 95])
    od = overdraw_rate(gr, threshold=1.0)

    summary = pd.DataFrame([{
        "n_pairs": int(len(df)),
        "missing_pairs_skipped": int(missing),
        "threshold": int(threshold),
        "invert": bool(invert),
        "sigma": float(sigma),
        "distance_backend": native.backend(),
        "iou_mean": iou_mean, "iou_std": iou_std,
        "gt_iou_mean": gt_iou_mean, "gt_iou_std": gt_iou_std,
        "far_noise_ratio_mean": fnr_mean,
        "far_noise_ratio_std": fnr_std,
        "far_noise_ratio_median": fnr_q["p50"],
        "far_noise_ratio_p90": fnr_q["p90"],
        "far_noise_ratio_p95": fnr_q["p95"],
        "gauss_recall_mean": gr_mean, "gauss_recall_std": gr_std,
        "gauss_recall_median": gr_q["p50"],
        "gauss_recall_p90": gr_q["p90"],
        "gauss_recall_p95": gr_q["p95"],
        "gauss_overdraw_rate_gt1": od,
        "run_dir": str(run_dir),
    }])

    detail_path = run_dir / "metrics_detail.csv"
    summary_path = run_dir / "metrics_summary.csv"
    df.to_csv(detail_path, index=False, encoding="utf-8-sig")
    summary.to_csv(summary_path, index=False, encoding="utf-8-sig")

    (run_dir / "config.txt").write_text(
        "\n".join([
            f"gt_dir={gt_dir_p}",
            f"gen_dir={gen_dir_p}",
            f"threshold={threshold}",
            f"invert={bool(invert)}",
            f"sigma={sigma}",
            f"distance_backend={native.backend()}",
            f"max_pairs={max_pairs}",
            f"save_diff={bool(save_diff)}",
            f"missing_pairs_skipped={missing}",
        ]) + "\n",
        encoding="utf-8",
    )

    print(f"[OK] run_dir: {run_dir}")
    print(f"[OK] detail:  {detail_path}")
    print(f"[OK] summary: {summary_path}")
    print(summary.to_string(index=False))
    return {"run_dir": str(run_dir), "detail": df, "summary": summary}


def build_parser() -> argparse.ArgumentParser:
    """Flag parity with eval_iou_noise.py:304-313."""
    ap = argparse.ArgumentParser(
        description="IoU / far-noise / gaussian-recall evaluation"
    )
    ap.add_argument("--gt_dir", type=str, required=True,
                    help="ground-truth dir (p00000.jpg ...)")
    ap.add_argument("--gen_dir", type=str, required=True,
                    help="generated dir (pic1.png ...)")
    ap.add_argument("--out_dir", type=str, required=True,
                    help="output root (run_* created inside)")
    ap.add_argument("--threshold", type=int, default=128,
                    help="binarization threshold (0-255)")
    ap.add_argument("--invert", action="store_true",
                    help="treat dark pixels as foreground (line art)")
    ap.add_argument("--sigma", type=float, default=2.0,
                    help="gaussian recall sigma in px")
    ap.add_argument("--max_pairs", type=int, default=-1,
                    help="max pairs to evaluate (-1 = all)")
    ap.add_argument("--save_diff", action="store_true",
                    help="also save TP/FN/FP diff visuals")
    ap.add_argument("--workers", type=int, default=8,
                    help="thread-pool width for per-pair work")
    return ap


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    evaluate_dirs(
        gt_dir=args.gt_dir, gen_dir=args.gen_dir, out_dir=args.out_dir,
        threshold=args.threshold, invert=args.invert, sigma=args.sigma,
        max_pairs=args.max_pairs, save_diff=args.save_diff,
        workers=args.workers,
    )


if __name__ == "__main__":
    main()

"""Render the cross-stack quality-parity table (VERDICT r2 #2) from a
torch-reference run summary and a framework run summary produced on
identical data (seed-matched renders; verify with an md5 of any dataset
file). Both `scripts/torch_reference_run.py` and `scripts/quality_run.py`
write the same `metrics` schema per class.

Usage:
  python scripts/parity_table.py parity96b_torch/torch_ref_summary.json \
      parity96s_fw/quality_summary.json
"""
from __future__ import annotations

import json
import sys

KEYS = (
    ("iou_mean", "iou", False),
    ("gt_iou_mean", "gt_iou", False),
    ("far_noise_ratio_mean", "far_noise (lower better)", True),
    ("gauss_recall_mean", "gauss_recall", False),
    ("gauss_recall_median", "gauss_recall median", False),
)
CLASSES = ("line", "circle", "arc")


def main() -> None:
    torch_path, fw_path = sys.argv[1], sys.argv[2]
    with open(torch_path) as f:
        t = json.load(f)
    with open(fw_path) as f:
        w = json.load(f)
    tm, wm = t["metrics"], w["metrics"]

    print("| metric | " + " | ".join(
        f"torch {c} | fw {c}" for c in CLASSES) + " |")
    print("|---|" + "---|" * (2 * len(CLASSES)))
    fw_wins = 0
    cells = 0
    for key, label, lower_better in KEYS:
        row = [label]
        for c in CLASSES:
            tv, wv = tm[c][key], wm[c][key]
            better_fw = (wv < tv) if lower_better else (wv > tv)
            if key != "gauss_recall_median":
                cells += 1
                fw_wins += int(better_fw)
            row.append(f"{tv:.4f}")
            row.append(f"**{wv:.4f}**" if better_fw else f"{wv:.4f}")
        print("| " + " | ".join(row) + " |")
    print(f"\nframework better in {fw_wins}/{cells} mean cells "
          f"(bold = framework better; medians informational)")
    for name, s in (("torch", t), ("fw", w)):
        total = s.get("latent_s", 0) + s.get("vae_s", 0) + s.get("gen_s", 0)
        print(f"{name}: vae_s={s.get('vae_s')} latent_s={s.get('latent_s')} "
              f"gen_s={s.get('gen_s')} total~{round(total)}s")


if __name__ == "__main__":
    main()

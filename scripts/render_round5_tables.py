"""Render the round-5 BASELINE.md tables from the committed cert JSONs.

Reads the queue's artifacts (continue_summary_cos.json,
teacher_ddim8_cert.json, distill8_cos_cert.json, line_guidance_sweep
.json, diversity_distill8.json) and prints ready-to-paste markdown, so
the doc pass cannot diverge from the committed evidence (the round-4
gap VERDICT flagged).

Usage: python scripts/render_round5_tables.py [--root quality_r2]
"""
from __future__ import annotations

import argparse
import json
import os

KEYS = (("gauss_recall_mean", "gauss_recall"),
        ("far_noise_ratio_mean", "far_noise (↓)"),
        ("gt_iou_mean", "gt_iou"))
CLASSES = ("line", "circle", "arc")


def load(root, name):
    p = os.path.join(root, name)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def table(cols):
    """cols: list of (title, {cls: metricdict})."""
    out = ["| class | metric | " + " | ".join(t for t, _ in cols) + " |",
           "|---" * (2 + len(cols)) + "|"]
    for cls in CLASSES:
        for key, label in KEYS:
            cells = []
            for _, m in cols:
                v = (m or {}).get(cls, {}).get(key)
                cells.append("—" if v is None else f"{v:.3f}")
            out.append(f"| {cls} | {label} | " + " | ".join(cells) + " |")
    return "\n".join(out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="quality_r2")
    a = ap.parse_args()

    cont = load(a.root, "continue_summary_cos.json") or {}
    prior = load(a.root, "continue_summary.json") or {}
    teacher8 = load(a.root, "teacher_ddim8_cert.json") or {}
    student = load(a.root, "distill8_cos_cert.json") or {}
    sweep = load(a.root, "line_guidance_sweep.json") or {}
    div = load(a.root, "diversity_distill8.json") or {}

    print("### cos+EMA continuation (regenerated round 5)\n")
    print(table([("cont (prior)", prior.get("metrics")),
                 ("cos raw", cont.get("metrics")),
                 ("cos+EMA", cont.get("metrics_ema"))]))
    print(f"\ntrain_s={cont.get('train_s')}  "
          f"losses_every10 tail={ (cont.get('losses_every10') or [])[-3:] }\n")

    print("### distilled 8-step student vs teacher (same checkpoint line)\n")
    print(table([
        ("teacher DDPM-1000 CFG-3", cont.get("metrics_ema")),
        ("teacher DDIM-8-trailing CFG-3 (same-regime control)",
         teacher8.get("fast_metrics")),
        ("student DDIM-8-trailing no-CFG", student.get("fast_metrics")),
    ]))
    ws = student.get("warmup_s")
    gs = {c: (student.get("fast_metrics") or {}).get(c, {}).get("gen_s")
          for c in CLASSES}
    print(f"\nstudent warmup(compile)={ws}s, per-class gen_s={gs}\n")

    if sweep:
        print("### line guidance sweep (gauss_recall / far_noise / gt_iou)\n")
        for s, m in sorted(sweep.get("results", {}).items(),
                           key=lambda kv: float(kv[0])):
            print(f"  s={s}: {m.get('gauss_recall_mean')} / "
                  f"{m.get('far_noise_ratio_mean')} / {m.get('gt_iou_mean')}"
                  + ("  [baseline]" if m.get("source") else ""))
        print(f"  winner: {sweep.get('winner')}")
        print(f"  winner_confirm: {sweep.get('winner_confirm')}\n")

    if div:
        print("### diversity (pairwise IoU mean / ink fraction mean±std)\n")
        for lab, m in div.items():
            print(f"  {lab}: {m['pairwise_iou_mean']} / "
                  f"{m['ink_fraction_mean']}±{m['ink_fraction_std']}")


if __name__ == "__main__":
    main()

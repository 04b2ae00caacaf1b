"""Collect the round-3 queue's artifacts into one markdown summary.

The TPU work queue (scripts/round3_queue.sh) drops its outputs across
/tmp/r3queue logs and per-run JSON artifacts; this script gathers whatever
exists so BASELINE.md / PERFORMANCE.md tables can be updated in one pass
after the queue drains. Prints markdown; missing artifacts are listed at
the end so nothing silently drops out of the round report.

Usage: python scripts/collect_round3_results.py [--qlog /tmp/r3queue]
"""
from __future__ import annotations

import argparse
import glob
import json
import os


def _read_json(path):
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return None


def _bench_lines(log_path):
    """Every {"metric": ...} JSON line in a bench log (headline + extras)."""
    out = []
    try:
        with open(log_path) as f:
            for line in f:
                line = line.strip()
                if line.startswith("{") and '"metric"' in line:
                    try:
                        out.append(json.loads(line))
                    except json.JSONDecodeError:
                        pass
    except OSError:
        pass
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--qlog", default="/tmp/r3queue")
    ap.add_argument("--root", default=".")
    args = ap.parse_args()
    os.chdir(args.root)
    missing = []

    print("# Round-3 queue results\n")

    # --- benches -----------------------------------------------------------
    print("## Bench A/Bs (img/s, from bench.py JSON lines)\n")
    print("| run | metric | value | vs_baseline |")
    print("|---|---|---|---|")
    bench_logs = {
        "headline (default)": f"{args.qlog}/bench_headline.log",
        "fast samplers (ddim/dpmpp)": f"{args.qlog}/bench_fast.log",
        "vmem 64 MiB flag": f"{args.qlog}/bench_vmem64.log",
        "hybrid XLA-conv + Pallas-GN": f"{args.qlog}/bench_gn_hybrid.log",
        "bf16 attention scores": f"{args.qlog}/bench_bf16_scores.log",
        "encoder-cached k=2,3": f"{args.qlog}/bench_cached.log",
        "scan unroll=2": f"{args.qlog}/bench_unroll2.log",
        "scan unroll=4": f"{args.qlog}/bench_unroll4.log",
        "combined levers": f"{args.qlog}/bench_combo.log",
    }
    for name, path in bench_logs.items():
        rows = _bench_lines(path)
        if not rows:
            missing.append(f"bench: {name} ({path})")
            continue
        for r in rows:
            print(f"| {name} | {r.get('metric')} | {r.get('value')} "
                  f"{r.get('unit', '')} | {r.get('vs_baseline', '')} |")
    print()

    # --- quality certs -----------------------------------------------------
    print("## Quality certifications (gauss_recall / far_noise / gt_iou)\n")
    certs = sorted(glob.glob("quality_r2/*_cert.json"))
    if not certs:
        missing.append("quality certs (quality_r2/*_cert.json)")
    keys = ("gauss_recall_mean", "far_noise_ratio_mean", "gt_iou_mean")
    for path in certs:
        d = _read_json(path)
        if not d:
            continue
        print(f"### {os.path.basename(path)}")
        # ddim_cert.py writes <method>_metrics (the certified sampler) and
        # ddpm_metrics (the reference-sampler comparison column)
        for mkey, m in sorted(d.items()):
            if not (mkey.endswith("_metrics") and isinstance(m, dict)):
                continue
            for cls, row in m.items():
                vals = [f"{row.get(k, float('nan')):.3f}"
                        for k in keys if k in row]
                if vals:
                    print(f"- {mkey[:-8]} {cls}: {' / '.join(vals)}")
        print()

    # --- lambda sweep ------------------------------------------------------
    sweep = _read_json("quality_r2/lambda_sweep/sweep_summary.json")
    print("## Geometry-head lambda sweep")
    if sweep and "runs" in sweep:
        done = sorted(sweep["runs"].keys())
        print(f"- legs present: {', '.join(done)}")
        for name, run in sorted(sweep["runs"].items()):
            gm = run.get("val_geom_mae_final")
            ev = run.get("metrics", {})
            cells = []
            for cls in ("line", "circle", "arc"):
                e = ev.get(cls, {})
                if e:
                    cells.append(
                        f"{cls} {e.get('gauss_recall_mean', float('nan')):.3f}"
                        f"/{e.get('far_noise_ratio_mean', float('nan')):.3f}"
                        f"/{e.get('gt_iou_mean', float('nan')):.3f}")
            print(f"- {name}: geom_mae={gm} {' | '.join(cells)}")
        for leg in ("lambda_0", "lambda_001", "lambda_005", "lambda_01"):
            if leg not in sweep["runs"]:
                missing.append(f"lambda sweep leg {leg}")
    else:
        missing.append("lambda sweep summary")
    print()

    # --- cross-stack lr-matched legs ----------------------------------------
    print("## 96px cross-stack lr-matched legs")
    for name, path in (
        ("framework @ lr 1e-4", "parity96lr1_fw/quality_summary.json"),
        ("torch reference @ lr 2e-4", "parity96c_torch/torch_ref_summary.json"),
        ("framework min-SNR-γ @ lr 2e-4",
         "parity96minsnr_fw/quality_summary.json"),
    ):
        d = _read_json(path)
        if not d:
            missing.append(f"{name} ({path})")
            continue
        ev = d.get("eval", d.get("metrics", {}))
        cells = []
        for cls in ("line", "circle", "arc"):
            e = ev.get(cls, {}) if isinstance(ev, dict) else {}
            if e:
                cells.append(
                    f"{cls} {e.get('gauss_recall_mean', float('nan')):.3f}"
                    f"/{e.get('far_noise_ratio_mean', float('nan')):.3f}"
                    f"/{e.get('gt_iou_mean', float('nan')):.3f}")
        print(f"- {name}: {' | '.join(cells) if cells else list(d.keys())}")
    print()

    # --- torch-checkpoint portability eval -----------------------------------
    print("## Torch checkpoint portability "
          "(reference-trained weights through the framework)")
    tce = _read_json("parity96b_torch_fwports/torch_ckpt_eval.json")
    if tce:
        for label, mkey in (("fw(ported)", "metrics"),
                            ("torch(native)", "torch_metrics")):
            m = tce.get(mkey) or {}
            for cls, row in m.items():
                print(f"- {label} {cls}: "
                      f"grec {row.get('gauss_recall_mean', 0):.3f}, "
                      f"far {row.get('far_noise_ratio_mean', 0):.3f}, "
                      f"gt_iou {row.get('gt_iou_mean', 0):.3f}")
    else:
        missing.append("torch ckpt eval "
                       "(parity96b_torch_fwports/torch_ckpt_eval.json)")
    print()

    # --- cosine continuation -------------------------------------------------
    cont = _read_json("quality_r2/continue_summary_cos.json")
    print("## Line-class continuation (cosine lr; raw vs EMA weights)")
    if cont:
        for label, mkey in (("raw", "metrics"), ("ema", "metrics_ema")):
            for cls, row in cont.get(mkey, {}).items():
                print(f"- {label} {cls}: "
                      f"grec {row.get('gauss_recall_mean', 0):.3f}, "
                      f"far {row.get('far_noise_ratio_mean', 0):.3f}, "
                      f"gt_iou {row.get('gt_iou_mean', 0):.3f}")
    else:
        missing.append("cosine continuation (quality_r2/continue_summary_cos.json)")
    print()

    # --- no-fetch batch sweep -------------------------------------------------
    nf = f"{args.qlog}/no_fetch_sweep.log"
    print("## Batch scaling, fetch excluded")
    if os.path.exists(nf):
        with open(nf) as f:
            for line in f:
                if line.startswith(("FINAL", "batch", "B=")):
                    print(f"    {line.rstrip()}")
    else:
        missing.append(f"no-fetch sweep ({nf})")
    print()

    if missing:
        print("## STILL MISSING (queue incomplete)\n")
        for m in missing:
            print(f"- {m}")


if __name__ == "__main__":
    main()

"""Line-class guidance sweep (VERDICT r4 weak #7 / next #6).

Line is the persistent quality laggard across every cert (gt_iou
0.114-0.140 vs circle's ~0.35). This is a *generation-time only*
controlled experiment: same checkpoint, same seed, same eval — only the
CFG guidance scale varies, and only for the line class. Because the
generation CLI samples one class at a time, a per-class guidance policy
is free (circle/arc keep their certified s=3.0 outputs untouched), so a
line-only win cannot regress the other classes by construction.

Reference anchor: the per-class eval the reference defines
(/root/reference/eval_iou_noise.py:239-272) and its fixed guidance=3.0
default (/root/reference/generate_cond.py:51).

Usage:
  python scripts/line_guidance_sweep.py --root ./quality_r2 \
      --ckpt ./model_para/trained_para_cont_cos_ema.msgpack \
      --scales 2 4 5 [--confirm_count 500]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.makedirs("/tmp/jax_cache", exist_ok=True)
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="./quality_r2")
    ap.add_argument("--ckpt",
                    default="./model_para/trained_para_cont_cos_ema.msgpack")
    ap.add_argument("--scales", type=float, nargs="+", default=(2.0, 4.0, 5.0),
                    help="guidance values to try for line (3.0 = the "
                         "existing certified baseline, read from "
                         "--baseline_summary)")
    ap.add_argument("--gen_count", type=int, default=200)
    ap.add_argument("--confirm_count", type=int, default=500,
                    help="re-run the winning scale at this count "
                         "(reference scale; 0 disables)")
    ap.add_argument("--baseline_summary", default="./continue_summary_cos.json")
    ap.add_argument("--baseline_key", default="metrics_ema")
    ap.add_argument("--out_name", default="line_guidance_sweep.json")
    ap.add_argument("--csv", default=None,
                    help="condition CSV override (default: the 200-row "
                         "line test set; pass a _test500 CSV for a "
                         "fresh-conditions confirm — counts above the "
                         "row count cap silently)")
    ap.add_argument("--gt_dir", default=None,
                    help="GT dir override matching --csv")
    ap.add_argument("--method", default="ddpm",
                    help="sampler (ddpm = the certified quality sampler; "
                         "ddim for cheap smokes)")
    ap.add_argument("--steps", type=int, default=0,
                    help="num_inference_steps for fast samplers")
    args = ap.parse_args()
    os.chdir(os.path.abspath(args.root))

    import glob

    from diffusion_model_tpu.config import LatentTrainConfig
    from diffusion_model_tpu.diffusion import DiffusionSchedule
    from diffusion_model_tpu.eval import evaluate_dirs
    from diffusion_model_tpu.pipeline import (
        CsvConditionSampler, DiffusionPipeline,
    )
    from diffusion_model_tpu.train.recorder import save_images
    from diffusion_model_tpu.train.train_latent import build_models

    vae_ckpt = sorted(glob.glob("./vae/*/vae_best.msgpack"))[-1]
    vae, unet = build_models(LatentTrainConfig())
    pipe = DiffusionPipeline.from_checkpoints(
        unet_ckpt=args.ckpt, vae_ckpt=vae_ckpt, unet=unet, vae=vae,
        schedule=DiffusionSchedule.create(1000),
        latent_hw=(28, 28), image_hw=(224, 224),
    )
    sampler = CsvConditionSampler(pipe, class_id=1, image_hw=(224, 224))
    csv = args.csv or "./data/line_224x224_test/line_224x224_test.csv"
    gt_dir = args.gt_dir or "./data/line_224x224_test"

    keys = ("iou_mean", "gt_iou_mean", "far_noise_ratio_mean",
            "gauss_recall_mean", "gauss_recall_median")
    log = {"config": vars(args), "vae_ckpt": vae_ckpt, "results": {}}
    if os.path.exists(args.baseline_summary):
        with open(args.baseline_summary) as f:
            base = json.load(f).get(args.baseline_key, {}).get("line")
        if base:
            log["results"]["3.0"] = dict(base, source="baseline_summary")

    def run_scale(s, count, tag):
        # seed matches the quality runs' line key (PRNGKey(100+cls)) so a
        # sweep cell differs from the s=3.0 baseline ONLY in guidance
        out = f"./generated_by_cond/{tag}/line"
        os.makedirs(out, exist_ok=True)
        t0 = time.time()
        imgs = sampler.sample(csv, count=count, guidance_scale=s,
                              key=jax.random.PRNGKey(101),
                              method=args.method,
                              num_inference_steps=args.steps)
        gen_s = time.time() - t0
        save_images(out, imgs)
        res = evaluate_dirs(gt_dir=gt_dir, gen_dir=out,
                            out_dir=f"./eval_result/line_{tag}",
                            threshold=128, invert=True, sigma=2.0,
                            save_diff=False)
        row = res["summary"].iloc[0]
        m = {k: round(float(row[k]), 4) for k in keys}
        m["gen_s"] = round(gen_s, 1)
        # one condition per CSV row: a count above the row count caps
        # silently, so record the real n (the round-5 "confirm at 500"
        # degenerated to the same 200 rows this way)
        m["n_gen"] = int(len(imgs))
        print(f"line s={s} n={m['n_gen']}: {m}", flush=True)
        return m

    for s in args.scales:
        log["results"][str(s)] = run_scale(s, args.gen_count,
                                           f"line_g{s:g}")

    # winner = highest gauss_recall with far-noise no worse than +0.05 vs
    # the s=3.0 baseline (recall is the metric the thesis optimizes;
    # far-noise guards against the high-guidance speckle failure mode)
    base_far = log["results"].get("3.0", {}).get("far_noise_ratio_mean", 1.0)
    cands = [(s, m) for s, m in log["results"].items()
             if m.get("far_noise_ratio_mean", 1.0) <= base_far + 0.05]
    if cands:
        win_s, win_m = max(cands,
                           key=lambda kv: kv[1].get("gauss_recall_mean", 0.0))
        log["winner"] = {"scale": float(win_s), **win_m}
        print(f"winner: s={win_s} {win_m}", flush=True)
        if args.confirm_count and float(win_s) != 3.0:
            log["winner_confirm"] = run_scale(
                float(win_s), args.confirm_count,
                f"line_g{float(win_s):g}_n{args.confirm_count}")
            log["winner_confirm"]["count"] = args.confirm_count

    with open(args.out_name, "w") as f:
        json.dump(log, f, indent=2)
    print(json.dumps(log, indent=2), flush=True)


if __name__ == "__main__":
    main()

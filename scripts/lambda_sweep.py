"""Geometry-head λ sweep at quality scale (VERDICT r2 #3).

The reference's thesis experiments sweep the geom-loss weight λ over
{0, 0.01, 0.05, 0.1} (run names ``lambda_0/001/005/01``,
/root/reference/image_tools.py:470-478; loss wiring
train_latent_cond.py:151-159, losses/geom_losses.py:4-17). This driver runs
the same sweep end-to-end on the framework: for each λ it trains stage-2
from scratch (identical data, VAE, epochs, seed — only λ differs),
generates per-class images with CFG at T=1000, and evaluates both the
image metrics (eval_iou_noise pipeline) and the geometry head's masked MAE
(metrics.jsonl, logged by the trainer each validation epoch).

Reuses an existing quality-run root (data/ + vae/) so the sweep measures
λ alone. Usage:
  python scripts/lambda_sweep.py --root ./quality_r2 --epochs 150
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
    ap.add_argument("--root", default="./quality_r2",
                    help="existing quality-run root with data/ and vae/")
    ap.add_argument("--lambdas", default="0,0.01,0.05,0.1")
    ap.add_argument("--epochs", type=int, default=150)
    ap.add_argument("--batch_size", type=int, default=128)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--timesteps", type=int, default=1000)
    ap.add_argument("--gen_count", type=int, default=200)
    ap.add_argument("--image_size", type=int, default=224)
    ap.add_argument("--out", default="./lambda_sweep")
    args = ap.parse_args()
    os.chdir(os.path.abspath(args.root))

    import glob

    import numpy as np

    from diffusion_model_tpu.config import DataConfig, LatentTrainConfig
    from diffusion_model_tpu.data.geometry import CLASS_NAMES
    from diffusion_model_tpu.diffusion import DiffusionSchedule
    from diffusion_model_tpu.eval import evaluate_dirs
    from diffusion_model_tpu.pipeline import (
        CsvConditionSampler, DiffusionPipeline,
    )
    from diffusion_model_tpu.train import train_latent_cond
    from diffusion_model_tpu.train.recorder import save_images

    hw = (args.image_size, args.image_size)
    sfx = f"{hw[0]}x{hw[1]}"
    mk_items = lambda suffix: [
        (f"./data/{c}_{sfx}{suffix}/{c}_{sfx}{suffix}.csv",
         f"./data/{c}_{sfx}{suffix}", i)
        for i, c in ((1, "line"), (2, "circle"), (3, "arc"))
    ]
    vae_ckpt = sorted(glob.glob("./vae/*/vae_best.msgpack"))[-1]
    lambdas = [float(x) for x in args.lambdas.split(",")]
    os.makedirs(args.out, exist_ok=True)
    sweep = {"config": vars(args), "vae_ckpt": vae_ckpt, "runs": {}}

    for lam in lambdas:
        tag = ("lambda_" + f"{lam:g}".replace("0.", "0")
               .replace(".", "")) if lam else "lambda_0"
        run_dir = os.path.join(args.out, tag)
        if os.path.exists(os.path.join(run_dir, "summary.json")):
            with open(os.path.join(run_dir, "summary.json")) as f:
                sweep["runs"][tag] = json.load(f)
            print(f"skip {tag}: summary exists", flush=True)
            continue
        print(f"== {tag} (λ={lam}) ==", flush=True)
        t0 = time.time()
        rl = train_latent_cond(LatentTrainConfig(
            epochs=args.epochs, batch_size=args.batch_size, lr=args.lr,
            num_timesteps=args.timesteps, vae_ckpt=vae_ckpt,
            geom_lambda=lam, post_train_samples=0,
            data=DataConfig(train_items=mk_items(""),
                            val_items=mk_items("_val"), image_size=hw),
            model_para_dir=os.path.join(run_dir, "model_para"),
            result_root=os.path.join(run_dir, "result"),
            resume_dir=os.path.abspath(os.path.join(run_dir, "orbax_ck")),
        ))
        log = {"lambda": lam, "train_s": round(time.time() - t0, 1),
               "train_loss_tail": [round(x, 5)
                                   for x in rl["train_losses"][-3:]]}
        # geom MAE over the last validation epochs, from metrics.jsonl
        maes = []
        with open(os.path.join(run_dir, "model_para", "metrics.jsonl")) as f:
            for line in f:
                rec = json.loads(line)
                if "val_geom_mae" in rec:
                    maes.append((rec["epoch"], rec["val_geom_mae"],
                                 rec.get("val_loss_line"),
                                 rec.get("val_loss_circle"),
                                 rec.get("val_loss_arc")))
        if maes:
            log["val_geom_mae_final"] = maes[-1][1]
            log["val_loss_per_class_final"] = dict(
                zip(("line", "circle", "arc"), maes[-1][2:]))

        t1 = time.time()
        pipe = DiffusionPipeline(
            unet=rl["unet"], unet_params=rl["final_state"].params,
            vae=rl["vae"], vae_params=rl["vae_params"],
            schedule=DiffusionSchedule.create(args.timesteps),
        )
        sampler = CsvConditionSampler(pipe, class_id=1, image_hw=hw)
        metrics = {}
        for cls, cname in CLASS_NAMES.items():
            d = f"./data/{cname}_{sfx}_test"
            cls_dir = os.path.join(run_dir, "generated", cname)
            os.makedirs(cls_dir, exist_ok=True)
            sampler.set_class_id(cls)
            imgs = sampler.sample(
                f"{d}/{cname}_{sfx}_test.csv", count=args.gen_count,
                guidance_scale=3.0, key=jax.random.PRNGKey(100 + cls),
            )
            save_images(cls_dir, imgs)
            res = evaluate_dirs(gt_dir=d, gen_dir=cls_dir,
                                out_dir=os.path.join(run_dir, "eval", cname),
                                threshold=128, invert=True, sigma=2.0,
                                save_diff=False)
            s = res["summary"].iloc[0]
            metrics[cname] = {
                k: round(float(s[k]), 4)
                for k in ("iou_mean", "gt_iou_mean", "far_noise_ratio_mean",
                          "gauss_recall_mean", "gauss_recall_median")
            }
            print(f"  {cname}: {metrics[cname]}", flush=True)
        log["gen_eval_s"] = round(time.time() - t1, 1)
        log["metrics"] = metrics
        with open(os.path.join(run_dir, "summary.json"), "w") as f:
            json.dump(log, f, indent=2)
        sweep["runs"][tag] = log
        with open(os.path.join(args.out, "sweep_summary.json"), "w") as f:
            json.dump(sweep, f, indent=2)

    with open(os.path.join(args.out, "sweep_summary.json"), "w") as f:
        json.dump(sweep, f, indent=2)
    print(json.dumps(sweep, indent=2), flush=True)


if __name__ == "__main__":
    main()

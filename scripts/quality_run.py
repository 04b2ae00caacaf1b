"""End-to-end quality run at the reference workload.

Renders synthetic 224×224 line/circle/arc datasets, trains both stages,
generates images per class from the test CSVs with CFG at T=1000, and runs
the IoU/noise evaluation — producing the metrics table that BASELINE.md's
"IoU parity" row asks for. Everything uses the public CLI-equivalent APIs.

Usage: python scripts/quality_run.py [--fast]
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
    ap.add_argument("--root", default="./quality_run")
    ap.add_argument("--fast", action="store_true",
                    help="small counts/epochs for smoke testing")
    ap.add_argument("--train_count", type=int, default=4000)
    ap.add_argument("--val_count", type=int, default=200)
    ap.add_argument("--test_count", type=int, default=200)
    ap.add_argument("--vae_epochs", type=int, default=40)
    ap.add_argument("--latent_epochs", type=int, default=200)
    ap.add_argument("--latent_bs", type=int, default=128)
    ap.add_argument("--latent_lr", type=float, default=2e-4)
    ap.add_argument("--gen_count", type=int, default=200)
    ap.add_argument("--timesteps", type=int, default=1000)
    ap.add_argument("--image_size", type=int, default=224,
                    help="square image edge; 64 for the CPU-feasible torch-reference parity config (scripts/torch_reference_run.py)")
    ap.add_argument("--vae_ckpt", default=None,
                    help="skip stage 1 and reuse this VAE checkpoint "
                         "(path relative to --root)")
    ap.add_argument("--geom_lambda", type=float, default=0.0,
                    help="geometry-head loss weight (reference sweeps "
                         "{0, 0.01, 0.05, 0.1}, image_tools.py:470-478)")
    ap.add_argument("--loss_weighting", choices=["uniform", "min_snr"],
                    default="uniform",
                    help="stage-2 timestep loss weighting (min-SNR-γ, "
                         "Hang et al. 2023; uniform = reference MSE)")
    ap.add_argument("--snr_gamma", type=float, default=5.0)
    ap.add_argument("--orbax_dir", default="./orbax_ck",
                    help="async Orbax full-state checkpoints every epoch so "
                         "a multi-hour run survives a tunnel wedge; resumes "
                         "automatically if checkpoints exist ('' disables)")
    ap.add_argument("--data_dir", default="./data",
                    help="dataset directory (shareable across sweep runs)")
    args = ap.parse_args()
    if args.fast:
        args.train_count, args.val_count, args.test_count = 64, 16, 16
        args.vae_epochs, args.latent_epochs, args.gen_count = 2, 2, 4
        args.timesteps = 8

    root = os.path.abspath(args.root)
    os.makedirs(root, exist_ok=True)
    os.chdir(root)
    log = {"config": vars(args)}

    from diffusion_model_tpu.config import (
        DataConfig, LatentTrainConfig, VAETrainConfig,
    )
    from diffusion_model_tpu.data.geometry import CLASS_NAMES
    from diffusion_model_tpu.data.synthetic import generate_all_classes
    from diffusion_model_tpu.eval import evaluate_dirs
    from diffusion_model_tpu.pipeline import CsvConditionSampler, DiffusionPipeline
    from diffusion_model_tpu.diffusion import DiffusionSchedule
    from diffusion_model_tpu.train import train_latent_cond, train_vae
    from diffusion_model_tpu.train.recorder import save_images

    t0 = time.time()

    # ---- data ----
    print("== rendering datasets ==", flush=True)
    hw = (args.image_size, args.image_size)
    train_dirs = generate_all_classes(args.data_dir, args.train_count,
                                      seed=1, image_size=hw)
    val_dirs = generate_all_classes(args.data_dir, args.val_count, seed=2,
                                    suffix="_val", image_size=hw)
    test_dirs = generate_all_classes(args.data_dir, args.test_count, seed=3,
                                     suffix="_test", image_size=hw)
    mk_items = lambda dirs: [
        (f"{d}/{os.path.basename(d)}.csv", d, cls) for cls, d in dirs.items()
    ]
    log["data_s"] = round(time.time() - t0, 1)
    print(f"datasets in {log['data_s']}s", flush=True)

    # ---- stage 1 ----
    t1 = time.time()
    data = DataConfig(train_items=mk_items(train_dirs),
                      val_items=mk_items(val_dirs), image_size=hw)
    if args.vae_ckpt:
        vae_ckpt_path = os.path.abspath(args.vae_ckpt)
        log["vae_s"] = 0.0
        print(f"reusing VAE checkpoint {vae_ckpt_path}", flush=True)
    else:
        rv = train_vae(VAETrainConfig(
            epochs=args.vae_epochs, data=data, save_dir="./vae",
        ))
        vae_ckpt_path = rv["ckpt_path"]
        log["vae_s"] = round(time.time() - t1, 1)
        log["vae_val"] = rv["val_losses"][-1] if rv["val_losses"] else None
        print(f"VAE done in {log['vae_s']}s", flush=True)

    # ---- stage 2 ----
    t2 = time.time()
    rl = train_latent_cond(LatentTrainConfig(
        epochs=args.latent_epochs, batch_size=args.latent_bs,
        lr=args.latent_lr, num_timesteps=args.timesteps,
        vae_ckpt=vae_ckpt_path, data=data, geom_lambda=args.geom_lambda,
        loss_weighting=args.loss_weighting, snr_gamma=args.snr_gamma,
        post_train_samples=0,
        resume_dir=os.path.abspath(args.orbax_dir) if args.orbax_dir
        else None,
    ))
    log["latent_s"] = round(time.time() - t2, 1)
    log["latent_train_losses_tail"] = [
        round(x, 5) for x in rl["train_losses"][-5:]
    ]
    print(f"latent training done in {log['latent_s']}s", flush=True)

    # ---- generation ----
    t3 = time.time()
    pipe = DiffusionPipeline(
        unet=rl["unet"], unet_params=rl["final_state"].params,
        vae=rl["vae"], vae_params=rl["vae_params"],
        schedule=DiffusionSchedule.create(args.timesteps),
    )
    sampler = CsvConditionSampler(pipe, class_id=1, image_hw=hw)
    gen_root = "./generated_by_cond/quality"
    for cls, d in test_dirs.items():
        cname = CLASS_NAMES[cls]
        sampler.set_class_id(cls)
        cls_dir = os.path.join(gen_root, cname)
        os.makedirs(cls_dir, exist_ok=True)
        imgs = sampler.sample(
            f"{d}/{os.path.basename(d)}.csv", count=args.gen_count,
            guidance_scale=3.0, key=jax.random.PRNGKey(100 + cls),
        )
        save_images(cls_dir, imgs)
        print(f"generated {len(imgs)} {cname}", flush=True)
    log["gen_s"] = round(time.time() - t3, 1)

    # ---- eval ----
    t4 = time.time()
    summaries = {}
    for cls, d in test_dirs.items():
        cname = CLASS_NAMES[cls]
        res = evaluate_dirs(
            gt_dir=d, gen_dir=os.path.join(gen_root, cname),
            out_dir=f"./eval_result/{cname}", threshold=128, invert=True,
            sigma=2.0, save_diff=True,
        )
        s = res["summary"].iloc[0]
        summaries[cname] = {
            k: round(float(s[k]), 4)
            for k in ("iou_mean", "gt_iou_mean", "far_noise_ratio_mean",
                      "gauss_recall_mean", "gauss_recall_median")
        }
    log["eval_s"] = round(time.time() - t4, 1)
    log["metrics"] = summaries
    log["total_s"] = round(time.time() - t0, 1)

    with open("quality_summary.json", "w") as f:
        json.dump(log, f, indent=2)
    print(json.dumps(log, indent=2), flush=True)


if __name__ == "__main__":
    main()

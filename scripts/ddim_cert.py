"""Certify fast-sampler quality (VERDICT r2 #4).

Generates the standard per-class image set from an existing trained
checkpoint with ``--method ddim`` (default, 50 steps) or ``--method
dpmpp`` (DPM-Solver++(2M)) and runs the same
IoU/noise evaluation as the DDPM quality runs, so BASELINE.md can carry a
DDPM-1000 vs DDIM-50 table for the SAME checkpoint. The DDPM side is read
from the run's existing summary (continue_summary.json / quality_summary
.json) rather than re-generated.

Usage:
  python scripts/ddim_cert.py --root ./quality_r2 \
      --ckpt ./model_para/trained_para_cont.msgpack --steps 50
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
    ap.add_argument("--ckpt", default="./model_para/trained_para_cont.msgpack")
    ap.add_argument("--method", choices=("ddim", "dpmpp", "ddpm_cached"),
                    default="ddim",
                    help="for ddpm_cached, --steps is the encoder cache "
                         "interval k (full T=1000 retained)")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--spacing",
                    choices=("linear", "trailing", "karras"),
                    default="linear", help="ddim/dpmpp step grid")
    ap.add_argument("--eta", type=float, default=0.0)
    ap.add_argument("--gen_count", type=int, default=200)
    ap.add_argument("--guidance", type=float, default=3.0)
    ap.add_argument("--prediction_type", choices=("epsilon", "v"),
                    default="epsilon",
                    help="v for distilled / v-trained checkpoints")
    ap.add_argument("--out_name", default=None,
                    help="override the <method><steps>_cert.json filename")
    ap.add_argument("--gen_tag", default=None,
                    help="override the generated_by_cond/<tag>/ output dir "
                         "(default <method><steps>[_<spacing>]); needed "
                         "when certifying two checkpoints with the same "
                         "sampler settings")
    ap.add_argument("--image_size", type=int, default=224)
    ap.add_argument("--ddpm_summary", default="./continue_summary.json",
                    help="existing summary holding this checkpoint's "
                         "DDPM-1000 metrics for the comparison table")
    ap.add_argument("--ddpm_metrics_key", default="metrics",
                    help="key inside --ddpm_summary holding the DDPM "
                         "metrics table (metrics_ema for EMA checkpoints)")
    ap.add_argument("--test_suffix", default="_test",
                    help="suffix of the GT/condition set dirs "
                         "(<class>_<HxW><suffix>). The default 200-row "
                         "_test sets cap --gen_count at 200 (the sampler "
                         "draws one condition per CSV row) — certifying "
                         "at a true 500/class needs a 500-row set, e.g. "
                         "_test500 from cli.make_dataset")
    ap.add_argument("--no_warmup", action="store_true",
                    help="skip the untimed warm-up generation (ADVICE r4 "
                         "#5: without it the first class's gen_s absorbs "
                         "the jit compile)")
    args = ap.parse_args()
    os.chdir(os.path.abspath(args.root))

    import glob

    from diffusion_model_tpu.config import LatentTrainConfig
    from diffusion_model_tpu.data.geometry import CLASS_NAMES
    from diffusion_model_tpu.diffusion import DiffusionSchedule
    from diffusion_model_tpu.eval import evaluate_dirs
    from diffusion_model_tpu.pipeline import (
        CsvConditionSampler, DiffusionPipeline,
    )
    from diffusion_model_tpu.train.recorder import save_images
    from diffusion_model_tpu.train.train_latent import build_models

    hw = (args.image_size, args.image_size)
    sfx = f"{hw[0]}x{hw[1]}"
    vae_ckpt = sorted(glob.glob("./vae/*/vae_best.msgpack"))[-1]
    vae, unet = build_models(LatentTrainConfig())
    pipe = DiffusionPipeline.from_checkpoints(
        unet_ckpt=args.ckpt, vae_ckpt=vae_ckpt, unet=unet, vae=vae,
        schedule=DiffusionSchedule.create(1000),
        latent_hw=(hw[0] // 8, hw[1] // 8), image_hw=hw,
    )
    pipe.prediction_type = args.prediction_type
    sampler = CsvConditionSampler(pipe, class_id=1, image_hw=hw)

    log = {"config": vars(args), "vae_ckpt": vae_ckpt}

    def _gen(cls, cname, key):
        sampler.set_class_id(cls)
        return sampler.sample(
            f"./data/{cname}_{sfx}{args.test_suffix}/"
            f"{cname}_{sfx}{args.test_suffix}.csv",
            count=args.gen_count,
            guidance_scale=args.guidance, key=key,
            method=args.method,
            num_inference_steps=(0 if args.method == "ddpm_cached"
                                 else args.steps),
            timestep_spacing=args.spacing,
            cache_interval=(args.steps if args.method == "ddpm_cached"
                            else 2),
            eta=args.eta,
        )

    if not args.no_warmup:
        # One untimed full-shape generation so the jit compile (shared by
        # all classes — identical batch shape/params) is paid here, not
        # inside the first class's recorded gen_s (ADVICE r4 #5).
        tw = time.time()
        _gen(1, CLASS_NAMES[1], jax.random.PRNGKey(0))
        log["warmup_s"] = round(time.time() - tw, 1)
        print(f"warm-up (compile) {log['warmup_s']}s", flush=True)

    t0 = time.time()
    metrics = {}
    for cls, cname in CLASS_NAMES.items():
        d = f"./data/{cname}_{sfx}{args.test_suffix}"
        tag = args.gen_tag or (
            f"{args.method}{args.steps}"
            + ("" if args.spacing == "linear" else f"_{args.spacing}"))
        cls_dir = f"./generated_by_cond/{tag}/{cname}"
        os.makedirs(cls_dir, exist_ok=True)
        tg = time.time()
        imgs = _gen(cls, cname, jax.random.PRNGKey(100 + cls))
        save_images(cls_dir, imgs)
        gen_s = time.time() - tg
        res = evaluate_dirs(gt_dir=d, gen_dir=cls_dir,
                            out_dir=f"./eval_result/{cname}_{tag}",
                            threshold=128, invert=True, sigma=2.0,
                            save_diff=False)
        s = res["summary"].iloc[0]
        metrics[cname] = {
            k: round(float(s[k]), 4)
            for k in ("iou_mean", "gt_iou_mean", "far_noise_ratio_mean",
                      "gauss_recall_mean", "gauss_recall_median",
                      "gauss_overdraw_rate_gt1")
            if k in s
        }
        metrics[cname]["gen_s"] = round(gen_s, 1)
        # actual images produced: the sampler draws one condition per CSV
        # row, so a --gen_count above the row count caps silently — record
        # the real n so a capped run can't masquerade as a larger sample
        metrics[cname]["n_gen"] = int(len(imgs))
        print(cname, metrics[cname], flush=True)
    log["fast_metrics"] = metrics
    log["ddim_metrics"] = metrics  # back-compat key for existing renderers
    log["total_s"] = round(time.time() - t0, 1)

    if os.path.exists(args.ddpm_summary):
        with open(args.ddpm_summary) as f:
            log["ddpm_metrics"] = json.load(f).get(args.ddpm_metrics_key)
        log["ddpm_metrics_key"] = args.ddpm_metrics_key

    _sfx = "" if args.spacing == "linear" else f"_{args.spacing}"
    _name = args.out_name or f"{args.method}{args.steps}{_sfx}_cert.json"
    with open(_name, "w") as f:
        json.dump(log, f, indent=2)
    print(json.dumps(log, indent=2), flush=True)


if __name__ == "__main__":
    main()

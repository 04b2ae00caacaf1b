"""Production-scale accuracy cert for time-parallel (Picard) DDIM
(VERDICT r3 weak #6), round-4 revision.

The first cert compared final uint8 images bit-for-bit and FAILED — with
byte-identical deltas under both acceptance frames — which localized the
deviation to something no tolerance can fix: the parallel sampler
evaluates the model in a (window·B)-row batch while sequential DDIM uses
a (2B)-row CFG batch, and on TPU the bf16-matmul tilings differ across
batch shapes. DDIM's reverse map amplifies an eps perturbation injected
at step i by |c_e[i]|·prod_{j>i} c_x[j]; summed over a linear T=1000
DDIM-50 grid that is ~157 (probe in docs/ROUND4_NOTES.md), so ~1e-2
bf16 eval differences fully explain sparse full-range pixel deltas —
and would equally affect SEQUENTIAL DDIM run at any other batch shape.
Bitwise parity across batch shapes is not an achievable (or meaningful)
bar on TPU. This cert therefore measures two things that are:

  A. **Solver fidelity** (f32 models + highest matmul precision, direct
     sampler calls): with hardware numerics suppressed, the parallel
     solver's final latents must match sequential DDIM to the x0-frame
     bound O(S·tol). Also records sweeps (the time-parallel efficiency).
  B. **Production equivalence** (bf16, the real pipeline path, 200
     images/class): the IoU/noise metrics of ddim vs ddim_parallel
     output must agree within metric noise. Pixel-delta stats are
     reported as diagnostics, not gated.

Writes <root>/parallel_dev_cert_x0.json (or --out_name).

Usage:
  python scripts/parallel_dev_cert.py --root ./quality_r2 [--steps 50]
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

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="./quality_r2")
    ap.add_argument("--ckpt", default="./model_para/trained_para_cont.msgpack")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--batch_a", type=int, default=4,
                    help="per-class batch for the f32 solver-fidelity leg")
    ap.add_argument("--gen_count", type=int, default=200,
                    help="per-class count for the bf16 quality leg")
    ap.add_argument("--guidance", type=float, default=3.0)
    ap.add_argument("--tol", type=float, default=1e-3)
    ap.add_argument("--image_size", type=int, default=224)
    ap.add_argument("--metric_bar", type=float, default=0.025,
                    help="max |metric delta| allowed in leg B")
    ap.add_argument("--out_name", default="parallel_dev_cert_x0.json")
    args = ap.parse_args()
    os.chdir(os.path.abspath(args.root))

    import glob

    import jax.numpy as jnp

    from diffusion_model_tpu.config import LatentTrainConfig
    from diffusion_model_tpu.data.geometry import CLASS_NAMES
    from diffusion_model_tpu.diffusion import DiffusionSchedule
    from diffusion_model_tpu.diffusion.sampling import sample_loop_ddim
    from diffusion_model_tpu.diffusion.parallel_sampling import (
        sample_loop_ddim_parallel)
    from diffusion_model_tpu.eval import evaluate_dirs
    from diffusion_model_tpu.pipeline import (
        CsvConditionSampler, DiffusionPipeline)
    from diffusion_model_tpu.train.recorder import save_images
    from diffusion_model_tpu.train.train_latent import build_models

    hw = (args.image_size, args.image_size)
    sfx = f"{hw[0]}x{hw[1]}"
    lat = (hw[0] // 8, hw[1] // 8)
    vae_ckpt = sorted(glob.glob("./vae/*/vae_best.msgpack"))[-1]
    S, W = args.steps, min(max(8, len(jax.devices())), args.steps)
    log = {"config": vars(args), "vae_ckpt": vae_ckpt,
           "tol_frame": "x0", "window": W}
    ok = True

    # ---- Leg A: solver fidelity, f32 + highest matmul precision --------
    vae32, unet32 = build_models(LatentTrainConfig(bf16=False))
    pipe32 = DiffusionPipeline.from_checkpoints(
        unet_ckpt=args.ckpt, vae_ckpt=vae_ckpt, unet=unet32, vae=vae32,
        schedule=DiffusionSchedule.create(1000),
        latent_hw=lat, image_hw=hw)
    eps32 = pipe32._eps_fn(pipe32.unet_params)
    # x0-frame bound O(S·tol) + margin for residual f32 tiling noise
    # amplified by the ~157x chain sensitivity (~1e-6 * 157)
    bar_a = S * args.tol + 1e-3
    leg_a = {}
    for cls, cname in CLASS_NAMES.items():
        csv = f"./data/{cname}_{sfx}_test/{cname}_{sfx}_test.csv"
        sampler = CsvConditionSampler(pipe32, class_id=cls, image_hw=hw)
        vals, mask = sampler.load_cond(csv, count=args.batch_a)
        B = vals.shape[0]
        y = jnp.full((B,), cls, jnp.int32)
        x0 = jax.random.normal(jax.random.PRNGKey(500 + cls),
                               (B, lat[0], lat[1], 4), jnp.float32)
        with jax.default_matmul_precision("highest"):
            t0 = time.time()
            seq = jax.jit(lambda x: sample_loop_ddim(
                pipe32.schedule, eps32, x, jax.random.PRNGKey(1),
                num_inference_steps=S, y=y, cond_vals=jnp.asarray(vals),
                cond_mask=jnp.asarray(mask),
                guidance_scale=args.guidance))(x0)
            seq = np.asarray(seq)
            seq_s = time.time() - t0
            t0 = time.time()
            par, sweeps = jax.jit(lambda x: sample_loop_ddim_parallel(
                pipe32.schedule, eps32, x, num_inference_steps=S,
                window=W, tol=args.tol, y=y, cond_vals=jnp.asarray(vals),
                cond_mask=jnp.asarray(mask),
                guidance_scale=args.guidance))(x0)
            par, sweeps = np.asarray(par), int(sweeps)
            par_s = time.time() - t0
        dev = float(np.abs(par - seq).max())
        row = {"max_latent_dev": round(dev, 6), "bound": bar_a,
               "sweeps": sweeps, "steps": S,
               "seq_s": round(seq_s, 2), "par_s": round(par_s, 2),
               "pass": bool(dev <= bar_a)}
        ok = ok and row["pass"]
        leg_a[cname] = row
        print(f"[A f32] {cname}: {row}", flush=True)
    log["leg_a_solver_fidelity_f32"] = leg_a

    # ---- Leg B: production bf16 pipeline, quality-metric equivalence ---
    vae16, unet16 = build_models(LatentTrainConfig())
    pipe16 = DiffusionPipeline.from_checkpoints(
        unet_ckpt=args.ckpt, vae_ckpt=vae_ckpt, unet=unet16, vae=vae16,
        schedule=DiffusionSchedule.create(1000),
        latent_hw=lat, image_hw=hw)
    keys = ("iou_mean", "gt_iou_mean", "far_noise_ratio_mean",
            "gauss_recall_mean")
    leg_b = {}
    for cls, cname in CLASS_NAMES.items():
        d = f"./data/{cname}_{sfx}_test"
        csv = f"{d}/{cname}_{sfx}_test.csv"
        sampler = CsvConditionSampler(pipe16, class_id=cls, image_hw=hw)
        outs, mets = {}, {}
        for method in ("ddim", "ddim_parallel"):
            cls_dir = f"./generated_by_cond/pardev_{method}/{cname}"
            os.makedirs(cls_dir, exist_ok=True)
            t0 = time.time()
            imgs = sampler.sample(
                csv, count=args.gen_count, guidance_scale=args.guidance,
                key=jax.random.PRNGKey(500 + cls), method=method,
                num_inference_steps=S, to_pil=False)
            # quantize exactly like recorder.save_images so the pixel
            # diagnostics measure what the evaluator sees
            outs[method] = np.clip(np.asarray(imgs) * 255.0,
                                   0, 255).astype(np.uint8)
            outs[method + "_s"] = round(time.time() - t0, 2)
            save_images(cls_dir, list(outs[method]))
            res = evaluate_dirs(gt_dir=d, gen_dir=cls_dir,
                                out_dir=f"./eval_result/{cname}_pardev_{method}",
                                threshold=128, invert=True, sigma=2.0,
                                save_diff=False)
            s = res["summary"].iloc[0]
            mets[method] = {k: round(float(s[k]), 4) for k in keys}
        dmax = max(abs(mets["ddim"][k] - mets["ddim_parallel"][k])
                   for k in keys)
        d = np.abs(outs["ddim"].astype(np.int32)
                   - outs["ddim_parallel"].astype(np.int32))
        row = {
            "ddim": mets["ddim"], "ddim_parallel": mets["ddim_parallel"],
            "max_metric_delta": round(float(dmax), 4),
            "metric_bar": args.metric_bar,
            "pixel_diag": {
                "max_uint8_delta": int(d.max()),
                "mean_uint8_delta": round(float(d.mean()), 5),
                "pct_pixels_changed": round(float((d > 0).mean()) * 100, 4),
            },
            "ddim_s": outs["ddim_s"],
            "ddim_parallel_s": outs["ddim_parallel_s"],
            "pass": bool(dmax <= args.metric_bar),
        }
        ok = ok and row["pass"]
        leg_b[cname] = row
        print(f"[B bf16] {cname}: max_metric_delta={row['max_metric_delta']}"
              f" pass={row['pass']} pixel={row['pixel_diag']}", flush=True)
    log["leg_b_quality_bf16"] = leg_b

    log["pass"] = ok
    with open(args.out_name, "w") as f:
        json.dump(log, f, indent=2)
    print(f"wrote {args.out_name} pass={ok}", flush=True)


if __name__ == "__main__":
    main()

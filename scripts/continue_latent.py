"""Continue stage-2 training from a saved parameter checkpoint, then
regenerate and re-evaluate. Demonstrates warm-starting from the rolling
``model_para/trained_para.msgpack`` artifact with the public APIs.

Usage:
  python scripts/continue_latent.py --root /tmp/quality_v2 --epochs 100
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True,
                    help="quality_run root (data/, vae/, model_para/)")
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--batch_size", type=int, default=128)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--timesteps", type=int, default=1000)
    ap.add_argument("--gen_count", type=int, default=200)
    ap.add_argument("--save_every", type=int, default=50,
                    help="checkpoint trained_para_cont.msgpack every N "
                         "epochs (0 = only at the end)")
    ap.add_argument("--lr_schedule", choices=("constant", "cosine"),
                    default="cosine",
                    help="cosine decays lr -> lr*final_frac over the "
                         "continuation (VERDICT r2: fixed-lr continuations "
                         "traded the line class away)")
    ap.add_argument("--lr_final_frac", type=float, default=0.1)
    ap.add_argument("--class_balanced", action="store_true",
                    help="equal per-class share in every batch")
    ap.add_argument("--ema_decay", type=float, default=0.0,
                    help="track an EMA of the weights during the "
                         "continuation and ALSO generate+eval from it "
                         "(trained_para_cont<tag>_ema.msgpack, metrics_ema "
                         "in the summary); 0 disables")
    ap.add_argument("--ckpt", default="./model_para/trained_para.msgpack",
                    help="parameter checkpoint to warm-start from")
    ap.add_argument("--tag", default="",
                    help="suffix for output artifacts so successive "
                         "continuations don't clobber each other "
                         "(trained_para_cont<tag>.msgpack, "
                         "continue_summary<tag>.json, ...)")
    args = ap.parse_args()
    os.chdir(args.root)

    import glob

    import optax

    from diffusion_model_tpu.config import DataConfig, LatentTrainConfig
    from diffusion_model_tpu.data import LabelDataset
    from diffusion_model_tpu.data.geometry import CLASS_NAMES
    from diffusion_model_tpu.diffusion import DiffusionSchedule
    from diffusion_model_tpu.eval import evaluate_dirs
    from diffusion_model_tpu.parallel import mesh_for_batch
    from diffusion_model_tpu.pipeline import CsvConditionSampler, DiffusionPipeline
    from diffusion_model_tpu.train.checkpoints import load_params, save_params
    from diffusion_model_tpu.train.ema import make_train_state
    from diffusion_model_tpu.train.device_data import (
        epoch_index_matrix, epoch_index_matrix_stratified,
        maybe_device_resident, put_index_matrix,
    )
    from diffusion_model_tpu.train.train_latent import (
        build_models, create_latent_state, make_latent_epoch_fn,
    )

    cfg = LatentTrainConfig(
        batch_size=args.batch_size, lr=args.lr,
        num_timesteps=args.timesteps,
        data=DataConfig(),
    )
    vae, unet = build_models(cfg)
    schedule = DiffusionSchedule.create(args.timesteps)
    rng = jax.random.PRNGKey(123)

    vae_ckpt = sorted(glob.glob("./vae/*/vae_best.msgpack"))[-1]
    target_v = vae.init({"params": rng, "sample": rng},
                        jnp.zeros((1, 224, 224, 3)))["params"]
    vae_params = load_params(vae_ckpt, target_v)

    state = create_latent_state(rng, cfg, unet, (28, 28))
    unet_params = load_params(args.ckpt, state.params)

    items = [
        (f"./data/{c}_224x224/{c}_224x224.csv", f"./data/{c}_224x224", i)
        for i, c in ((1, "line"), (2, "circle"), (3, "arc"))
    ]
    ds = LabelDataset(items, cache_images=True)
    steps_per_epoch = len(ds) // args.batch_size
    if args.lr_schedule == "cosine":
        lr = optax.cosine_decay_schedule(
            args.lr, decay_steps=max(1, args.epochs * steps_per_epoch),
            alpha=args.lr_final_frac,
        )
    else:
        lr = args.lr
    # EMA (when enabled) starts as a copy of the warm-start weights and is
    # updated inside the same jitted epoch scan the trainer uses — sampling
    # from it averages out late-training oscillation (train/ema.py).
    state = make_train_state(unet.apply, unet_params, optax.adam(lr),
                             ema_decay=args.ema_decay)
    mesh = mesh_for_batch(cfg.batch_size)
    data_dev = maybe_device_resident(ds, mesh)
    assert data_dev is not None

    epoch_fn = make_latent_epoch_fn(unet, vae, schedule,
                                    cfg.cfg_drop_prob, cfg.geom_lambda)
    np_rng = np.random.default_rng(7)
    labels = np.asarray([it[-1] for it in ds.items], np.int32)
    t0 = time.time()
    log = {"resumed_from": args.ckpt, "extra_epochs": args.epochs,
           "lr_schedule": args.lr_schedule, "lr": args.lr,
           "class_balanced": args.class_balanced}
    losses_hist = []
    for epoch in range(1, args.epochs + 1):
        rng, sk = jax.random.split(rng)
        if args.class_balanced:
            idx = epoch_index_matrix_stratified(labels, cfg.batch_size,
                                                np_rng)
        else:
            idx = epoch_index_matrix(len(ds), cfg.batch_size, np_rng)
        state, losses = epoch_fn(state, vae_params, data_dev,
                                 put_index_matrix(idx, mesh), sk)
        if epoch % 10 == 0 or epoch == args.epochs:
            m = float(np.mean(jax.device_get(losses)))
            losses_hist.append(round(m, 5))
            print(f"[cont {epoch:03d}] train={m:.6f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
        if args.save_every and epoch % args.save_every == 0:
            save_params(f"./model_para/trained_para_cont{args.tag}"
                        ".msgpack", state.params)
            if args.ema_decay > 0.0:
                save_params(f"./model_para/trained_para_cont{args.tag}"
                            "_ema.msgpack", state.ema_params)
    save_params(f"./model_para/trained_para_cont{args.tag}.msgpack",
                state.params)
    if args.ema_decay > 0.0:
        save_params(f"./model_para/trained_para_cont{args.tag}_ema.msgpack",
                    state.ema_params)
    # sidecars so inference CLIs / distill auto-apply the right schedule
    # and parameterization (same convention as the trainers')
    from diffusion_model_tpu.train.train_latent import _write_arch_sidecars
    _write_arch_sidecars(cfg, [
        f"./model_para/trained_para_cont{args.tag}.msgpack",
    ] + ([f"./model_para/trained_para_cont{args.tag}_ema.msgpack"]
         if args.ema_decay > 0.0 else []))
    log["train_s"] = round(time.time() - t0, 1)
    log["losses_every10"] = losses_hist

    from diffusion_model_tpu.train.recorder import save_images

    def gen_and_eval(unet_p, variant_tag):
        """Generate gen_count/class from ``unet_p`` and run the full eval."""
        pipe = DiffusionPipeline(
            unet=unet, unet_params=unet_p, vae=vae, vae_params=vae_params,
            schedule=schedule,
        )
        sampler = CsvConditionSampler(pipe, class_id=1)
        summaries = {}
        for cls, cname in CLASS_NAMES.items():
            d = f"./data/{cname}_224x224_test"
            cls_dir = (f"./generated_by_cond/continued{args.tag}"
                       f"{variant_tag}/{cname}")
            os.makedirs(cls_dir, exist_ok=True)
            sampler.set_class_id(cls)
            imgs = sampler.sample(
                f"{d}/{cname}_224x224_test.csv", count=args.gen_count,
                guidance_scale=3.0, key=jax.random.PRNGKey(100 + cls),
            )
            save_images(cls_dir, imgs)
            res = evaluate_dirs(
                gt_dir=d, gen_dir=cls_dir,
                out_dir=f"./eval_result/{cname}_cont{args.tag}{variant_tag}",
                threshold=128, invert=True, sigma=2.0, save_diff=True)
            s = res["summary"].iloc[0]
            summaries[cname] = {
                k: round(float(s[k]), 4)
                for k in ("iou_mean", "gt_iou_mean", "far_noise_ratio_mean",
                          "gauss_recall_mean", "gauss_recall_median")
            }
            print(f"{cname}{variant_tag}", summaries[cname], flush=True)
        return summaries

    log["metrics"] = gen_and_eval(state.params, "")
    if args.ema_decay > 0.0:
        # same seeds/conditions: raw-vs-EMA is a pure weight A/B
        log["ema_decay"] = args.ema_decay
        log["metrics_ema"] = gen_and_eval(state.ema_params, "_ema")
    with open(f"continue_summary{args.tag}.json", "w") as f:
        json.dump(log, f, indent=2)
    print(json.dumps(log, indent=2), flush=True)


if __name__ == "__main__":
    main()

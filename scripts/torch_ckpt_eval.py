"""Checkpoint-portability proof: run reference-TRAINED torch weights
through the framework pipeline and score them.

Converts a finished torch parity run's ``vae_ref.pth`` + ``unet_ref.pth``
(saved by scripts/torch_reference_run.py, which trains the REAL reference
model classes) with the convert_checkpoint importer, generates the same
per-class test-CSV conditions with the framework's TPU pipeline, and runs
the standard IoU/noise eval. Comparing the resulting metrics against the
torch run's own ``torch_ref_summary.json`` proves the whole conversion +
inference stack end-to-end: a reference user can bring trained weights
across and get the same model, orders of magnitude faster.

(Outputs differ only by sampler RNG — torch.randn vs JAX PRNG draws —
so metrics are expected to match within per-class sampling noise, not
bit-for-bit.)

Usage: python scripts/torch_ckpt_eval.py --torch_root ./parity96b_torch
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
    ap.add_argument("--torch_root", default="./parity96b_torch",
                    help="finished torch_reference_run.py output dir")
    ap.add_argument("--out_root", default=None,
                    help="work dir (default <torch_root>_fwports)")
    ap.add_argument("--image_size", type=int, default=96)
    ap.add_argument("--gen_count", type=int, default=64)
    ap.add_argument("--timesteps", type=int, default=1000)
    ap.add_argument("--guidance", type=float, default=3.0)
    args = ap.parse_args()

    troot = os.path.abspath(args.torch_root)
    root = os.path.abspath(args.out_root or (args.torch_root.rstrip("/")
                                             + "_fwports"))
    os.makedirs(root, exist_ok=True)

    from diffusion_model_tpu.cli.convert_checkpoint import main as convert
    from diffusion_model_tpu.data.geometry import CLASS_NAMES
    from diffusion_model_tpu.diffusion import DiffusionSchedule
    from diffusion_model_tpu.eval import evaluate_dirs
    from diffusion_model_tpu.models import (VAE, CondUNet, UNetConfig,
                                            VAEConfig)
    from diffusion_model_tpu.pipeline import (CsvConditionSampler,
                                              DiffusionPipeline)
    from diffusion_model_tpu.train.checkpoints import load_params
    from diffusion_model_tpu.train.recorder import save_images

    log = {"config": vars(args)}
    t0 = time.time()

    # ---- convert both checkpoints (arch inferred + validated) ----
    vae_ck = os.path.join(root, "vae_ref.msgpack")
    unet_ck = os.path.join(root, "unet_ref.msgpack")
    convert(["--input", os.path.join(troot, "vae_ref.pth"),
             "--output", vae_ck])
    convert(["--input", os.path.join(troot, "unet_ref.pth"),
             "--output", unet_ck])
    with open(vae_ck + ".arch.json") as f:
        vae_arch = json.load(f)
    with open(unet_ck + ".arch.json") as f:
        unet_arch = json.load(f)
    log["vae_arch"], log["unet_arch"] = vae_arch, unet_arch

    vae = VAE(VAEConfig(base_channels=vae_arch["base_channels"],
                        z_channels=vae_arch["z_channels"]))
    unet = CondUNet(UNetConfig(
        in_ch=unet_arch["in_ch"], base_ch=unet_arch["base_ch"],
        time_dim=unet_arch["time_dim"], num_classes=unet_arch["num_classes"],
        with_geom_head=unet_arch["with_geom_head"],
        geom_dim=unet_arch.get("geom_dim", 12),
        remove_deep_conv=unet_arch["remove_deep_conv"]))
    # structure targets for msgpack deserialization
    import jax.numpy as jnp
    gd = unet_arch.get("geom_dim", 12)
    vae_t = jax.eval_shape(
        lambda k1, k2: vae.init({"params": k1, "sample": k2},
                                jnp.zeros((1, 32, 32, 3))),
        jax.random.PRNGKey(0), jax.random.PRNGKey(1))["params"]
    unet_t = jax.eval_shape(
        lambda k: unet.init(k, jnp.zeros((1, 16, 16, unet_arch["in_ch"])),
                            jnp.ones((1,), jnp.int32),
                            jnp.ones((1,), jnp.int32),
                            jnp.zeros((1, gd)), jnp.ones((1, gd))),
        jax.random.PRNGKey(0))["params"]
    vae_params = load_params(vae_ck, vae_t)
    unet_params = load_params(unet_ck, unet_t)
    log["convert_s"] = round(time.time() - t0, 1)
    print(f"converted both checkpoints in {log['convert_s']}s", flush=True)

    # ---- generate with the framework pipeline (same conditions the torch
    # run generated from: test CSVs, guidance, seed family) ----
    t1 = time.time()
    hw = (args.image_size, args.image_size)
    pipe = DiffusionPipeline(
        unet=unet, unet_params=unet_params, vae=vae, vae_params=vae_params,
        schedule=DiffusionSchedule.create(args.timesteps))
    sampler = CsvConditionSampler(pipe, class_id=1, image_hw=hw)
    gen_root = os.path.join(root, "generated_by_cond", "torch_ported")
    summaries = {}
    for cls, cname in CLASS_NAMES.items():
        d = os.path.join(troot, "data",
                         f"{cname}_{hw[0]}x{hw[1]}_test")
        sampler.set_class_id(cls)
        imgs = sampler.sample(
            os.path.join(d, f"{cname}_{hw[0]}x{hw[1]}_test.csv"),
            count=args.gen_count, guidance_scale=args.guidance,
            key=jax.random.PRNGKey(100 + cls))
        cls_dir = os.path.join(gen_root, cname)
        os.makedirs(cls_dir, exist_ok=True)
        save_images(cls_dir, imgs)
        print(f"generated {len(imgs)} {cname}", flush=True)

        res = evaluate_dirs(
            gt_dir=d, gen_dir=cls_dir,
            out_dir=os.path.join(root, "eval_result", cname),
            threshold=128, invert=True, sigma=2.0, save_diff=False)
        s = res["summary"].iloc[0]
        summaries[cname] = {
            k: round(float(s[k]), 4)
            for k in ("iou_mean", "gt_iou_mean", "far_noise_ratio_mean",
                      "gauss_recall_mean", "gauss_recall_median")}
        print(cname, summaries[cname], flush=True)
    log["gen_eval_s"] = round(time.time() - t1, 1)
    log["metrics"] = summaries

    # ---- side-by-side with the torch run's own eval ----
    try:
        with open(os.path.join(troot, "torch_ref_summary.json")) as f:
            log["torch_metrics"] = json.load(f).get("metrics")
    except OSError:
        log["torch_metrics"] = None

    out = os.path.join(root, "torch_ckpt_eval.json")
    with open(out, "w") as f:
        json.dump(log, f, indent=2)
    print(json.dumps(log, indent=2), flush=True)
    print(f"DONE -> {out}", flush=True)


if __name__ == "__main__":
    main()

"""Resume scripts/torch_reference_run.py from its saved checkpoints.

The full run trains the reference stack (vae_ref.pth / unet_ref.pth) before
generating + evaluating; if generation was interrupted, this script reloads
the checkpoints, generates ONLY the classes whose output directory is
missing/incomplete, and (re)runs the evaluation for all classes, producing
the same torch_ref_summary.json (without the training timings).

Usage: python scripts/torch_reference_resume.py --root ./parity64_torch
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("MPLBACKEND", "Agg")

from torch_reference_run import _install_torchvision_shim  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="./parity64_torch")
    ap.add_argument("--image_size", type=int, default=64)
    ap.add_argument("--timesteps", type=int, default=1000)
    ap.add_argument("--gen_count", type=int, default=32)
    ap.add_argument("--guidance", type=float, default=3.0)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    import torch

    _install_torchvision_shim()
    import matplotlib

    sys.path.insert(0, "/root/reference")
    from models.vae import VAE as RefVAE  # noqa: E402
    from models.unet_cond_geom import UnetCondWithGeomHead  # noqa: E402
    from diff import Diffuser  # noqa: E402

    matplotlib.use("Agg", force=True)

    from diffusion_model_tpu.data import geometry as G
    from diffusion_model_tpu.data.geometry import CLASS_NAMES
    from diffusion_model_tpu.eval import evaluate_dirs

    root = os.path.abspath(args.root)
    os.chdir(root)
    hw = (args.image_size, args.image_size)
    log = {"config": vars(args), "stack": "torch-reference", "resumed": True}
    t0 = time.time()

    vae = RefVAE()
    vae.load_state_dict(torch.load("./vae_ref.pth", weights_only=True))
    vae.eval()
    model = UnetCondWithGeomHead(in_ch=4, time_dim=256, num_classes=3,
                                 cfg_drop_prob=0.0, geom_dim=12)
    model.load_state_dict(torch.load("./unet_ref.pth", weights_only=True))
    model.eval()
    diffuser = Diffuser(device="cpu", num_timesteps=args.timesteps)

    test_dirs = {
        cls: os.path.join("./data", f"{name}_{hw[0]}x{hw[1]}_test")
        for cls, name in CLASS_NAMES.items()
    }
    lat = args.image_size // 8
    gen_root = "./generated_by_cond/torch_ref"
    import pandas as pd
    from PIL import Image

    for cls, d in test_dirs.items():
        cname = CLASS_NAMES[cls]
        out_dir = os.path.join(gen_root, cname)
        have = len([f for f in os.listdir(out_dir)
                    if f.startswith("pic") and f.endswith(".png")]
                   ) if os.path.isdir(out_dir) else 0
        if have >= args.gen_count:
            print(f"skip {cname}: {have} images present", flush=True)
            continue
        rows = pd.read_csv(
            f"{d}/{os.path.basename(d)}.csv", header=None
        ).to_numpy(np.float32)[: args.gen_count]
        vals, mask = G.conditions_from_csv_rows(
            rows, cls, image_size=(float(hw[0]), float(hw[1])),
            angle_mode="heuristic",
        )
        B = len(vals)
        vals_t, mask_t = torch.from_numpy(vals), torch.from_numpy(mask)
        y = torch.full((B,), cls, dtype=torch.long)
        g = torch.Generator().manual_seed(100 + cls)
        x = torch.randn(B, 4, lat, lat, generator=g)
        tg = time.time()
        with torch.no_grad():
            for i in range(args.timesteps, 0, -1):
                t = torch.full((B,), i, dtype=torch.long)
                x = diffuser.denoise_cond(model, x, t, y=y,
                                          guidance_scale=args.guidance,
                                          cond_vals=vals_t, cond_mask=mask_t)
            imgs = torch.cat([vae.decode(x[s:s + 8])
                              for s in range(0, B, 8)])
        os.makedirs(out_dir, exist_ok=True)
        arr = (imgs.permute(0, 2, 3, 1).numpy() * 255).clip(0, 255)
        for i, a in enumerate(arr.astype(np.uint8)):
            Image.fromarray(a).save(os.path.join(out_dir, f"pic{i + 1}.png"))
        print(f"generated {B} {cname} in {time.time() - tg:.0f}s", flush=True)
    log["gen_s"] = round(time.time() - t0, 1)

    t4 = time.time()
    summaries = {}
    for cls, d in test_dirs.items():
        cname = CLASS_NAMES[cls]
        res = evaluate_dirs(
            gt_dir=d, gen_dir=os.path.join(gen_root, cname),
            out_dir=f"./eval_result_torch/{cname}", threshold=128,
            invert=True, sigma=2.0, save_diff=False,
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
    with open("torch_ref_summary.json", "w") as f:
        json.dump(log, f, indent=2)
    print(json.dumps(log, indent=2), flush=True)


if __name__ == "__main__":
    main()

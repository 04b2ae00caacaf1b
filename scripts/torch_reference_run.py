"""Run the ACTUAL PyTorch reference end-to-end on our synthetic dataset.

Measures the "IoU parity" half of the north star (BASELINE.md): the
reference stack (/root/reference models + Diffuser, imported as-is) is
trained and evaluated on the SAME rendered line/circle/arc data and with the
SAME eval pipeline as scripts/quality_run.py, so the two stacks' metric
tables are directly comparable. CPU-feasible via 64px images (latent 8×8);
both stacks use the reference's full-width models (the reference U-Net
hardcodes base 64).

The reference is imported, not copied; a minimal torchvision shim provides
the two transforms diff.py imports (the wheel is not in this image), and the
training/generation loops below re-state train_latent_cond.py:108-219 /
generate_cond.py semantics because the reference scripts hardcode Windows
paths and CUDA autocast calls (SURVEY.md §5 config notes, diff.py:351,362).

Usage: python scripts/torch_reference_run.py --root ./parity64 [--fast]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("MPLBACKEND", "Agg")


def _install_torchvision_shim():
    """diff.py imports torchvision.transforms only for ToPILImage/ToTensor;
    provide equivalents (torchvision is not installed in this image)."""
    import torch
    from PIL import Image

    tv = types.ModuleType("torchvision")
    tr = types.ModuleType("torchvision.transforms")

    class ToPILImage:
        def __call__(self, x):
            a = (x.permute(1, 2, 0) if x.ndim == 3 else x).numpy()
            return Image.fromarray(a.astype("uint8"))

    class ToTensor:
        def __call__(self, img):
            a = np.asarray(img, dtype=np.float32) / 255.0
            return torch.from_numpy(a).permute(2, 0, 1)

    tr.ToPILImage, tr.ToTensor = ToPILImage, ToTensor
    tv.transforms = tr
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tr


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="./parity64")
    ap.add_argument("--image_size", type=int, default=64)
    ap.add_argument("--train_count", type=int, default=256)
    ap.add_argument("--val_count", type=int, default=48)
    ap.add_argument("--test_count", type=int, default=32)
    ap.add_argument("--vae_epochs", type=int, default=20)
    ap.add_argument("--vae_bs", type=int, default=64)
    ap.add_argument("--latent_epochs", type=int, default=100)
    ap.add_argument("--latent_bs", type=int, default=32)
    ap.add_argument("--latent_lr", type=float, default=1e-4,
                    help="reference default 1e-4 (train_latent_cond.py); "
                         "set 2e-4 for the lr-matched cross-stack pair")
    ap.add_argument("--timesteps", type=int, default=1000)
    ap.add_argument("--gen_count", type=int, default=32)
    ap.add_argument("--guidance", type=float, default=3.0)
    ap.add_argument("--cfg_drop", type=float, default=0.1)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--fast", action="store_true")
    ap.add_argument("--ckpt_every", type=int, default=10,
                    help="save a resumable stage-2 checkpoint every N epochs")
    ap.add_argument("--resume", action="store_true",
                    help="resume from vae_ref.pth / unet_ref_ck.pth in --root "
                         "(epoch permutation streams restart, noted in the log)")
    args = ap.parse_args()
    if args.fast:
        args.train_count, args.val_count, args.test_count = 32, 8, 4
        args.vae_epochs, args.latent_epochs = 1, 1
        args.timesteps, args.gen_count = 8, 2

    # keep the metric/eval imports (jax-based) off the TPU tunnel
    import jax

    jax.config.update("jax_platforms", "cpu")

    import torch

    torch.manual_seed(args.seed)
    _install_torchvision_shim()
    import matplotlib

    sys.path.insert(0, "/root/reference")
    from models.vae import VAE as RefVAE  # noqa: E402
    from models.unet_cond_geom import UnetCondWithGeomHead  # noqa: E402
    from diff import Diffuser  # noqa: E402

    matplotlib.use("Agg", force=True)  # diff.py forces TkAgg; stay headless

    from diffusion_model_tpu.data import LabelDataset
    from diffusion_model_tpu.data import geometry as G
    from diffusion_model_tpu.data.geometry import CLASS_NAMES
    from diffusion_model_tpu.data.synthetic import generate_all_classes
    from diffusion_model_tpu.eval import evaluate_dirs

    root = os.path.abspath(args.root)
    os.makedirs(root, exist_ok=True)
    os.chdir(root)
    hw = (args.image_size, args.image_size)
    log = {"config": vars(args), "stack": "torch-reference"}
    t0 = time.time()

    # ---- shared synthetic data (identical seeds to the framework run) ----
    print("== rendering datasets ==", flush=True)
    train_dirs = generate_all_classes("./data", args.train_count, seed=1,
                                      image_size=hw)
    val_dirs = generate_all_classes("./data", args.val_count, seed=2,
                                    suffix="_val", image_size=hw)
    test_dirs = generate_all_classes("./data", args.test_count, seed=3,
                                     suffix="_test", image_size=hw)

    def materialize(dirs):
        items = [(f"{d}/{os.path.basename(d)}.csv", d, cls)
                 for cls, d in dirs.items()]
        data = LabelDataset(items, image_size=hw).materialize()
        img = torch.from_numpy(
            data["image_u8"].astype(np.float32) / 255.0
        ).permute(0, 3, 1, 2)
        return (img, torch.from_numpy(data["vals"]),
                torch.from_numpy(data["mask"]),
                torch.from_numpy(data["y"].astype(np.int64)))

    tr_img, tr_vals, tr_mask, tr_y = materialize(train_dirs)
    va_img, _, _, _ = materialize(val_dirs)
    log["data_s"] = round(time.time() - t0, 1)
    print(f"data: train={len(tr_img)} in {log['data_s']}s", flush=True)

    # ---- stage 1: reference VAE (train_vae.py:17-47 loop semantics) ----
    t1 = time.time()
    vae = RefVAE()
    opt = torch.optim.Adam(vae.parameters(), lr=1e-3)
    rng = np.random.default_rng(args.seed)
    if args.resume and os.path.exists("./vae_ref.pth"):
        vae.load_state_dict(torch.load("./vae_ref.pth", weights_only=True))
        vae.eval()
        with torch.no_grad():
            vloss = float(vae(va_img)[2])
        print(f"resumed VAE from ./vae_ref.pth (val={vloss:.5f})", flush=True)
        args_vae_epochs = 0
    else:
        args_vae_epochs = args.vae_epochs
    for ep in range(1, args_vae_epochs + 1):
        perm = rng.permutation(len(tr_img))
        losses = []
        vae.train()
        for s in range(0, len(perm), args.vae_bs):
            xb = tr_img[perm[s:s + args.vae_bs]]
            _, _, loss, _ = vae(xb)
            opt.zero_grad()
            loss.backward()
            opt.step()
            losses.append(float(loss))
        vae.eval()
        with torch.no_grad():
            vloss = float(vae(va_img)[2])
        print(f"[vae {ep:02d}] train={np.mean(losses):.5f} val={vloss:.5f}",
              flush=True)
    if args_vae_epochs:
        torch.save(vae.state_dict(), "./vae_ref.pth")
    log["vae_s"] = round(time.time() - t1, 1)
    log["vae_val"] = vloss

    # ---- stage 2: latent cond (train_latent_cond.py:108-170 semantics) ----
    t2 = time.time()
    for p in vae.parameters():
        p.requires_grad = False
    vae.eval()
    model = UnetCondWithGeomHead(in_ch=4, time_dim=256, num_classes=3,
                                 cfg_drop_prob=0.0, geom_dim=12)
    diffuser = Diffuser(device="cpu", num_timesteps=args.timesteps)
    opt = torch.optim.Adam(model.parameters(), lr=args.latent_lr)
    start_ep = 1
    if args.resume and os.path.exists("./unet_ref_ck.pth"):
        ck = torch.load("./unet_ref_ck.pth", weights_only=False)
        model.load_state_dict(ck["model"])
        opt.load_state_dict(ck["opt"])
        start_ep = int(ck["epoch"]) + 1
        print(f"resumed stage-2 from epoch {ck['epoch']}", flush=True)
        log["resumed_from_epoch"] = int(ck["epoch"])

    def _save_ck(ep):
        tmp = "./unet_ref_ck.pth.tmp"
        torch.save({"model": model.state_dict(), "opt": opt.state_dict(),
                    "epoch": ep}, tmp)
        os.replace(tmp, "./unet_ref_ck.pth")

    losses = []
    for ep in range(start_ep, args.latent_epochs + 1):
        perm = rng.permutation(len(tr_img))
        losses = []
        model.train()
        te = time.time()
        for s in range(0, len(perm), args.latent_bs):
            idx = perm[s:s + args.latent_bs]
            with torch.no_grad():
                z, _ = vae.encode(tr_img[idx])
            B = z.shape[0]
            t = torch.randint(1, args.timesteps + 1, (B,))
            zn, eps = diffuser.add_noise(z, t)
            # external CFG dropout: label → 0 AND vals/mask zeroed
            drop = torch.rand(B) < args.cfg_drop
            y = torch.where(drop, torch.zeros(B, dtype=torch.long),
                            tr_y[idx])
            keep = (~drop).float().unsqueeze(1)
            ep_pred, _ = model(zn, t, y, tr_vals[idx] * keep,
                               tr_mask[idx] * keep)
            loss = torch.nn.functional.mse_loss(ep_pred, eps)
            opt.zero_grad()
            loss.backward()
            opt.step()
            losses.append(float(loss))
        print(f"[latent {ep:03d}] loss={np.mean(losses):.5f} "
              f"({time.time() - te:.0f}s)", flush=True)
        if args.ckpt_every and ep % args.ckpt_every == 0:
            _save_ck(ep)
    torch.save(model.state_dict(), "./unet_ref.pth")
    log["latent_s"] = round(time.time() - t2, 1)
    log["latent_train_losses_tail"] = [round(x, 5) for x in losses[-5:]]

    # ---- generation: T→1 CFG reverse loop per class (diff.py:326-344,
    # avoiding the reference's CUDA-only autocast decode path) ----
    t3 = time.time()
    model.eval()
    lat = args.image_size // 8
    gen_root = "./generated_by_cond/torch_ref"
    for cls, d in test_dirs.items():
        cname = CLASS_NAMES[cls]
        import pandas as pd

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
        with torch.no_grad():
            for i in range(args.timesteps, 0, -1):
                t = torch.full((B,), i, dtype=torch.long)
                x = diffuser.denoise_cond(model, x, t, y=y,
                                          guidance_scale=args.guidance,
                                          cond_vals=vals_t, cond_mask=mask_t)
            imgs = torch.cat([vae.decode(x[s:s + 8])
                              for s in range(0, B, 8)])
        out_dir = os.path.join(gen_root, cname)
        os.makedirs(out_dir, exist_ok=True)
        from PIL import Image

        arr = (imgs.permute(0, 2, 3, 1).numpy() * 255).clip(0, 255)
        for i, a in enumerate(arr.astype(np.uint8)):
            Image.fromarray(a).save(os.path.join(out_dir, f"pic{i + 1}.png"))
        print(f"generated {B} {cname} in {time.time() - t3:.0f}s", flush=True)
    log["gen_s"] = round(time.time() - t3, 1)

    # ---- eval (same pipeline as the framework run) ----
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

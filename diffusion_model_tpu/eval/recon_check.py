"""VAE reconstruction checker.

Capability parity with /root/reference/vae_recon_check.py:9-72 (the usable
``recon_check`` function — the reference script itself is broken, importing a
nonexistent ``Datasets``; SURVEY.md §2): encode→decode batches, per-image
MSE / MAE / PSNR, original-vs-reconstruction grids, metrics CSV + stats
summary.
"""
from __future__ import annotations

import csv
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from ..models import VAE


def image_grid(images: np.ndarray, nrow: int = 8, pad: int = 2) -> Image.Image:
    """Tile (N, H, W, 3) float [0,1] images into one grid image
    (torchvision make_grid equivalent for the reference's usage)."""
    n, h, w, c = images.shape
    ncol = min(nrow, n)
    nrows = (n + ncol - 1) // ncol
    canvas = np.ones(
        (nrows * (h + pad) + pad, ncol * (w + pad) + pad, c), np.float32
    )
    for i in range(n):
        r, cidx = divmod(i, ncol)
        y0 = pad + r * (h + pad)
        x0 = pad + cidx * (w + pad)
        canvas[y0:y0 + h, x0:x0 + w] = images[i]
    return Image.fromarray(
        np.clip(canvas * 255, 0, 255).astype(np.uint8)
    )


def recon_check(
    vae: VAE,
    vae_params,
    dataset,
    out_dir: str = "recon_check",
    batch_size: int = 16,
    max_batches: int = 4,
    key: Optional[jax.Array] = None,
) -> dict:
    """Encode→decode up to ``max_batches`` batches; write orig/recon grids and
    a per-image metrics CSV; return summary stats."""
    os.makedirs(out_dir, exist_ok=True)
    key = key if key is not None else jax.random.PRNGKey(0)
    vae_params = jax.device_put(vae_params)  # avoid re-upload per batch

    @jax.jit
    def roundtrip(params, x, k):
        z, _ = vae.apply({"params": params}, x, method=VAE.encode,
                         rngs={"sample": k})
        return vae.apply({"params": params}, z, method=VAE.decode)

    rows = []
    recon_min, recon_max = np.inf, -np.inf
    n = len(dataset)
    idx = 0
    for b in range(max_batches):
        ids = list(range(idx, min(idx + batch_size, n)))
        if not ids:
            break
        idx += len(ids)
        batch = dataset.batch(ids)
        x = jnp.asarray(batch["image"])
        key, sk = jax.random.split(key)
        recon = np.asarray(roundtrip(vae_params, x, sk))
        x_np = np.asarray(x)
        recon_min = min(recon_min, float(recon.min()))
        recon_max = max(recon_max, float(recon.max()))
        for j, i in enumerate(ids):
            mse = float(np.mean((recon[j] - x_np[j]) ** 2))
            mae = float(np.mean(np.abs(recon[j] - x_np[j])))
            psnr = float(10.0 * np.log10(1.0 / mse)) if mse > 0 else float("inf")
            rows.append({"index": i, "mse": mse, "mae": mae, "psnr": psnr})
        image_grid(x_np).save(os.path.join(out_dir, f"orig_batch{b}.png"))
        image_grid(recon).save(os.path.join(out_dir, f"recon_batch{b}.png"))

    csv_path = os.path.join(out_dir, "recon_metrics.csv")
    with open(csv_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["index", "mse", "mae", "psnr"])
        w.writeheader()
        w.writerows(rows)

    mses = np.array([r["mse"] for r in rows])
    maes = np.array([r["mae"] for r in rows])
    psnrs = np.array([r["psnr"] for r in rows if np.isfinite(r["psnr"])])
    summary = {
        "n_images": len(rows),
        "mse_mean": float(mses.mean()) if rows else float("nan"),
        "mse_std": float(mses.std()) if rows else float("nan"),
        "mae_mean": float(maes.mean()) if rows else float("nan"),
        "psnr_mean": float(psnrs.mean()) if psnrs.size else float("nan"),
        "recon_range": (recon_min, recon_max),
        "csv_path": csv_path,
        "out_dir": out_dir,
    }
    print(
        f"recon_check: n={summary['n_images']} mse={summary['mse_mean']:.6f} "
        f"mae={summary['mae_mean']:.6f} psnr={summary['psnr_mean']:.2f}dB "
        f"recon_range=({recon_min:.3f},{recon_max:.3f})"
    )
    return summary

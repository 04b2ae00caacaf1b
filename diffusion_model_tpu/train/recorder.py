"""Run-artifact writers: record.txt, loss curves, generated images.

Artifact-layout parity with the reference ``Utils``
(/root/reference/utils.py:15-240):

- ``record_result`` → ``result/<YYYY_MM_DD_HH_MM>/{record.txt,
  trained_para.msgpack, losses_train_val.png, losses_train_val.csv,
  generated_pic_arc/pic*.png}`` (utils.py:17-57; ``.pth`` → msgpack);
  unlike the reference it does NOT swallow exceptions (utils.py:59-60 wraps
  everything in a try/except that only prints — a documented bug, SURVEY.md
  §7).
- loss CSV/plot handle sparse NaN val columns (val every 5 epochs) and append
  min rows, matching utils.py:125-213. The duplicate
  ``saveTrainValLossGraph`` definition in the reference (utils.py:98 vs 125;
  second shadows first) collapses to the NaN-aware version here.
- ``save_images`` → ``pic{i+1}.png`` naming (utils.py:216-224).
- structured JSONL step metrics (``metrics.jsonl``) are added on top
  (SURVEY.md §5 rebuild requirement).
"""
from __future__ import annotations

import csv
import json
import os
from typing import Iterable, Optional, Sequence

import numpy as np

import matplotlib

matplotlib.use("Agg")  # headless; the reference forced TkAgg (diff.py:2-3)
import matplotlib.pyplot as plt  # noqa: E402

from ..utils.env import timestamp_dir_name  # noqa: E402
from .checkpoints import save_params  # noqa: E402


def save_train_val_loss_graph(
    dir_path: str,
    train_losses: Sequence[float],
    val_losses: Optional[Sequence[float]],
    filename: str = "losses_train_val.png",
) -> None:
    """Train/val curves; val may be sparse (NaN rows) (utils.py:125-170)."""
    if not train_losses:
        print("Warning: train_losses is empty.")
        return
    epochs = len(train_losses)
    x = np.arange(1, epochs + 1)
    train_arr = np.asarray(train_losses, dtype=float)
    if val_losses is None:
        val_arr = np.full(epochs, np.nan)
    else:
        val_arr = np.asarray(list(val_losses), dtype=float)
        if len(val_arr) < epochs:
            val_arr = np.concatenate(
                [val_arr, np.full(epochs - len(val_arr), np.nan)]
            )
        else:
            val_arr = val_arr[:epochs]

    plt.figure()
    plt.plot(x, train_arr, label="train_loss")
    ok = np.isfinite(val_arr)
    if ok.any():
        plt.plot(x[ok], val_arr[ok], label="val_loss", marker="o",
                 linestyle="-")
    plt.xlabel("Epoch")
    plt.ylabel("Loss")
    plt.title("Train & Val Loss")
    plt.legend()
    plt.grid(True, alpha=0.3)
    plt.tight_layout()
    os.makedirs(dir_path, exist_ok=True)
    plt.savefig(os.path.join(dir_path, filename))
    plt.close()


def save_train_val_loss_csv(
    dir_path: str,
    train_losses: Sequence[float],
    val_losses: Optional[Sequence[float]],
    filename: str = "losses_train_val.csv",
) -> None:
    """epoch,train_loss,val_loss rows + min_train/min_val footer
    (utils.py:173-213); unevaluated val epochs are blank."""
    os.makedirs(dir_path, exist_ok=True)
    if not train_losses:
        print("Warning: train_losses is empty.")
        return
    epochs = len(train_losses)
    train_arr = np.asarray(train_losses, dtype=float)
    if val_losses is None:
        val_arr = np.full(epochs, np.nan)
    else:
        val_arr = np.asarray(list(val_losses), dtype=float)
        if len(val_arr) < epochs:
            val_arr = np.concatenate(
                [val_arr, np.full(epochs - len(val_arr), np.nan)]
            )
        else:
            val_arr = val_arr[:epochs]

    with open(os.path.join(dir_path, filename), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["epoch", "train_loss", "val_loss"])
        for i in range(epochs):
            v = val_arr[i]
            w.writerow(
                [i + 1, float(train_arr[i]),
                 "" if not np.isfinite(v) else float(v)]
            )
        w.writerow(["min_train", float(np.nanmin(train_arr)), ""])
        if np.isfinite(val_arr).any():
            w.writerow(["min_val", "", float(np.nanmin(val_arr))])
        else:
            w.writerow(["min_val", "", ""])


def save_images(dir_path: str, images: Iterable) -> None:
    """Save PIL images (or HWC uint8/float arrays) as pic{i+1}.png
    (utils.py:216-224)."""
    from PIL import Image

    os.makedirs(dir_path, exist_ok=True)
    for i, image in enumerate(images):
        if not hasattr(image, "save"):
            arr = np.asarray(image)
            if arr.dtype != np.uint8:
                arr = np.clip(arr * 255.0, 0, 255).astype(np.uint8)
            image = Image.fromarray(arr)
        image.save(os.path.join(dir_path, f"pic{i + 1}.png"))


def concat_images(dir_path: str, images, rows: int = 2,
                  cols: int = 10) -> str:
    """Tile the first rows×cols images into one gray-background figure
    ``catpic1_{rows*cols}.png`` (utils.py:227-240). Returns the path."""
    import matplotlib.pyplot as plt

    os.makedirs(dir_path, exist_ok=True)
    path = os.path.join(dir_path, f"catpic1_{rows * cols}.png")
    fig = plt.figure(figsize=(cols, rows), facecolor="gray")
    for i in range(min(rows * cols, len(images))):
        ax = fig.add_subplot(rows, cols, i + 1)
        ax.imshow(images[i])
        ax.axis("off")
    plt.savefig(path)
    plt.close(fig)
    return path


def record_result(
    result_root: str = "result",
    model_params=None,
    train_losses: Optional[Sequence[float]] = None,
    val_losses: Optional[Sequence[float]] = None,
    images=None,
    image_dir_name: str = "generated_pic_arc",
    **kwargs,
) -> str:
    """Create ``<result_root>/<timestamp>/`` with the reference's artifact
    set (utils.py:17-57). Returns the run directory path."""
    dir_path = os.path.join(result_root, timestamp_dir_name())
    if os.path.exists(dir_path):
        raise FileExistsError(f"{dir_path} already exists")
    os.makedirs(dir_path)

    if kwargs:
        with open(os.path.join(dir_path, "record.txt"), "w",
                  encoding="utf-8") as f:
            for key, value in kwargs.items():
                if key == "learning_time":
                    f.write(f"{key} : {value} (s)\n")
                else:
                    f.write(f"{key} : {value}\n")

    if model_params is not None:
        save_params(os.path.join(dir_path, "trained_para.msgpack"),
                    model_params)

    if train_losses:
        save_train_val_loss_graph(dir_path, train_losses, val_losses)
        save_train_val_loss_csv(dir_path, train_losses, val_losses)

    if images is not None:
        save_images(os.path.join(dir_path, image_dir_name), images)

    return dir_path


class MetricsLogger:
    """Structured JSONL step/epoch metrics (rebuild addition, SURVEY.md §5)."""

    def __init__(self, path: str):
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self._f = open(path, "a", buffering=1)

    def log(self, **fields) -> None:
        self._f.write(json.dumps(fields) + "\n")

    def close(self) -> None:
        self._f.close()

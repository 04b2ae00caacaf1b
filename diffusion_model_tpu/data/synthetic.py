"""Synthetic line / circle / arc dataset renderer.

The reference trains on a private dataset of 224×224 anti-aliased black
line drawings on white, generated from 400×400 y-up drawing coordinates and
described by headerless 13-column CSVs (SURVEY.md §1 contracts;
/root/reference/custom_dataset.py, entityCsvSampler.py). The generator was
never shipped, so this module provides one: it renders matching images and
writes CSVs in the same schema, making training, generation and IoU-parity
evaluation fully self-contained (it doubles as the test fixture the reference
never had — SURVEY.md §4).

File-naming contracts preserved: images ``p%05d.jpg`` indexed by CSV row
(custom_dataset.py:106-109); caption CSVs with ``image_name,text`` columns for
the VAE stage (custom_dataset.py:14-46).
"""
from __future__ import annotations

import csv
import math
from pathlib import Path
from typing import Optional, Tuple

import numpy as np
from PIL import Image, ImageDraw

from .geometry import CLASS_ARC, CLASS_CIRCLE, CLASS_LINE, CLASS_NAMES


def _draw_to_image_xy(
    x: float, y: float, draw_wh: Tuple[float, float], img_wh: Tuple[int, int]
) -> Tuple[float, float]:
    """Drawing coords (y-up) → raster coords (y-down), scaled to the image."""
    drawW, drawH = draw_wh
    W, H = img_wh
    return x * W / drawW, (drawH - y) * H / drawH


def render_entity(
    class_id: int,
    params: np.ndarray,
    image_size: Tuple[int, int] = (224, 224),
    drawing_size: Tuple[float, float] = (400.0, 400.0),
    line_width: int = 2,
    supersample: int = 4,
) -> Image.Image:
    """Render one entity as black-on-white RGB, anti-aliased via supersampling.

    ``params`` in drawing coordinates, same order as geometry.encode_conditions.
    """
    W, H = image_size
    ss = max(1, int(supersample))
    big = (W * ss, H * ss)
    img = Image.new("L", big, color=255)
    d = ImageDraw.Draw(img)
    lw = max(1, line_width * ss)

    def xy(x, y):
        px, py = _draw_to_image_xy(float(x), float(y), drawing_size, big)
        return px, py

    if class_id == CLASS_LINE:
        x1, y1, x2, y2 = params[:4]
        d.line([xy(x1, y1), xy(x2, y2)], fill=0, width=lw)
    elif class_id == CLASS_CIRCLE:
        cx, cy, r = params[:3]
        pcx, pcy = xy(cx, cy)
        pr = float(r) * big[0] / drawing_size[0]
        d.ellipse([pcx - pr, pcy - pr, pcx + pr, pcy + pr], outline=0, width=lw)
    elif class_id == CLASS_ARC:
        cx, cy, r, t1, t2 = params[:5]
        pcx, pcy = xy(cx, cy)
        pr = float(r) * big[0] / drawing_size[0]
        # Drawing angles are measured CCW in y-up coordinates; PIL measures
        # CW from 3 o'clock in raster (y-down) coordinates, so negate and swap.
        start, end = -float(t2), -float(t1)
        d.arc([pcx - pr, pcy - pr, pcx + pr, pcy + pr], start=start, end=end,
              fill=0, width=lw)
    else:
        raise ValueError("class_id must be 1(line), 2(circle), or 3(arc).")

    if ss > 1:
        img = img.resize((W, H), resample=Image.LANCZOS)
    return img.convert("RGB")


def sample_entity_params(
    class_id: int,
    rng: np.random.Generator,
    drawing_size: Tuple[float, float] = (400.0, 400.0),
) -> np.ndarray:
    """Random entity parameters in drawing coordinates, kept inside the canvas."""
    drawW, drawH = drawing_size
    margin = 0.08 * min(drawW, drawH)
    if class_id == CLASS_LINE:
        while True:
            p = rng.uniform([margin, margin, margin, margin],
                            [drawW - margin, drawH - margin,
                             drawW - margin, drawH - margin])
            if math.hypot(p[2] - p[0], p[3] - p[1]) > 0.15 * min(drawW, drawH):
                return p.astype(np.float32)
    if class_id == CLASS_CIRCLE:
        r = rng.uniform(0.06 * drawW, 0.35 * drawW)
        cx = rng.uniform(r + margin, drawW - r - margin)
        cy = rng.uniform(r + margin, drawH - r - margin)
        return np.array([cx, cy, r], dtype=np.float32)
    if class_id == CLASS_ARC:
        r = rng.uniform(0.08 * drawW, 0.35 * drawW)
        cx = rng.uniform(r + margin, drawW - r - margin)
        cy = rng.uniform(r + margin, drawH - r - margin)
        t1 = rng.uniform(0.0, 360.0)
        sweep = rng.uniform(40.0, 300.0)
        t2 = (t1 + sweep) % 360.0
        return np.array([cx, cy, r, t1, t2], dtype=np.float32)
    raise ValueError("class_id must be 1(line), 2(circle), or 3(arc).")


def generate_dataset(
    out_dir: str,
    class_id: int,
    count: int,
    image_size: Tuple[int, int] = (224, 224),
    drawing_size: Tuple[float, float] = (400.0, 400.0),
    seed: int = 0,
    name: Optional[str] = None,
    write_caption_csv: bool = True,
    line_width: int = 2,
) -> str:
    """Render ``count`` entities into ``out_dir/<name>/`` with the reference's
    directory contract: images ``p%05d.jpg`` plus a headerless 13-column
    geometry CSV named ``<name>.csv`` (and optionally a ``*_caption.csv`` with
    ``image_name,text`` columns for the VAE stage).

    Returns the dataset directory path.

    Idempotent: if the directory already holds a complete dataset (CSV with
    ``count`` rows, last image present), it is left untouched — rendering is
    deterministic given ``seed``, so regeneration would write identical
    bytes anyway, and skipping keeps concurrent readers (e.g. a torch
    cross-stack run sharing the data) safe from partial-file windows.
    """
    cname = CLASS_NAMES[class_id]
    if name is None:
        name = f"{cname}_{image_size[0]}x{image_size[1]}"
    ds_dir = Path(out_dir) / name
    csv_path = ds_dir / f"{name}.csv"
    if csv_path.exists() and (ds_dir / f"p{count - 1:05d}.jpg").exists():
        with open(csv_path, newline="") as f:
            if sum(1 for _ in f) == count:
                return str(ds_dir)
    ds_dir.mkdir(parents=True, exist_ok=True)

    rng = np.random.default_rng(seed)
    rows = []
    cap_rows = []
    for i in range(count):
        p = sample_entity_params(class_id, rng, drawing_size)
        img = render_entity(class_id, p, image_size, drawing_size,
                            line_width=line_width)
        img_name = f"p{i:05d}.jpg"
        img.save(ds_dir / img_name, quality=95)

        row = [0.0] * 13
        if class_id == CLASS_LINE:
            row[1:5] = [float(v) for v in p[:4]]
        elif class_id == CLASS_CIRCLE:
            row[5:8] = [float(v) for v in p[:3]]
        else:
            row[8:13] = [float(v) for v in p[:5]]
        rows.append(row)
        cap_rows.append((img_name, f"a {cname} drawing"))

    with open(ds_dir / f"{name}.csv", "w", newline="") as f:
        w = csv.writer(f)
        for row in rows:
            w.writerow(row)

    if write_caption_csv:
        with open(ds_dir / f"{name}_caption.csv", "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["image_name", "text"])
            w.writerows(cap_rows)

    return str(ds_dir)


def generate_all_classes(
    out_dir: str,
    count_per_class: int,
    image_size: Tuple[int, int] = (224, 224),
    seed: int = 0,
    suffix: str = "",
) -> dict:
    """Generate one dataset directory per class; returns {class_id: dir}."""
    dirs = {}
    for cls in (CLASS_LINE, CLASS_CIRCLE, CLASS_ARC):
        name = f"{CLASS_NAMES[cls]}_{image_size[0]}x{image_size[1]}{suffix}"
        dirs[cls] = generate_dataset(
            out_dir, cls, count_per_class, image_size=image_size,
            seed=seed + cls, name=name,
        )
    return dirs

"""Canonical geometry-condition encoding for line / circle / arc entities.

This is the SINGLE implementation of the drawing-coordinate → normalized
condition-vector transform that the reference duplicates in two places
(/root/reference/custom_dataset.py:121-176 and
/root/reference/entityCsvSampler.py:101-163); SURVEY.md §4 requires the two
to be provably equal, so here there is only one.

Contracts (SURVEY.md §1 cross-layer contracts):
- 12-key order: ``x1 y1 x2 y2 cx cy cr ax ay ar theta1 theta2``
- class ids: 1 = line, 2 = circle, 3 = arc; 0 = null/unconditional (CFG)
- per-class key masks: line → {x1,y1,x2,y2}, circle → {cx,cy,cr},
  arc → {ax,ay,ar,theta1,theta2}
- drawing coords (default 400×400, y-up) → normalized [0,1] image coords with
  a Y-flip; radius normalized by drawing width; angles divided by 360.
  With matching aspect ratios this reduces to ``x/drawW``, ``1 - y/drawH``,
  ``r/drawW`` (the shortcut form in entityCsvSampler.py:113-127; equal to the
  long form in custom_dataset.py:121-141 — pinned by tests).
- headerless 13-column CSV schema: col0 dummy; cols1-4 line x1,y1,x2,y2;
  cols5-7 circle cx,cy,cr; cols8-12 arc ax,ay,ar,theta1,theta2
  (entityCsvSampler.py:14-23).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

KEY_ORDER: List[str] = [
    "x1", "y1", "x2", "y2",
    "cx", "cy", "cr",
    "ax", "ay", "ar", "theta1", "theta2",
]
KEY_INDEX: Dict[str, int] = {k: i for i, k in enumerate(KEY_ORDER)}
GEOM_DIM = len(KEY_ORDER)

CLASS_LINE, CLASS_CIRCLE, CLASS_ARC = 1, 2, 3
NULL_LABEL = 0
CLASS_NAMES = {CLASS_LINE: "line", CLASS_CIRCLE: "circle", CLASS_ARC: "arc"}

CLASS_KEYS: Dict[int, List[str]] = {
    CLASS_LINE: ["x1", "y1", "x2", "y2"],
    CLASS_CIRCLE: ["cx", "cy", "cr"],
    CLASS_ARC: ["ax", "ay", "ar", "theta1", "theta2"],
}

# Column slices of the headerless 13-column CSV, per class.
CSV_COLUMNS: Dict[int, List[int]] = {
    CLASS_LINE: [1, 2, 3, 4],
    CLASS_CIRCLE: [5, 6, 7],
    CLASS_ARC: [8, 9, 10, 11, 12],
}


def class_mask(class_id: int) -> np.ndarray:
    """(GEOM_DIM,) 0/1 mask of the keys a class uses."""
    m = np.zeros(GEOM_DIM, dtype=np.float32)
    for k in CLASS_KEYS.get(int(class_id), []):
        m[KEY_INDEX[k]] = 1.0
    return m


def normalize_angle(v: np.ndarray) -> np.ndarray:
    """Sampler-side angle heuristic: values with |v| > 1 are degrees
    (mod 360 / 360); values already in [0,1] pass through
    (entityCsvSampler.py:192-199). Used ONLY for user-supplied sampling
    conditions — the training encoder uses :func:`angle_plain`. The two
    differ at theta ≤ 1 degree (pass-through vs /360) and theta = 360
    (wrap to 0 vs 1.0)."""
    out = np.asarray(v, dtype=np.float32).copy()
    deg = np.abs(out) > 1.0
    out[deg] = (out[deg] % 360.0) / 360.0
    return out


def angle_plain(v: np.ndarray) -> np.ndarray:
    """Training-side angle encoding: plain degrees / 360, no mod and no
    pass-through (custom_dataset.py:174-176 always computes t/360)."""
    return np.asarray(v, dtype=np.float32) / 360.0


def encode_conditions(
    raw: np.ndarray,
    class_id: int,
    drawing_size: Tuple[float, float] = (400.0, 400.0),
    image_size: Tuple[float, float] = (224.0, 224.0),
    angle_mode: str = "plain",
) -> Tuple[np.ndarray, np.ndarray]:
    """Raw drawing-coordinate rows → (vals, mask), both (B, GEOM_DIM) float32.

    ``raw`` is (B, n_params) in the class's parameter order:
      line   (4): x1, y1, x2, y2
      circle (3): cx, cy, r
      arc    (5): cx, cy, r, theta1, theta2

    The transform is drawing → image coords (scale sx = W_img/drawW,
    sy = H_img/drawH, Y-flip y_img = (drawH - y)·sy) followed by 0-1
    normalization by the image size; radii use the isotropic x-scale and are
    normalized by image width (custom_dataset.py:121-141).

    ``angle_mode`` selects the reference's two arc-angle encodings:
    ``"plain"`` (training, t/360 — custom_dataset.py:174-176) or
    ``"heuristic"`` (sampling, |v|>1 → v%360/360, else pass-through —
    entityCsvSampler.py:192-199). They agree for 1 < t < 360.
    """
    raw = np.asarray(raw, dtype=np.float32)
    if raw.ndim == 1:
        raw = raw[None, :]
    B = raw.shape[0]
    drawW, drawH = float(drawing_size[0]), float(drawing_size[1])
    W, H = float(image_size[0]), float(image_size[1])
    sx, sy = W / drawW, H / drawH

    def nx(x_draw: np.ndarray) -> np.ndarray:
        return (x_draw * sx) / W  # == x_draw / drawW

    def ny(y_draw: np.ndarray) -> np.ndarray:
        return ((drawH - y_draw) * sy) / H  # == 1 - y_draw / drawH

    def nr(r_draw: np.ndarray) -> np.ndarray:
        return (r_draw * sx) / W  # == r_draw / drawW

    vals = np.zeros((B, GEOM_DIM), dtype=np.float32)
    if class_id == CLASS_LINE:
        vals[:, KEY_INDEX["x1"]] = nx(raw[:, 0])
        vals[:, KEY_INDEX["y1"]] = ny(raw[:, 1])
        vals[:, KEY_INDEX["x2"]] = nx(raw[:, 2])
        vals[:, KEY_INDEX["y2"]] = ny(raw[:, 3])
    elif class_id == CLASS_CIRCLE:
        vals[:, KEY_INDEX["cx"]] = nx(raw[:, 0])
        vals[:, KEY_INDEX["cy"]] = ny(raw[:, 1])
        vals[:, KEY_INDEX["cr"]] = nr(raw[:, 2])
    elif class_id == CLASS_ARC:
        vals[:, KEY_INDEX["ax"]] = nx(raw[:, 0])
        vals[:, KEY_INDEX["ay"]] = ny(raw[:, 1])
        vals[:, KEY_INDEX["ar"]] = nr(raw[:, 2])
        enc = normalize_angle if angle_mode == "heuristic" else angle_plain
        vals[:, KEY_INDEX["theta1"]] = enc(raw[:, 3])
        vals[:, KEY_INDEX["theta2"]] = enc(raw[:, 4])
    else:
        raise ValueError("class_id must be 1(line), 2(circle), or 3(arc).")

    mask = np.tile(class_mask(class_id), (B, 1))
    return vals, mask


def conditions_from_csv_rows(
    rows: np.ndarray,
    class_id: int,
    drawing_size: Optional[Tuple[float, float]] = (400.0, 400.0),
    image_size: Tuple[float, float] = (224.0, 224.0),
    angle_mode: str = "plain",
) -> Tuple[np.ndarray, np.ndarray]:
    """Headerless 13-column CSV rows (B, 13) → (vals, mask).

    If ``drawing_size`` is None it is inferred from the data via
    :func:`infer_drawing_size` (entityCsvSampler.py:167-190).
    ``angle_mode``: "plain" for training encodes (LabelDataset),
    "heuristic" for sampling-side CSV conditions (EntityCsvSampler).
    """
    rows = np.asarray(rows, dtype=np.float32)
    if rows.ndim == 1:
        rows = rows[None, :]
    if drawing_size is None:
        drawing_size = infer_drawing_size(rows, class_id)
    raw = rows[:, CSV_COLUMNS[class_id]]
    return encode_conditions(raw, class_id, drawing_size, image_size,
                             angle_mode=angle_mode)


_SNAP_CHOICES = (224, 256, 280, 300, 320, 384, 400, 448)


def snap_size(v: float, tol: float = 1.5) -> float:
    """Snap an inferred extent to a canonical canvas size
    (entityCsvSampler.py:167-172)."""
    for c in _SNAP_CHOICES:
        if abs(v - c) <= tol:
            return float(c)
    return float(v)


def infer_drawing_size(rows: np.ndarray, class_id: int) -> Tuple[float, float]:
    """Infer the drawing canvas (W, H) from coordinate maxima, snapped to
    canonical sizes (entityCsvSampler.py:174-190)."""
    rows = np.asarray(rows, dtype=np.float32)
    if class_id == CLASS_LINE:
        xs = rows[:, [1, 3]]
        ys = rows[:, [2, 4]]
    elif class_id == CLASS_CIRCLE:
        xs = rows[:, [5]]
        ys = rows[:, [6]]
    elif class_id == CLASS_ARC:
        xs = rows[:, [8]]
        ys = rows[:, [9]]
    else:
        raise ValueError("class_id must be 1(line), 2(circle), or 3(arc).")
    return snap_size(float(np.max(np.abs(xs)))), snap_size(float(np.max(np.abs(ys))))


def conditions_from_dicts(
    cond: object,
    cond_mask: object,
    y_list: List[int],
) -> Tuple[np.ndarray, np.ndarray]:
    """Dict / list-of-dict / array condition inputs → (B, K) vals and mask.

    Mirrors the input-normalization surface of ``sample_latent_cond``
    (/root/reference/diff.py:241-312):

    - ``cond`` as ``{class_id: {key: val}}``: per-class values broadcast to
      every sample of that class; mask auto-set to 1 for provided keys unless
      an explicit dict mask overrides.
    - ``cond`` as ``[{key: val}, ...]`` (length B): per-sample values.
    - ``cond`` as an (B, K) array: used directly; missing mask defaults to
      ``vals != 0``.
    - ``cond`` None: zeros, with the mask built from each sample's class keys.
    """
    B, K = len(y_list), GEOM_DIM
    if isinstance(cond, np.ndarray) or hasattr(cond, "shape"):
        vals = np.asarray(cond, dtype=np.float32)
        if vals.shape != (B, K):
            raise ValueError(f"cond array must be (B={B}, K={K}); got {vals.shape}")
        if cond_mask is None:
            mask = (vals != 0).astype(np.float32)
        else:
            mask = np.asarray(cond_mask, dtype=np.float32)
            if mask.shape != vals.shape:
                raise ValueError("cond_mask must match cond's (B, K) shape")
        return vals, mask

    vals = np.zeros((B, K), dtype=np.float32)
    mask = np.zeros((B, K), dtype=np.float32)

    if cond is None:
        for i, cls in enumerate(y_list):
            mask[i] = class_mask(cls)
        return vals, mask

    if isinstance(cond, dict):
        for i, cls in enumerate(y_list):
            if cls in cond:
                for k, v in cond[cls].items():
                    if k in KEY_INDEX:
                        vals[i, KEY_INDEX[k]] = float(v)
                        if isinstance(cond_mask, dict):
                            mask[i, KEY_INDEX[k]] = float(
                                cond_mask.get(cls, {}).get(k, 1.0)
                            )
                        else:
                            mask[i, KEY_INDEX[k]] = 1.0
            if isinstance(cond_mask, dict) and cls in cond_mask:
                for k, mv in cond_mask[cls].items():
                    if k in KEY_INDEX:
                        mask[i, KEY_INDEX[k]] = float(mv)
        return vals, mask

    if isinstance(cond, list):
        if len(cond) != B:
            raise ValueError(f"cond list length {len(cond)} != batch {B}")
        for i, d in enumerate(cond):
            for k, v in d.items():
                if k in KEY_INDEX:
                    vals[i, KEY_INDEX[k]] = float(v)
                    if (
                        isinstance(cond_mask, list)
                        and i < len(cond_mask)
                        and k in cond_mask[i]
                    ):
                        mask[i, KEY_INDEX[k]] = float(cond_mask[i][k])
                    else:
                        mask[i, KEY_INDEX[k]] = 1.0
        if isinstance(cond_mask, list) and len(cond_mask) == B:
            for i, d in enumerate(cond_mask):
                for k, mv in d.items():
                    if k in KEY_INDEX:
                        mask[i, KEY_INDEX[k]] = float(mv)
        return vals, mask

    raise ValueError("cond must be None, dict, list of dicts, or an (B, K) array")

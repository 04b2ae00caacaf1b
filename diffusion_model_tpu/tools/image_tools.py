"""Visual tooling: image tile grids, image→video, two-dir comparison videos.

Capability parity with /root/reference/image_tools.py:23-468:

- natural-sort listing (t2.png < t10.png) with t-descending ordering for
  reverse-diffusion ``t{n}`` dumps (image_tools.py:23-46, 175-188);
- ``tile``: r×c matplotlib grid on gray background, optional seeded random
  pick, dpi 200 (:52-126);
- ``video``: images → MP4 (cv2 mp4v), optional border + bottom label strip
  showing ``prefix=num`` (:132-257);
- ``video2``: horizontally concat same-named frames from two dirs with a
  center divider (:262-401);
- argparse subcommands tile/video/video2 (:409-468).
"""
from __future__ import annotations

import argparse
import os
import random
import re
from pathlib import Path
from typing import List, Optional

import numpy as np

_IMG_EXTS = {".png", ".jpg", ".jpeg", ".bmp", ".gif", ".webp"}
_NUM_RE = re.compile(r"(\d+)")
_T_RE = re.compile(r"^t(\d+)$", re.IGNORECASE)


def natural_key(name: str):
    """Split digits so t2 < t10 (image_tools.py:23-34)."""
    return [int(p) if p.isdigit() else p.lower()
            for p in _NUM_RE.split(name)]


def list_images(
    directory: str,
    t_descending: bool = False,
) -> List[str]:
    """Image files, naturally sorted; ``t_descending`` orders t{n} names from
    large t to small (reverse-diffusion playback, image_tools.py:175-188)."""
    d = Path(directory)
    files = [p for p in d.iterdir()
             if p.is_file() and p.suffix.lower() in _IMG_EXTS]
    if t_descending:
        def tkey(p: Path):
            m = _T_RE.match(p.stem)
            return -int(m.group(1)) if m else 0
        files.sort(key=lambda p: (tkey(p), natural_key(p.name)))
    else:
        files.sort(key=lambda p: natural_key(p.name))
    return [str(p) for p in files]


def show_image_tiles(
    directory: str,
    rows: int = 2,
    cols: int = 10,
    out_path: Optional[str] = None,
    random_pick: bool = False,
    seed: Optional[int] = None,
    dpi: int = 200,
    facecolor: str = "gray",
) -> str:
    """r×c tile grid; saves PNG (and never opens a window — headless).
    Returns the output path."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from PIL import Image

    paths = list_images(directory)
    if not paths:
        raise FileNotFoundError(f"no images in {directory}")
    n = rows * cols
    if random_pick:
        rng = random.Random(seed)
        paths = rng.sample(paths, min(n, len(paths)))
    paths = paths[:n]

    fig = plt.figure(figsize=(cols, rows), facecolor=facecolor)
    for i, p in enumerate(paths):
        ax = fig.add_subplot(rows, cols, i + 1)
        ax.imshow(Image.open(p))
        ax.axis("off")
    out_path = out_path or os.path.join(directory, f"tiles_{rows}x{cols}.png")
    fig.savefig(out_path, dpi=dpi, facecolor=facecolor,
                bbox_inches="tight")
    plt.close(fig)
    return out_path


def _label_strip(width: int, height: int, text: str) -> np.ndarray:
    """White strip with centered black text (cv2)."""
    import cv2

    strip = np.full((height, width, 3), 255, np.uint8)
    scale = height / 40.0
    size, _ = cv2.getTextSize(text, cv2.FONT_HERSHEY_SIMPLEX, scale, 2)
    x = max(0, (width - size[0]) // 2)
    y = (height + size[1]) // 2
    cv2.putText(strip, text, (x, y), cv2.FONT_HERSHEY_SIMPLEX, scale,
                (0, 0, 0), 2, cv2.LINE_AA)
    return strip


def images_to_video(
    directory: str,
    out_path: Optional[str] = None,
    fps: int = 20,
    t_descending: bool = True,
    border: bool = True,
    label_prefix: Optional[str] = "t",
    label_height: int = 48,
) -> str:
    """Frames → MP4 (mp4v), t-descending for reverse-diffusion dumps, with an
    optional border rectangle and bottom ``prefix=num`` label strip
    (image_tools.py:132-257)."""
    import cv2

    paths = list_images(directory, t_descending=t_descending)
    if not paths:
        raise FileNotFoundError(f"no images in {directory}")
    first = cv2.imread(paths[0])
    h, w = first.shape[:2]
    out_h = h + (label_height if label_prefix else 0)
    out_path = out_path or os.path.join(directory, "video.mp4")
    vw = cv2.VideoWriter(
        out_path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, out_h)
    )
    try:
        for p in paths:
            frame = cv2.imread(p)
            if frame.shape[:2] != (h, w):
                frame = cv2.resize(frame, (w, h))
            if border:
                cv2.rectangle(frame, (0, 0), (w - 1, h - 1), (0, 0, 0), 1)
            if label_prefix:
                m = _T_RE.match(Path(p).stem)
                num = m.group(1) if m else Path(p).stem
                strip = _label_strip(w, label_height,
                                     f"{label_prefix}={num}")
                frame = np.vstack([frame, strip])
            vw.write(frame)
    finally:
        vw.release()
    return out_path


def images_to_video_two_dirs_concat_cols(
    dir1: str,
    dir2: str,
    out_path: str,
    fps: int = 20,
    t_descending: bool = True,
    divider_px: int = 4,
    label_prefix: Optional[str] = "t",
    label_height: int = 48,
) -> str:
    """Side-by-side video of same-named frames from two dirs with a center
    divider (image_tools.py:262-401). Frames missing from either dir are
    skipped."""
    import cv2

    names1 = {Path(p).name: p for p in list_images(dir1)}
    ordered = [Path(p).name for p in list_images(dir1,
                                                 t_descending=t_descending)]
    names2 = {Path(p).name: p for p in list_images(dir2)}
    common = [n for n in ordered if n in names2]
    if not common:
        raise FileNotFoundError("no common frame names between the two dirs")

    f1 = cv2.imread(names1[common[0]])
    h, w = f1.shape[:2]
    out_w = w * 2 + divider_px
    out_h = h + (label_height if label_prefix else 0)
    vw = cv2.VideoWriter(
        out_path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (out_w, out_h)
    )
    try:
        for name in common:
            a = cv2.imread(names1[name])
            b = cv2.imread(names2[name])
            if a.shape[:2] != (h, w):
                a = cv2.resize(a, (w, h))
            if b.shape[:2] != (h, w):
                b = cv2.resize(b, (w, h))
            divider = np.zeros((h, divider_px, 3), np.uint8)
            frame = np.hstack([a, divider, b])
            if label_prefix:
                m = _T_RE.match(Path(name).stem)
                num = m.group(1) if m else Path(name).stem
                frame = np.vstack([
                    frame,
                    _label_strip(out_w, label_height, f"{label_prefix}={num}"),
                ])
            vw.write(frame)
    finally:
        vw.release()
    return out_path


def build_parser() -> argparse.ArgumentParser:
    """Subcommand parity with image_tools.py:409-468."""
    ap = argparse.ArgumentParser(description="image tools: tile/video/video2")
    sub = ap.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("tile", help="tile images into a grid")
    t.add_argument("directory")
    t.add_argument("--rows", type=int, default=2)
    t.add_argument("--cols", type=int, default=10)
    t.add_argument("--out", type=str, default=None)
    t.add_argument("--random", action="store_true")
    t.add_argument("--seed", type=int, default=None)

    v = sub.add_parser("video", help="images -> mp4")
    v.add_argument("directory")
    v.add_argument("--out", type=str, default=None)
    v.add_argument("--fps", type=int, default=20)
    v.add_argument("--no-border", action="store_true")
    v.add_argument("--no-label", action="store_true")
    v.add_argument("--ascending", action="store_true",
                   help="natural ascending order instead of t-descending")

    v2 = sub.add_parser("video2", help="two dirs side-by-side -> mp4")
    v2.add_argument("dir1")
    v2.add_argument("dir2")
    v2.add_argument("--out", type=str, required=True)
    v2.add_argument("--fps", type=int, default=20)
    v2.add_argument("--ascending", action="store_true")
    return ap


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    if args.cmd == "tile":
        out = show_image_tiles(args.directory, rows=args.rows,
                               cols=args.cols, out_path=args.out,
                               random_pick=args.random, seed=args.seed)
    elif args.cmd == "video":
        out = images_to_video(
            args.directory, out_path=args.out, fps=args.fps,
            t_descending=not args.ascending,
            border=not args.no_border,
            label_prefix=None if args.no_label else "t",
        )
    else:
        out = images_to_video_two_dirs_concat_cols(
            args.dir1, args.dir2, out_path=args.out, fps=args.fps,
            t_descending=not args.ascending,
        )
    print(f"[OK] {out}")


if __name__ == "__main__":
    main()

"""CLI: synthetic dataset generator (no reference counterpart — the
reference's dataset was private; data/synthetic.py replaces it)."""
from __future__ import annotations

import argparse

from ..data.geometry import CLASS_NAMES
from ..data.synthetic import generate_dataset


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        description="Render synthetic line/circle/arc datasets"
    )
    ap.add_argument("--out_dir", type=str, default="./data")
    ap.add_argument("--classes", type=int, nargs="+", default=[1, 2, 3])
    ap.add_argument("--count", type=int, default=1000)
    ap.add_argument("--image_size", type=int, nargs=2, default=(224, 224))
    ap.add_argument("--drawing_size", type=float, nargs=2, default=(400, 400))
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--suffix", type=str, default="",
                    help="e.g. _val / _test appended to the dataset name")
    ap.add_argument("--line_width", type=int, default=2)
    return ap


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    for cls in args.classes:
        name = (f"{CLASS_NAMES[cls]}_{args.image_size[0]}x"
                f"{args.image_size[1]}{args.suffix}")
        d = generate_dataset(
            args.out_dir, cls, args.count,
            image_size=tuple(args.image_size),
            drawing_size=tuple(args.drawing_size),
            seed=args.seed + cls, name=name, line_width=args.line_width,
        )
        print(f"[OK] {d} ({args.count} images)")


if __name__ == "__main__":
    main()

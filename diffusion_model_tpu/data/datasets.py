"""Host-side datasets: images + geometry conditions.

TPU-native equivalents of the reference's ``ClipDataset`` and ``LabelDataset``
(/root/reference/custom_dataset.py:9-195). The reference feeds a PyTorch
DataLoader with ``num_workers=0``; here datasets produce NumPy batches that an
async prefetching loader (loader.py) ships to device, since under ``jit`` the
whole train step is one XLA program and the host's only job is to keep batches
ready.

Contracts preserved:
- image files ``{prefix}{row:0{pad}d}{ext}`` indexed by CSV row, default
  ``p%05d.jpg`` (custom_dataset.py:106-109)
- ``LabelDataset`` item = (image[0,1], vals(12), mask(12), class_id)
  (custom_dataset.py:190-195); images are returned NHWC float32
- ``ClipDataset`` item = (image, text, class_id) (custom_dataset.py:52-55)
"""
from __future__ import annotations

import os
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd
from PIL import Image

from .geometry import GEOM_DIM, conditions_from_csv_rows


def load_image(path: str, image_size: Optional[Tuple[int, int]] = None) -> np.ndarray:
    """Load an RGB image as float32 NHWC in [0, 1] (ToTensor() value contract)."""
    img = Image.open(path).convert("RGB")
    if image_size is not None and img.size != tuple(image_size):
        img = img.resize(image_size, resample=Image.BILINEAR)
    return np.asarray(img, dtype=np.float32) / 255.0


class LabelDataset:
    """Geometry-conditioned image dataset.

    Args:
      dataset_path: sequence of ``(csv_path, image_dir, class_id)`` triples;
        each CSV is headerless 13-column, images named ``p%05d.jpg`` by row.
      image_size / drawing_size: see geometry.encode_conditions.
      strict_images: raise on a missing image (else skip the row).
    """

    def __init__(
        self,
        dataset_path: Sequence[Tuple[str, str, int]],
        strict_images: bool = True,
        image_prefix: str = "p",
        image_ext: str = ".jpg",
        image_size: Tuple[int, int] = (224, 224),
        drawing_size: Tuple[float, float] = (400.0, 400.0),
        zero_pad: int = 5,
        cache_images: bool = False,
    ):
        """``cache_images=True`` decodes every image once into a uint8 array
        (~150 KB per 224² image) so epochs beyond the first never touch the
        JPEG decoder — on TPU the jitted step outruns host-side PIL decode."""
        self.image_size = tuple(image_size)
        self.cache_images = cache_images
        self._cache: dict = {}
        self.items: List[Tuple[str, np.ndarray, np.ndarray, int]] = []

        for csv_path, image_dir, class_id in dataset_path:
            class_id = int(class_id)
            df = pd.read_csv(csv_path, header=None)
            rows = df.to_numpy(dtype=np.float32)
            vals, mask = conditions_from_csv_rows(
                rows, class_id,
                drawing_size=drawing_size,
                image_size=(float(image_size[0]), float(image_size[1])),
            )
            base = Path(image_dir)
            for i in range(len(df)):
                img_name = f"{image_prefix}{str(i).zfill(zero_pad)}{image_ext}"
                path = str(base / img_name)
                if not os.path.exists(path):
                    if strict_images:
                        raise FileNotFoundError(f"Missing image: {path}")
                    continue
                self.items.append((path, vals[i], mask[i], class_id))

        if not self.items:
            raise RuntimeError("No sample collected. Check paths / csv / image names.")

    def __len__(self) -> int:
        return len(self.items)

    def _image(self, idx: int) -> np.ndarray:
        path = self.items[idx][0]
        if self.cache_images:
            u8 = self._cache.get(idx)
            if u8 is None:
                u8 = (load_image(path, self.image_size) * 255.0).astype(
                    np.uint8
                )
                self._cache[idx] = u8
            return u8.astype(np.float32) / 255.0
        return load_image(path, self.image_size)

    def __getitem__(self, idx: int):
        _, vals, mask, class_id = self.items[idx]
        return self._image(idx), vals, mask, class_id

    def batch(self, indices: Sequence[int]) -> dict:
        """Gather a batch as a dict of stacked NumPy arrays (NHWC images)."""
        imgs = np.empty((len(indices), *self.image_size[::-1], 3), dtype=np.float32)
        vals = np.empty((len(indices), GEOM_DIM), dtype=np.float32)
        mask = np.empty((len(indices), GEOM_DIM), dtype=np.float32)
        ys = np.empty((len(indices),), dtype=np.int32)
        for j, idx in enumerate(indices):
            _, v, m, c = self.items[idx]
            imgs[j] = self._image(idx)
            vals[j], mask[j], ys[j] = v, m, c
        return {"image": imgs, "vals": vals, "mask": mask, "y": ys}

    def materialize(self) -> dict:
        """Decode the whole dataset into contiguous arrays for
        device-resident training: images stay uint8 ((N,H,W,3), 150 KB per
        224² image — 10k images ≈ 1.5 GB, comfortably HBM-resident), the
        per-step float conversion happens inside the jitted step. Steps then
        receive only int32 indices — no per-step host→device image transfer
        at all (the TPU-native data path; also sidesteps the axon tunnel's
        per-transfer overhead)."""
        n = len(self.items)
        h, w = self.image_size[1], self.image_size[0]
        imgs = np.empty((n, h, w, 3), dtype=np.uint8)
        vals = np.empty((n, GEOM_DIM), dtype=np.float32)
        mask = np.empty((n, GEOM_DIM), dtype=np.float32)
        ys = np.empty((n,), dtype=np.int32)
        for i, (_, v, m, c) in enumerate(self.items):
            imgs[i] = (self._image(i) * 255.0).astype(np.uint8)
            vals[i], mask[i], ys[i] = v, m, c
        return {"image_u8": imgs, "vals": vals, "mask": mask, "y": ys}


class CaptionDataset:
    """Caption-CSV image dataset (reference ``ClipDataset``,
    custom_dataset.py:9-55). Items: (image, text, class_id). Used by the VAE
    trainer, which consumes only the images."""

    def __init__(
        self,
        dataset_path: Sequence[Tuple[str, str, int]],
        image_col: str = "image_name",
        text_col: str = "text",
        strict_images: bool = True,
        image_size: Tuple[int, int] = (224, 224),
    ):
        self.image_size = tuple(image_size)
        self.items: List[Tuple[str, str, int]] = []
        for csv_path, image_dir, class_id in dataset_path:
            df = pd.read_csv(csv_path)
            base = Path(image_dir)
            for _, row in df.iterrows():
                path = str(base / str(row[image_col]))
                if not os.path.exists(path):
                    if strict_images:
                        raise FileNotFoundError(f"Missing image: {path}")
                    continue
                self.items.append((path, str(row[text_col]), int(class_id)))
        if not self.items:
            raise RuntimeError("No sample collected. Check paths and csv columns")

    def __len__(self) -> int:
        return len(self.items)

    def __getitem__(self, idx: int):
        path, text, class_id = self.items[idx]
        return load_image(path, self.image_size), text, class_id

    def batch(self, indices: Sequence[int]) -> dict:
        imgs = np.empty((len(indices), *self.image_size[::-1], 3), dtype=np.float32)
        ys = np.empty((len(indices),), dtype=np.int32)
        for j, idx in enumerate(indices):
            path, _, c = self.items[idx]
            imgs[j] = load_image(path, self.image_size)
            ys[j] = c
        return {"image": imgs, "y": ys}

    def materialize(self) -> dict:
        """uint8 image tensor for device-resident training (see
        LabelDataset.materialize)."""
        n = len(self.items)
        h, w = self.image_size[1], self.image_size[0]
        imgs = np.empty((n, h, w, 3), dtype=np.uint8)
        ys = np.empty((n,), dtype=np.int32)
        for i, (path, _, c) in enumerate(self.items):
            imgs[i] = (load_image(path, self.image_size) * 255.0).astype(
                np.uint8
            )
            ys[i] = c
        return {"image_u8": imgs, "y": ys}

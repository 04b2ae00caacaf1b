"""Data layer: synthetic renderer, datasets, loader (incl. multi-host
slicing and cache)."""
import csv
import os

import numpy as np
import pytest

from diffusion_model_tpu.data import (
    CaptionDataset,
    LabelDataset,
    PrefetchLoader,
    generate_dataset,
    render_entity,
    sample_entity_params,
)
from diffusion_model_tpu.data.geometry import (
    CLASS_ARC, CLASS_CIRCLE, CLASS_LINE, conditions_from_csv_rows,
)


def test_render_entity_draws_dark_pixels():
    rng = np.random.default_rng(0)
    for cls in (CLASS_LINE, CLASS_CIRCLE, CLASS_ARC):
        p = sample_entity_params(cls, rng)
        img = render_entity(cls, p, image_size=(64, 64))
        arr = np.asarray(img.convert("L"))
        assert (arr < 128).sum() > 10  # something was drawn
        assert (arr > 200).mean() > 0.5  # mostly white background


def test_circle_render_matches_condition_geometry():
    """The rendered circle's dark pixels must sit near the encoded
    (cx, cy, r) — renderer and condition transform agree (incl. Y-flip)."""
    params = np.array([200.0, 300.0, 60.0], np.float32)  # drawing coords
    img = render_entity(CLASS_CIRCLE, params, image_size=(224, 224))
    arr = np.asarray(img.convert("L"))
    ys, xs = np.where(arr < 128)
    row = np.zeros((1, 13), np.float32)
    row[0, 5:8] = params
    vals, _ = conditions_from_csv_rows(row, CLASS_CIRCLE)
    cx = vals[0, 4] * 224
    cy = vals[0, 5] * 224
    r = vals[0, 6] * 224
    d = np.hypot(xs - cx, ys - cy)
    assert abs(np.median(d) - r) < 3.0  # pixels lie on the circle


def test_generate_dataset_contract(tmp_path):
    d = generate_dataset(str(tmp_path), CLASS_LINE, 5, image_size=(32, 32),
                         seed=0)
    files = sorted(os.listdir(d))
    assert "p00000.jpg" in files and "p00004.jpg" in files
    assert "line_32x32.csv" in files and "line_32x32_caption.csv" in files
    with open(os.path.join(d, "line_32x32.csv")) as f:
        rows = list(csv.reader(f))
    assert len(rows) == 5 and len(rows[0]) == 13
    # line params occupy cols 1-4, other cols zero
    assert float(rows[0][5]) == 0.0 and float(rows[0][1]) != 0.0


def test_generate_dataset_idempotent_skip(tmp_path):
    """A complete dataset dir is left untouched on re-call (same bytes are
    deterministic from the seed; skipping keeps concurrent readers safe),
    but a count change re-renders."""
    d = generate_dataset(str(tmp_path), CLASS_LINE, 3, image_size=(16, 16),
                         seed=7)
    mtimes = {f: os.path.getmtime(os.path.join(d, f)) for f in os.listdir(d)}
    d2 = generate_dataset(str(tmp_path), CLASS_LINE, 3, image_size=(16, 16),
                          seed=7)
    assert d2 == d
    assert mtimes == {
        f: os.path.getmtime(os.path.join(d, f)) for f in os.listdir(d)
    }
    d3 = generate_dataset(str(tmp_path), CLASS_LINE, 4, image_size=(16, 16),
                          seed=7)
    with open(os.path.join(d3, "line_16x16.csv")) as f:
        assert len(list(csv.reader(f))) == 4


def test_label_dataset_and_cache(tmp_path):
    d = generate_dataset(str(tmp_path), CLASS_CIRCLE, 4, image_size=(32, 32))
    items = [(f"{d}/circle_32x32.csv", d, 2)]
    ds = LabelDataset(items, image_size=(32, 32), cache_images=True)
    assert len(ds) == 4
    img, vals, mask, cls = ds[0]
    assert img.shape == (32, 32, 3) and cls == 2
    b1 = ds.batch([0, 1])
    b2 = ds.batch([0, 1])  # second read hits the cache
    np.testing.assert_allclose(b1["image"], b2["image"])
    assert len(ds._cache) == 2


def test_label_dataset_missing_image_strict(tmp_path):
    d = generate_dataset(str(tmp_path), CLASS_LINE, 2, image_size=(16, 16))
    os.remove(os.path.join(d, "p00001.jpg"))
    items = [(f"{d}/line_16x16.csv", d, 1)]
    with pytest.raises(FileNotFoundError):
        LabelDataset(items, image_size=(16, 16))
    ds = LabelDataset(items, image_size=(16, 16), strict_images=False)
    assert len(ds) == 1


def test_caption_dataset(tmp_path):
    d = generate_dataset(str(tmp_path), CLASS_ARC, 3, image_size=(16, 16))
    ds = CaptionDataset([(f"{d}/arc_16x16_caption.csv", d, 3)],
                        image_size=(16, 16))
    img, text, cls = ds[0]
    assert "arc" in text and cls == 3
    b = ds.batch([0, 2])
    assert b["image"].shape == (2, 16, 16, 3)


class _ArrayDS:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def batch(self, idx):
        return {"x": np.asarray(idx, np.int64)}


def test_loader_wrap_padding_and_epochs():
    ds = _ArrayDS(10)
    loader = PrefetchLoader(ds, 4, shuffle=False,
                            device_put_fn=lambda b: b)
    batches = list(loader)
    assert len(batches) == 3  # ceil(10/4), padded by wrap
    assert batches[-1]["x"].shape == (4,)
    all_idx = np.concatenate([np.asarray(b["x"]) for b in batches])
    assert set(all_idx[:10].tolist()) == set(range(10))


def test_loader_drop_last():
    loader = PrefetchLoader(_ArrayDS(10), 4, shuffle=False, drop_last=True,
                            device_put_fn=lambda b: b)
    assert len(list(loader)) == 2


def test_loader_process_slicing():
    """Two simulated hosts together cover each global batch exactly."""
    parts = []
    for pi in range(2):
        loader = PrefetchLoader(
            _ArrayDS(8), 4, shuffle=False, device_put_fn=lambda b: b,
            process_index=pi, process_count=2,
        )
        parts.append([np.asarray(b["x"]) for b in loader])
    for b0, b1 in zip(*parts):
        assert b0.shape == (2,) and b1.shape == (2,)
        assert set(np.concatenate([b0, b1]).tolist()) <= set(range(8))
    combined = np.concatenate([np.concatenate(p) for p in parts])
    assert set(combined.tolist()) == set(range(8))


def test_loader_worker_error_propagates():
    class Bad(_ArrayDS):
        def batch(self, idx):
            raise RuntimeError("boom")

    loader = PrefetchLoader(Bad(4), 2, device_put_fn=lambda b: b)
    with pytest.raises(RuntimeError, match="boom"):
        list(loader)


def test_stratified_index_matrix_balances_classes():
    """Class-balanced batching: every batch carries an equal (±1) share of
    each class, epoch length matches the plain path, indices stay valid."""
    import numpy as np
    from diffusion_model_tpu.train.device_data import (
        epoch_index_batches,
        epoch_index_matrix_stratified,
    )

    rng = np.random.default_rng(0)
    # deliberately imbalanced: 50 line, 20 circle, 10 arc
    labels = np.asarray([1] * 50 + [2] * 20 + [3] * 10)
    B = 12
    mat = epoch_index_matrix_stratified(labels, B, rng)
    plain_steps = len(list(epoch_index_batches(len(labels), B,
                                               np.random.default_rng(0))))
    assert mat.shape == (plain_steps, B)
    assert mat.min() >= 0 and mat.max() < len(labels)
    for row in mat:
        counts = np.bincount(labels[row], minlength=4)[1:]
        assert counts.max() - counts.min() <= 1, counts
    # the big class must not repeat an index before exhausting its pool
    line_rows = mat[labels[mat] == 1]
    assert len(np.unique(line_rows)) == min(50, len(line_rows))


def test_epoch_index_batches_batch_larger_than_dataset():
    """Wrap-padding must survive batch_size > n (tiny smoke datasets):
    idx[:pad] alone clips when pad > n, under-filling the batch."""
    import numpy as np
    from diffusion_model_tpu.train.device_data import epoch_index_matrix

    for n, B in [(24, 64), (3, 8), (1, 4), (65, 64)]:
        mat = epoch_index_matrix(n, B, np.random.default_rng(0))
        assert mat.shape == (-(-n // B), B)
        assert set(mat.ravel()) == set(range(n))

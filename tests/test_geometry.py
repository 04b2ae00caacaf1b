"""Geometry-condition encoding: the single canonical transform.

The reference implements this twice (custom_dataset.py:121-141 vs
entityCsvSampler.py:113-127); SURVEY.md §4 requires a property test pinning
them equal. Ours has one implementation, so we pin it against BOTH reference
formulations computed by hand.
"""
import numpy as np
import pytest

from diffusion_model_tpu.data import geometry as G


def test_key_order_contract():
    assert G.KEY_ORDER == [
        "x1", "y1", "x2", "y2", "cx", "cy", "cr",
        "ax", "ay", "ar", "theta1", "theta2",
    ]
    assert G.GEOM_DIM == 12
    assert G.CLASS_KEYS[1] == ["x1", "y1", "x2", "y2"]
    assert G.CLASS_KEYS[2] == ["cx", "cy", "cr"]
    assert G.CLASS_KEYS[3] == ["ax", "ay", "ar", "theta1", "theta2"]


@pytest.mark.parametrize("draw,img", [((400, 400), (224, 224)),
                                      ((280, 280), (224, 224)),
                                      ((400, 400), (64, 64))])
def test_line_norm_matches_both_reference_formulations(draw, img):
    rng = np.random.default_rng(0)
    raw = rng.uniform(10, draw[0] - 10, size=(16, 4)).astype(np.float32)
    vals, mask = G.encode_conditions(raw, G.CLASS_LINE, draw, img)

    # LabelDataset long form: draw→img coords with Y-flip, then /W,/H
    sx, sy = img[0] / draw[0], img[1] / draw[1]
    long_x1 = (raw[:, 0] * sx) / img[0]
    long_y1 = ((draw[1] - raw[:, 1]) * sy) / img[1]
    # EntityCsvSampler shortcut: x/drawW, 1 - y/drawH
    short_x1 = raw[:, 0] / draw[0]
    short_y1 = 1.0 - raw[:, 1] / draw[1]

    np.testing.assert_allclose(long_x1, short_x1, rtol=1e-5)
    np.testing.assert_allclose(long_y1, short_y1, rtol=1e-5)
    np.testing.assert_allclose(vals[:, G.KEY_INDEX["x1"]], short_x1, rtol=1e-5)
    np.testing.assert_allclose(vals[:, G.KEY_INDEX["y1"]], short_y1, rtol=1e-5)
    np.testing.assert_allclose(mask[:, :4], 1.0)
    np.testing.assert_allclose(mask[:, 4:], 0.0)


def test_circle_radius_normalized_by_width():
    raw = np.array([[200.0, 200.0, 50.0]], dtype=np.float32)
    vals, mask = G.encode_conditions(raw, G.CLASS_CIRCLE)
    assert vals[0, G.KEY_INDEX["cr"]] == pytest.approx(50.0 / 400.0)
    assert vals[0, G.KEY_INDEX["cx"]] == pytest.approx(0.5)
    assert vals[0, G.KEY_INDEX["cy"]] == pytest.approx(0.5)
    assert mask[0].sum() == 3


def test_arc_angles_over_360():
    raw = np.array([[100.0, 100.0, 40.0, 90.0, 270.0]], dtype=np.float32)
    vals, _ = G.encode_conditions(raw, G.CLASS_ARC)
    assert vals[0, G.KEY_INDEX["theta1"]] == pytest.approx(0.25)
    assert vals[0, G.KEY_INDEX["theta2"]] == pytest.approx(0.75)


def test_normalize_angle_mixed():
    v = np.array([0.5, 90.0, 450.0, -90.0, 1.0])
    out = G.normalize_angle(v)
    np.testing.assert_allclose(out, [0.5, 0.25, 0.25, 0.75, 1.0], rtol=1e-6)


def test_csv_rows_column_slices():
    row = np.zeros((1, 13), dtype=np.float32)
    row[0, 1:5] = [10, 20, 30, 40]       # line
    row[0, 5:8] = [200, 200, 50]         # circle
    row[0, 8:13] = [100, 100, 40, 0, 180]  # arc
    for cls in (1, 2, 3):
        vals, mask = G.conditions_from_csv_rows(row, cls)
        assert vals.shape == (1, 12) and mask.shape == (1, 12)
        assert (mask[0] == G.class_mask(cls)).all()
    v_line, _ = G.conditions_from_csv_rows(row, 1)
    assert v_line[0, 0] == pytest.approx(10 / 400)
    v_circ, _ = G.conditions_from_csv_rows(row, 2)
    assert v_circ[0, G.KEY_INDEX["cr"]] == pytest.approx(50 / 400)


def test_infer_drawing_size_snaps():
    rows = np.zeros((3, 13), dtype=np.float32)
    rows[:, 5] = [399.2, 100.0, 50.0]  # cx max ≈ 400 → snap
    rows[:, 6] = [223.0, 100.0, 50.0]  # cy max ≈ 224 → snap
    w, h = G.infer_drawing_size(rows, G.CLASS_CIRCLE)
    assert (w, h) == (400.0, 224.0)
    assert G.snap_size(500.0) == 500.0  # out of tolerance: passthrough


def test_conditions_from_dicts_per_class():
    vals, mask = G.conditions_from_dicts(
        {1: {"x1": 0.1, "y1": 0.2}}, None, [1, 1, 2]
    )
    assert vals[0, 0] == pytest.approx(0.1)
    assert mask[0, 0] == 1.0 and mask[0, 2] == 0.0
    # class-2 sample had no cond entry → zero mask
    assert mask[2].sum() == 0


def test_conditions_from_dicts_array_defaults_mask_nonzero():
    arr = np.zeros((2, 12), dtype=np.float32)
    arr[0, 0] = 0.3
    vals, mask = G.conditions_from_dicts(arr, None, [1, 1])
    assert mask[0, 0] == 1.0
    assert mask.sum() == 1.0


def test_conditions_from_dicts_none_uses_class_masks():
    vals, mask = G.conditions_from_dicts(None, None, [1, 2, 3])
    assert (vals == 0).all()
    assert (mask[0] == G.class_mask(1)).all()
    assert (mask[1] == G.class_mask(2)).all()
    assert (mask[2] == G.class_mask(3)).all()


def test_training_vs_sampler_angle_encodings():
    """Training encode is plain t/360 (custom_dataset.py:174-176); the
    sampler CSV path uses the |v|>1 heuristic (entityCsvSampler.py:192-199).
    They agree strictly inside (1, 360) and diverge at the edges."""
    raw = np.array([[100.0, 100.0, 40.0, 0.5, 360.0]], dtype=np.float32)
    plain, _ = G.encode_conditions(raw, G.CLASS_ARC)  # default: training
    heur, _ = G.encode_conditions(raw, G.CLASS_ARC, angle_mode="heuristic")
    i1, i2 = G.KEY_INDEX["theta1"], G.KEY_INDEX["theta2"]
    # theta=0.5 deg: training /360; heuristic passes through as-already-[0,1]
    assert plain[0, i1] == pytest.approx(0.5 / 360.0)
    assert heur[0, i1] == pytest.approx(0.5)
    # theta=360: training → 1.0; heuristic wraps to 0
    assert plain[0, i2] == pytest.approx(1.0)
    assert heur[0, i2] == pytest.approx(0.0)
    # interior angles agree
    mid = np.array([[1.0, 1.0, 1.0, 90.0, 270.0]], dtype=np.float32)
    a, _ = G.encode_conditions(mid, G.CLASS_ARC)
    b, _ = G.encode_conditions(mid, G.CLASS_ARC, angle_mode="heuristic")
    np.testing.assert_allclose(a[0, [i1, i2]], b[0, [i1, i2]])

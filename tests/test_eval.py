"""Eval subsystem: native EDT vs scipy, metrics vs hand-computed values,
full pipeline layout + CLI parity."""
import numpy as np
import pytest
from PIL import Image

from diffusion_model_tpu.eval import (
    compute_metrics,
    evaluate_dirs,
    far_noise_ratio,
    gaussian_weighted_recall,
    load_binary_mask,
    mean_std,
    native,
    overdraw_rate,
    quantiles,
)


def test_native_backend_builds():
    # the C++ core should build in this image (g++ present)
    assert native.backend() == "native"


def test_edt_matches_scipy():
    from scipy.ndimage import distance_transform_edt

    rng = np.random.default_rng(0)
    for _ in range(5):
        mask = rng.random((37, 53)) < 0.1
        if not mask.any():
            mask[5, 5] = True
        ours = native.distance_map(mask)
        ref = distance_transform_edt(~mask)
        np.testing.assert_allclose(ours, ref, atol=1e-9)


def test_edt_empty_mask_inf():
    out = native.distance_map(np.zeros((4, 4), bool))
    assert np.isinf(out).all()


def test_metrics_hand_computed():
    gt = np.zeros((10, 10), bool)
    gt[5, 2:8] = True  # horizontal line, 6 px
    pred = np.zeros((10, 10), bool)
    pred[5, 2:5] = True   # overlaps 3 px
    pred[0, 0] = True     # far noise: distance to line ~5.4 > sigma=2

    m = compute_metrics(gt, pred, sigma=2.0)
    assert m["inter"] == 3
    assert m["union"] == 7
    assert m["gt_area"] == 6
    assert m["pred_area"] == 4
    assert m["fp"] == 1
    assert m["iou"] == pytest.approx(3 / 7)
    assert m["gt_iou"] == pytest.approx(3 / 6)
    assert m["far_noise_ratio"] == pytest.approx(1 / 4)
    # gauss recall: 3 overlap pixels contribute exp(0)=1 each; far pixel ~0
    d = np.hypot(5, 2)
    expected_gr = (3.0 + np.exp(-(d ** 2) / 8.0)) / 6.0
    assert m["gauss_recall"] == pytest.approx(expected_gr, rel=1e-6)


def test_metrics_empty_conventions():
    empty = np.zeros((5, 5), bool)
    full = np.ones((5, 5), bool)
    m = compute_metrics(empty, empty)
    assert m["iou"] == 1.0 and m["gt_iou"] == 1.0
    assert m["far_noise_ratio"] == 0.0 and m["gauss_recall"] == 1.0
    # empty gt, nonempty pred: all pred pixels are far noise
    m2 = compute_metrics(empty, full)
    assert m2["far_noise_ratio"] == 1.0
    assert far_noise_ratio(empty, full) == 1.0
    assert gaussian_weighted_recall(empty, full) == 1.0
    with pytest.raises(ValueError):
        compute_metrics(empty, np.zeros((3, 3), bool))
    with pytest.raises(ValueError):
        far_noise_ratio(empty, full, sigma=0)


def test_summary_stats():
    x = np.array([0.1, 0.5, 0.9, 1.3])
    m, s = mean_std(x)
    assert m == pytest.approx(0.7)
    assert s == pytest.approx(x.std(ddof=0))
    q = quantiles(x, [50, 90, 95])
    assert set(q) == {"p50", "p90", "p95"}
    assert overdraw_rate(x, 1.0) == pytest.approx(0.25)
    assert np.isnan(mean_std(np.array([]))[0])


def test_load_binary_mask_invert(tmp_path):
    arr = np.full((8, 8), 255, np.uint8)
    arr[2, 2] = 0  # one black pixel
    p = tmp_path / "img.png"
    Image.fromarray(arr, mode="L").save(p)
    m_inv = load_binary_mask(p, threshold=128, invert=True)
    assert m_inv.sum() == 1 and m_inv[2, 2]
    m = load_binary_mask(p, threshold=128, invert=False)
    assert m.sum() == 63 and not m[2, 2]


@pytest.fixture()
def eval_dirs(tmp_path):
    gt = tmp_path / "gt"
    gen = tmp_path / "gen"
    gt.mkdir()
    gen.mkdir()
    rng = np.random.default_rng(0)
    for i in range(4):
        arr = np.full((32, 32), 255, np.uint8)
        arr[10:20, i + 5] = 0
        Image.fromarray(arr, "L").convert("RGB").save(gt / f"p{i:05d}.jpg",
                                                      quality=98)
        arr2 = arr.copy()
        arr2[10:18, i + 5] = 0
        arr2[25, 25] = 0
        Image.fromarray(arr2, "L").save(gen / f"pic{i + 1}.png")
    # an unpaired generated file and a junk file must be ignored
    Image.fromarray(np.zeros((32, 32), np.uint8), "L").save(gen / "pic99.png")
    (gen / "notes.txt").write_text("ignore me")
    return gt, gen, tmp_path / "out"


def test_evaluate_dirs_layout_and_pairing(eval_dirs):
    gt, gen, out = eval_dirs
    res = evaluate_dirs(str(gt), str(gen), str(out), invert=True,
                        save_diff=True, workers=2)
    import os

    run = res["run_dir"]
    assert os.path.basename(run).startswith("run_")
    for sub in ("binarized/gt", "binarized/gen", "binarized/pair", "diff"):
        assert os.path.isdir(os.path.join(run, sub))
    assert os.path.exists(os.path.join(run, "metrics_detail.csv"))
    assert os.path.exists(os.path.join(run, "metrics_summary.csv"))
    assert os.path.exists(os.path.join(run, "config.txt"))
    detail = res["detail"]
    assert len(detail) == 4
    assert list(detail["gen_file"]) == [f"pic{i + 1}.png" for i in range(4)]
    s = res["summary"].iloc[0]
    assert s["n_pairs"] == 4
    assert 0.0 < s["iou_mean"] <= 1.0
    assert s["distance_backend"] in ("native", "scipy")
    cfg = open(os.path.join(run, "config.txt")).read()
    assert "threshold=128" in cfg and "invert=True" in cfg


def test_evaluate_dirs_max_pairs(eval_dirs):
    gt, gen, out = eval_dirs
    res = evaluate_dirs(str(gt), str(gen), str(out), invert=True,
                        max_pairs=2, workers=1)
    assert len(res["detail"]) == 2


def test_cli_parser_flags():
    from diffusion_model_tpu.eval.iou_noise import build_parser

    args = build_parser().parse_args([
        "--gt_dir", "a", "--gen_dir", "b", "--out_dir", "c",
        "--threshold", "100", "--invert", "--sigma", "3.5",
        "--max_pairs", "10", "--save_diff",
    ])
    assert args.threshold == 100 and args.invert and args.sigma == 3.5
    assert args.max_pairs == 10 and args.save_diff

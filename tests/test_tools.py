"""Image tools: natural sort, t-ordering, tiles, videos."""
import os

import numpy as np
import pytest
from PIL import Image

from diffusion_model_tpu.tools import (
    images_to_video,
    images_to_video_two_dirs_concat_cols,
    list_images,
    natural_key,
    show_image_tiles,
)


def test_natural_key_ordering():
    names = ["t10.png", "t2.png", "t1000.png", "t1.png"]
    assert sorted(names, key=natural_key) == [
        "t1.png", "t2.png", "t10.png", "t1000.png"]


@pytest.fixture()
def t_dir(tmp_path):
    for t in (1, 2, 10, 100):
        arr = np.full((16, 16, 3), min(255, t), np.uint8)
        Image.fromarray(arr).save(tmp_path / f"t{t}.png")
    (tmp_path / "junk.txt").write_text("x")
    return tmp_path


def test_list_images_orders(t_dir):
    asc = [os.path.basename(p) for p in list_images(str(t_dir))]
    assert asc == ["t1.png", "t2.png", "t10.png", "t100.png"]
    desc = [os.path.basename(p)
            for p in list_images(str(t_dir), t_descending=True)]
    assert desc == ["t100.png", "t10.png", "t2.png", "t1.png"]


def test_show_image_tiles(t_dir):
    out = show_image_tiles(str(t_dir), rows=2, cols=2)
    assert os.path.exists(out)
    out2 = show_image_tiles(str(t_dir), rows=1, cols=3, random_pick=True,
                            seed=0, out_path=str(t_dir / "r.png"))
    assert os.path.exists(out2)


def test_images_to_video(t_dir):
    out = images_to_video(str(t_dir), fps=2)
    assert os.path.exists(out) and os.path.getsize(out) > 0


def test_video_two_dirs(t_dir, tmp_path):
    d2 = tmp_path / "second"
    d2.mkdir()
    for t in (1, 2, 10):
        Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(
            d2 / f"t{t}.png")
    out = str(tmp_path / "cmp.mp4")
    res = images_to_video_two_dirs_concat_cols(str(t_dir), str(d2), out,
                                               fps=2)
    assert os.path.exists(res) and os.path.getsize(res) > 0


def test_video_no_common_frames(t_dir, tmp_path):
    d2 = tmp_path / "empty"
    d2.mkdir()
    Image.fromarray(np.zeros((4, 4, 3), np.uint8)).save(d2 / "other.png")
    with pytest.raises(FileNotFoundError):
        images_to_video_two_dirs_concat_cols(
            str(t_dir), str(d2), str(tmp_path / "x.mp4"))


def test_cli_parser_subcommands():
    from diffusion_model_tpu.tools.image_tools import build_parser

    p = build_parser()
    a = p.parse_args(["tile", "somedir", "--rows", "3"])
    assert a.cmd == "tile" and a.rows == 3
    a = p.parse_args(["video", "d", "--fps", "30", "--no-label"])
    assert a.cmd == "video" and a.fps == 30 and a.no_label
    a = p.parse_args(["video2", "a", "b", "--out", "o.mp4"])
    assert a.cmd == "video2" and a.out == "o.mp4"

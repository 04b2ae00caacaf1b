"""CLI-chain integration: make_dataset → train_vae → train_latent_cond →
generate_cond → generate_steps → eval_iou_noise → image_tools, all through
the argv surfaces with tiny models on the CPU mesh."""
import glob
import json
import os

import pytest

pytestmark = pytest.mark.heavy


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli_e2e")
    old = os.getcwd()
    os.chdir(d)
    yield str(d)
    os.chdir(old)


def test_full_cli_chain(workdir):
    from diffusion_model_tpu.cli import (
        eval_iou_noise,
        generate_cond,
        generate_steps,
        image_tools,
        make_dataset,
        train_latent_cond,
        train_vae,
        vae_recon_check,
    )

    # 1. datasets
    make_dataset.main([
        "--out_dir", "./data", "--count", "10", "--image_size", "32", "32",
    ])
    make_dataset.main([
        "--out_dir", "./data", "--count", "4", "--image_size", "32", "32",
        "--suffix", "_test", "--seed", "7",
    ])
    assert os.path.exists("./data/line_32x32/p00009.jpg")

    items = [
        f"./data/{c}_32x32/{c}_32x32.csv,./data/{c}_32x32,{i}"
        for i, c in ((1, "line"), (2, "circle"), (3, "arc"))
    ]

    # 2. stage 1
    argv = ["--epochs", "1", "--batch_size", "8", "--base_channels", "8",
            "--no_bf16", "--image_size", "32", "32", "--save_dir", "./vae"]
    for it in items:
        argv += ["--items", it, "--val_items", it]
    train_vae.main(argv)
    vae_ckpts = glob.glob("./vae/*/vae_best.msgpack")
    assert vae_ckpts

    # 3. stage 2
    argv = ["--vae_ckpt", vae_ckpts[0], "--epochs", "1", "--batch_size", "8",
            "--num_timesteps", "4", "--base_ch", "8", "--time_dim", "32",
            "--vae_base_channels", "8", "--no_bf16", "--image_size", "32",
            "32", "--val_interval", "1", "--post_train_samples", "2"]
    for it in items:
        argv += ["--items", it, "--val_items", it]
    train_latent_cond.main(argv)
    assert os.path.exists("./model_para/trained_para.msgpack")
    runs = glob.glob("./result/*/record.txt")
    assert runs

    common = ["--unet_ckpt", "./model_para/trained_para.msgpack",
              "--vae_ckpt", vae_ckpts[0], "--base_ch", "8", "--time_dim",
              "32", "--vae_base_channels", "8", "--no_bf16",
              "--num_timesteps", "4", "--image_size", "32", "32"]

    # 4. conditional generation (2 per class; ddim on one class to cover it)
    generate_cond.main(common + [
        "--line_csv", "./data/line_32x32_test/line_32x32_test.csv",
        "--circle_csv", "./data/circle_32x32_test/circle_32x32_test.csv",
        "--image_count", "2", "--run_name", "cli_e2e",
    ])
    gen_line = "./generated_by_cond/cli_e2e/line"
    assert sorted(os.listdir(gen_line)) == ["pic1.png", "pic2.png"]

    generate_cond.main(common + [
        "--arc_csv", "./data/arc_32x32_test/arc_32x32_test.csv",
        "--image_count", "2", "--run_name", "cli_ddim",
        "--sampler", "ddim", "--num_inference_steps", "2",
    ])
    assert os.path.exists("./generated_by_cond/cli_ddim/arc/pic2.png")

    generate_cond.main(common + [
        "--circle_csv", "./data/circle_32x32_test/circle_32x32_test.csv",
        "--image_count", "2", "--run_name", "cli_dpmpp",
        "--sampler", "dpmpp", "--num_inference_steps", "3",
    ])
    assert os.path.exists("./generated_by_cond/cli_dpmpp/circle/pic2.png")

    # 5. step dumps
    generate_steps.main(common + [
        "--csv_path", "./data/line_32x32_test/line_32x32_test.csv",
        "--class_id", "1", "--save_every", "2", "--out_root", "./steps",
    ])
    pix = glob.glob("./steps/*/pixel/t*.png")
    lat = glob.glob("./steps/*/latent/ch00/t*.png")
    assert pix and lat
    assert any(p.endswith("t4.png") for p in pix)  # t=T snapshot
    assert any(p.endswith("t1.png") for p in pix)

    # 6. eval against GT
    eval_iou_noise.main([
        "--gt_dir", "./data/line_32x32_test", "--gen_dir", gen_line,
        "--out_dir", "./eval_out", "--invert",
    ])
    summaries = glob.glob("./eval_out/run_*/metrics_summary.csv")
    assert summaries

    # 7. visual tools over the step dumps
    step_dir = os.path.dirname(pix[0])
    image_tools.main(["video", step_dir, "--fps", "2"])
    assert glob.glob(f"{step_dir}/video.mp4")
    image_tools.main(["tile", gen_line, "--rows", "1", "--cols", "2"])

    # 8. recon check
    vae_recon_check.main([
        "--vae_ckpt", vae_ckpts[0], "--items", items[0],
        "--base_channels", "8", "--image_size", "32", "32",
        "--out_dir", "./recon", "--batch_size", "4", "--max_batches", "1",
    ])
    assert os.path.exists("./recon/recon_metrics.csv")

    # JSONL metrics exist and parse
    with open(glob.glob("./vae/*/metrics.jsonl")[0]) as f:
        rec = json.loads(f.readlines()[-1])
    assert rec["kind"] == "epoch"

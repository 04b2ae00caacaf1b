"""Kill -9 resume drill (VERDICT r2 #9): prove a SIGKILLed training run
resumes from the periodic Orbax checkpoint losing at most ``ckpt_interval``
epochs.

Self-driving: phase A launches a tiny stage-2 training run (CPU backend,
48px synthetic data, 60 epochs, checkpoint every 5) as a subprocess, kills
it with SIGKILL by exact PID mid-run, then phase B re-launches the same
config and asserts (from the accumulated metrics.jsonl) that the trainer
resumed no more than one checkpoint interval behind the kill point and ran
to completion.

The reference has no resume at all — its trainers only ever save
(/root/reference/early_stopping.py:53-57, train_latent_cond.py:168-170);
this drill covers the rebuild's beyond-reference Orbax resume path
(diffusion_model_tpu/train/checkpoints.py) end-to-end, crash included.

Usage:  python scripts/kill_resume_drill.py   (exits 0 on success; ~6 min
on one CPU core). Round-3 results: manual drill killed at epoch 40 (mid
checkpoint write), resumed at 36, lost 5 epochs (= interval); scripted
drill killed at epoch 23, resumed at 21, lost 3 — both completed 60/60,
RESUME DRILL OK.
"""
from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

ROOT = "/tmp/kill_resume_drill"
EPOCHS = 60
CKPT_INTERVAL = 5
KILL_AT_EPOCH = 23  # mid-interval: worst case loses a full interval

WORKER = r'''
import os, sys
os.environ.setdefault("DIFFUSION_TPU_PLATFORM", "cpu")
sys.path.insert(0, %(repo)r)
import jax, jax.numpy as jnp
from diffusion_model_tpu.config import DataConfig, LatentTrainConfig
from diffusion_model_tpu.data.synthetic import generate_all_classes
from diffusion_model_tpu.models import VAE, VAEConfig
from diffusion_model_tpu.train import train_latent_cond

ROOT = %(root)r
hw = (48, 48)
train_dirs = generate_all_classes(f"{ROOT}/data", 32, seed=1, image_size=hw)
val_dirs = generate_all_classes(f"{ROOT}/data", 8, seed=2, suffix="_val",
                                image_size=hw)
mk = lambda dirs: [(f"{d}/{os.path.basename(d)}.csv", d, cls)
                   for cls, d in dirs.items()]
cfg = LatentTrainConfig(
    epochs=%(epochs)d, batch_size=16, lr=1e-4, num_timesteps=8,
    base_ch=16, time_dim=64, vae_base_channels=16,
    ckpt_interval=%(interval)d, val_interval=10, post_train_samples=0,
    model_para_dir=f"{ROOT}/model_para", result_root=f"{ROOT}/result",
    resume_dir=f"{ROOT}/orbax_ck",
    data=DataConfig(train_items=mk(train_dirs), val_items=mk(val_dirs),
                    image_size=hw),
)
rng = jax.random.PRNGKey(0)
vae = VAE(VAEConfig(base_channels=cfg.vae_base_channels))
vp = vae.init({"params": rng, "sample": rng},
              jnp.zeros((1, hw[0], hw[1], 3)))["params"]
res = train_latent_cond(cfg, vae_params=vp)
print("TRAIN COMPLETED", len(res["train_losses"]), flush=True)
'''


def launch(log_path: str) -> subprocess.Popen:
    env = dict(os.environ, DIFFUSION_TPU_PLATFORM="cpu", JAX_PLATFORMS="")
    return subprocess.Popen(
        [sys.executable, "-c", WORKER % {
            "repo": os.path.dirname(os.path.dirname(os.path.abspath(
                __file__))),
            "root": ROOT, "epochs": EPOCHS, "interval": CKPT_INTERVAL,
        }],
        stdout=open(log_path, "w"), stderr=subprocess.STDOUT, env=env,
    )


def epochs_logged() -> list:
    path = f"{ROOT}/model_para/metrics.jsonl"
    if not os.path.exists(path):
        return []
    out = []
    with open(path) as f:
        for line in f:
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if rec.get("kind") == "epoch":
                out.append(rec["epoch"])
    return out


def main() -> int:
    import shutil

    shutil.rmtree(ROOT, ignore_errors=True)

    # Phase A: train, SIGKILL mid-run (exact PID — never pattern kills).
    proc = launch("/tmp/kill_resume_drill_a.log")
    kill_epoch = None
    deadline = time.time() + 1800
    while time.time() < deadline:
        eps = epochs_logged()
        if eps and eps[-1] >= KILL_AT_EPOCH:
            kill_epoch = eps[-1]
            proc.send_signal(signal.SIGKILL)
            proc.wait()
            break
        if proc.poll() is not None:
            print("FAIL: phase A finished before the kill — raise EPOCHS")
            return 1
        time.sleep(2)
    assert kill_epoch is not None, "phase A never reached the kill epoch"
    print(f"phase A: SIGKILLed at epoch {kill_epoch}", flush=True)

    # Phase B: same config; must resume from the last periodic checkpoint.
    proc = launch("/tmp/kill_resume_drill_b.log")
    rc = proc.wait(timeout=1800)
    assert rc == 0, f"phase B exited {rc}"

    eps = epochs_logged()  # accumulates across both processes
    resume_epoch = None
    for a, b in zip(eps, eps[1:]):
        if b < a:  # sequence restarts where the resume began
            resume_epoch = b
    assert resume_epoch is not None, "no resume detected in metrics.jsonl"
    lost = kill_epoch - (resume_epoch - 1)
    print(f"killed at epoch {kill_epoch}, resumed at {resume_epoch}, "
          f"lost {lost} epochs (interval {CKPT_INTERVAL})", flush=True)
    assert 0 <= lost <= CKPT_INTERVAL + 1, f"lost {lost} > interval"
    assert eps[-1] == EPOCHS, f"did not finish after resume (last {eps[-1]})"
    print("RESUME DRILL OK", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

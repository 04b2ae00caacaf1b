"""True multi-process SPMD test (VERDICT r3 #7): 2 processes × 4 virtual
CPU devices joined by ``jax.distributed.initialize`` into one 8-device
world — the CPU stand-in for a 2-host TPU pod slice. Exercises what the
single-process 8-device tests cannot: cross-process coordination, global
arrays built from process-LOCAL data, and collectives that ride the
inter-process fabric (the DCN stand-in).

Heavy: two fresh XLA-CPU compiles of the full train step (~1-2 min).
"""
import socket
import subprocess
import sys
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.heavy
def test_two_process_dp_train_step():
    """Both workers run the SAME jitted DP train step over the global
    8-device mesh, each feeding only its local half of the batch; both
    must print the same finite loss (the gradient all-reduce crossed the
    process boundary)."""
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["JAX_NUM_CPU_DEVICES"] = ""  # worker sets its own XLA flags
    env.pop("JAX_NUM_CPU_DEVICES")
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "_mp_worker.py"),
             str(port), str(i), "2"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, cwd=REPO, env=env)
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-3000:]}"
        assert "MP_OK" in out, f"worker {i} no MP_OK:\n{out[-3000:]}"
        # DP-sharded inference leg (distilled serving shape) also ran
        assert "MP_INFER_OK" in out, f"worker {i} no MP_INFER_OK:\n{out[-3000:]}"
    # identical replicated loss on both hosts = the all-reduce really
    # spanned processes (divergent data halves would disagree otherwise)
    l0 = outs[0].split("MP_OK")[1].split()
    l1 = outs[1].split("MP_OK")[1].split()
    assert l0[:2] == l1[:2], (l0, l1)

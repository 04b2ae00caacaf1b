"""Environment helpers: backend detection, flags, deterministic timestamps."""
from __future__ import annotations

import datetime
import functools
import os

import jax


_PALLAS_INTERPRET = False


def set_pallas_interpret(value: bool) -> None:
    """Force Pallas kernels through ``pl.pallas_call(interpret=...)`` — the
    CPU-CI path for kernel parity tests (tests/test_pallas.py). The flag is
    part of each kernel's jit key, so toggling retraces correctly."""
    global _PALLAS_INTERPRET
    _PALLAS_INTERPRET = bool(value)


def pallas_interpret() -> bool:
    return _PALLAS_INTERPRET or os.environ.get(
        "DIFFUSION_TPU_PALLAS_INTERPRET", "0") == "1"


@functools.lru_cache(maxsize=1)
def pallas_supported() -> bool:
    """True when Pallas TPU kernels can run (TPU backend present and not
    explicitly disabled via DIFFUSION_TPU_DISABLE_PALLAS=1)."""
    if os.environ.get("DIFFUSION_TPU_DISABLE_PALLAS", "0") == "1":
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def timestamp_dir_name(now: datetime.datetime | None = None) -> str:
    """Reference run-directory timestamp format ``YYYY_MM_DD_HH_MM``
    (/root/reference/utils.py:27)."""
    now = now or datetime.datetime.now()
    return now.strftime("%Y_%m_%d_%H_%M")


def timestamp_run_name(now: datetime.datetime | None = None) -> str:
    """Reference eval run name format ``run_YYYYMMDD_HHMMSS``
    (/root/reference/eval_iou_noise.py:326)."""
    now = now or datetime.datetime.now()
    return "run_" + now.strftime("%Y%m%d_%H%M%S")

"""Math helpers safe to use inside Pallas TPU kernels.

Mosaic (this JAX version) cannot lower ``erf``/``erfc``, so exact GELU is
expressed with a polynomial erf (Abramowitz & Stegun 7.1.26, max abs error
1.5e-7 — below f32 noise for our activations). The XLA paths keep
``jax.nn.gelu(approximate=False)``; parity between the two is pinned by
tests/test_pallas.py.
"""
from __future__ import annotations

import jax.numpy as jnp

_A1 = 0.254829592
_A2 = -0.284496736
_A3 = 1.421413741
_A4 = -1.453152027
_A5 = 1.061405429
_P = 0.3275911


def erf_poly(x: jnp.ndarray) -> jnp.ndarray:
    """Elementwise erf via A&S 7.1.26 (f32)."""
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + _P * ax)
    poly = t * (_A1 + t * (_A2 + t * (_A3 + t * (_A4 + t * _A5))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def gelu_exact(x: jnp.ndarray) -> jnp.ndarray:
    """Exact-GELU (erf form) usable inside Pallas kernels."""
    return 0.5 * x * (1.0 + erf_poly(x * 0.7071067811865476))


def rows_per_step(batch: int, row_bytes: int,
                  budget: int = 4 * 1024 * 1024, cap: int = 16) -> int:
    """How many batch rows one Pallas grid step should process.

    The fused kernels' per-row math is tiny (µs) next to the fixed
    per-grid-step cost, so grids of one row per step leave throughput flat
    in batch; packing R rows per step amortizes the overhead. R is bounded
    by a VMEM budget per step and must divide the batch (the BlockSpec
    tiling is uniform). Callers pass ``row_bytes`` for whatever actually
    scales with R (for the fused kernels that is the double-buffered I/O
    blocks — per-row compute temporaries are reused across the unrolled
    loop) and fold the fixed temp set into ``budget``."""
    r = max(1, min(cap, budget // max(row_bytes, 1), batch))
    while batch % r:
        r -= 1
    return r

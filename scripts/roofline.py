"""Analytic MXU-efficiency ceiling for the flagship sampling step
(VERDICT r4 next #4: "close the exact-DDPM perf chapter with a
roofline").

The measured exact-DDPM rate (~56-57 TFLOP/s analytic on one v5e chip,
BENCH_r04.json) is ~28-29% of the chip's ~197 TFLOP/s bf16 peak. This
script quantifies how much of the missing 72% is *structural* — FLOPs
that CANNOT reach peak because the U-Net's matmul shapes underfill the
128×128 MXU tiles — versus genuinely harvestable.

Model: each conv is an im2col matmul M=(2B·H·W), K=(9·Cin), N=Cout; each
attention/dense likewise. MXU tile-padding efficiency per matmul ≈
  (M/⌈M⌉₈ · K/⌈K⌉₁₂₈ · N/⌈N⌉₁₂₈)
(v5e native tiling: 8-row sublane × 128-lane; the systolic array
contracts K and produces N in 128-wide tiles — a K=36,N=64 conv can at
best use 36/128 · 64/128 of the array). This is an UPPER bound on
achievable utilization per op (it ignores pipeline ramp, HBM stalls,
and fusion wins), so the FLOP-weighted aggregate is a defensible
*ceiling* for the whole step, not an excuse.

Prints a per-level table and the weighted ceiling; pairs with the
measured step decomposition (scripts/perf_step_decomp.py) in
docs/PERFORMANCE.md "Where the other 72% goes".
"""
from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B2 = 128  # CFG doubles the 64-image sampling batch: 2B rows per step


def ceil_to(x: int, m: int) -> int:
    return int(math.ceil(x / m) * m)


def mm_eff(M: int, K: int, N: int) -> float:
    return (M / ceil_to(M, 8)) * (K / ceil_to(K, 128)) * (N / ceil_to(N, 128))


rows = []


def conv(name, hw, cin, cout, k=3):
    M, K, N = B2 * hw, k * k * cin, cout
    fl = 2.0 * M * K * N
    rows.append((name, fl, mm_eff(M, K, N), f"{M}x{K}x{N}"))


def dense(name, T, cin, cout):
    M, K, N = B2 * T, cin, cout
    fl = 2.0 * M * K * N
    rows.append((name, fl, mm_eff(M, K, N), f"{M}x{K}x{N}"))


def attn(name, T, C, heads=4):
    dense(f"{name}.qkv", T, C, 3 * C)
    dense(f"{name}.out", T, C, C)
    # scores/attn-v: per-head T×(C/h)×T and T×T×(C/h) batched matmuls
    hd = C // heads
    M, K, N = B2 * heads * T, hd, T
    rows.append((f"{name}.qk", 2.0 * M * K * N, mm_eff(M, K, N),
                 f"{M}x{K}x{N}"))
    M, K, N = B2 * heads * T, T, hd
    rows.append((f"{name}.av", 2.0 * M * K * N, mm_eff(M, K, N),
                 f"{M}x{K}x{N}"))
    dense(f"{name}.ff1", T, C, C)
    dense(f"{name}.ff2", T, C, C)


def main():
    b, lat, in_ch = 64, 28, 4
    s1 = lat
    s2, s3, s4 = s1 // 2, s1 // 4, max(1, s1 // 8)
    h1, h2, h3, h4 = s1 * s1, s2 * s2, s3 * s3, s4 * s4

    conv("inc.c1", h1, in_ch, b); conv("inc.c2", h1, b, b)
    conv("down1.r1a", h2, b, b); conv("down1.r1b", h2, b, b)
    conv("down1.r2a", h2, b, 2 * b); conv("down1.r2b", h2, 2 * b, 2 * b)
    attn("sa1", h2, 2 * b)
    conv("down2.r1a", h3, 2 * b, 2 * b); conv("down2.r1b", h3, 2 * b, 2 * b)
    conv("down2.r2a", h3, 2 * b, 4 * b); conv("down2.r2b", h3, 4 * b, 4 * b)
    attn("sa2", h3, 4 * b)
    conv("down3.r1a", h4, 4 * b, 4 * b); conv("down3.r1b", h4, 4 * b, 4 * b)
    conv("down3.r2a", h4, 4 * b, 4 * b); conv("down3.r2b", h4, 4 * b, 4 * b)
    attn("sa3", h4, 4 * b)
    conv("bot1.a", h4, 4 * b, 8 * b); conv("bot1.b", h4, 8 * b, 8 * b)
    conv("bot2.a", h4, 8 * b, 8 * b); conv("bot2.b", h4, 8 * b, 8 * b)
    conv("bot3.a", h4, 8 * b, 4 * b); conv("bot3.b", h4, 4 * b, 4 * b)
    conv("up1.r1a", h3, 8 * b, 8 * b); conv("up1.r1b", h3, 8 * b, 8 * b)
    conv("up1.r2a", h3, 8 * b, 4 * b); conv("up1.r2b", h3, 4 * b, 2 * b)
    attn("sa4", h3, 2 * b)
    conv("up2.r1a", h2, 4 * b, 4 * b); conv("up2.r1b", h2, 4 * b, 4 * b)
    conv("up2.r2a", h2, 4 * b, 2 * b); conv("up2.r2b", h2, 2 * b, b)
    attn("sa5", h2, b)
    conv("up3.r1a", h1, 2 * b, 2 * b); conv("up3.r1b", h1, 2 * b, 2 * b)
    conv("up3.r2a", h1, 2 * b, b); conv("up3.r2b", h1, b, b)
    attn("sa6", h1, b)
    conv("out", h1, b, in_ch, k=1)

    total = sum(r[1] for r in rows)
    weighted = sum(r[1] * r[2] for r in rows) / total
    print(f"{'op':12s} {'GFLOP':>8s} {'share':>6s} {'tile-eff':>8s}  shape(MxKxN)")
    agg = {}
    for name, fl, eff, shape in rows:
        level = name.split(".")[0]
        a = agg.setdefault(level, [0.0, 0.0])
        a[0] += fl
        a[1] += fl * eff
    for level, (fl, fe) in agg.items():
        print(f"{level:12s} {fl/1e9:8.1f} {fl/total*100:5.1f}% "
              f"{fe/fl*100:7.1f}%")
    print(f"\ntotal per CFG step (2B={B2}): {total/1e12:.3f} TFLOP")
    print(f"FLOP-weighted MXU tile-padding ceiling: {weighted*100:.1f}% "
          f"of bf16 peak")
    peak = 197.0  # v5e ~197 TFLOP/s bf16
    print(f"=> practical compute ceiling ≈ {weighted*peak:.0f} TFLOP/s; "
          f"measured exact-DDPM ≈ 56-57 TFLOP/s")
    print(f"=> measured / tile ceiling = "
          f"{56.5/(weighted*peak)*100:.0f}% (the rest: VPU ops — "
          f"GroupNorm/GELU/softmax/resize — HBM traffic, scan glue, "
          f"decode+fetch share; measured split in perf_step_decomp)")


if __name__ == "__main__":
    main()

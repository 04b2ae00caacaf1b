"""Benchmark: conditional-generation throughput at the reference workload.

North-star metric (BASELINE.md): images/sec/chip for 1000-step DDPM reverse
sampling with classifier-free guidance on the flagship conditional latent
U-Net (reference-size: base_ch=64, time_dim=256, ~23M params, 28×28×4
latents) INCLUDING the VAE decode to 224×224 images.

Baseline denominator: the PyTorch reference measured on CPU in this image
(B=8, torch 2.x, eager): 0.0110 images/sec — see BASELINE.md.

Prints exactly one JSON line (the driver contract):
  {"metric": "cond_gen_images_per_sec", "value": N, "unit": "images/sec/chip",
   "vs_baseline": N / 0.0110, ...extras}

``value`` is the SUSTAINED throughput of one ``reps×batch``-image request
processed in ``batch``-size chunks (round 3 on): the pipeline dispatches
chunk i+1 before fetching chunk i, so the device→host image fetch (~0.45 s
per 64-image uint8 chunk through the axon tunnel) overlaps compute — the
shape of the reference workload (500 images/class in batches,
generate_cond.py:51). Serialized per-batch latency reps (mean/min/std,
round-2's headline methodology) are reported alongside so cross-round
comparisons stay possible. ``tflops_per_sec`` comes from an analytic FLOP
count of the whole program (2B CFG U-Net forwards × T steps + whole-batch
VAE decode).

Round 4 on, the headline measures the CERTIFIED production fast path:
``ddpm_cached`` — the same T=1000 guided DDPM trajectory with the U-Net
encoder computed every k-th step ("Faster Diffusion" reuse; the
decoder+skip path still runs all 1000 steps). Round 5 promotes the
default to k=3 (VERDICT r4 next #3): its promotion-gate cert is green —
recall 0.688/0.819/0.795 vs exact DDPM's 0.673/0.809/0.785, every cell
within metric noise (quality_r2/ddpm_cached3_cert.json) — and it
measured 11.25 img/s steady vs k=2's 10.98. k=2 remains certified
(quality_r2/ddpm_cached2_cert.json) and selectable via BENCH_CACHE_K=2.
The exact no-reuse DDPM number is ALWAYS reported alongside under
``exact_ddpm`` (round-2/3 headline continuity); set BENCH_EXACT_ONLY=1
to make the headline the exact path again.

Env overrides: BENCH_BATCH (default 64), BENCH_REPS (default 5),
BENCH_CACHE_K (default 3) encoder-reuse interval for the headline,
BENCH_EXACT_ONLY=1 headline = exact DDPM (skip the cached fast path),
BENCH_SWEEP=1 adds a batch sweep [32, 64, 128, 256] to the extras,
BENCH_DDIM=1 adds the 50-step DDIM fast-path measurement to the extras,
BENCH_DISTILL=1 the distilled serving mode (DDIM-8, trailing grid, no CFG),
BENCH_DPMPP=1 the 20-step DPM-Solver++(2M) one.
"""
from __future__ import annotations

import json
import os
import time

import jax

# persistent compilation cache: the T=1000 scan costs minutes to compile
# cold; cached reruns start in seconds (same-process only on axon)
os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

BASELINE_CPU_IMAGES_PER_SEC = 0.0110  # PyTorch reference, CPU, B=8 (BASELINE.md)


# ---------------------------------------------------------------------------
# Analytic FLOPs (multiply-add = 2 FLOPs). Layer list mirrors
# models/unet.py::CondUNet at base_ch=64 / latent 28×28 and
# models/vae.py::Decoder at base 64 / 224×224 output.
# ---------------------------------------------------------------------------

def _conv(hw: int, cin: int, cout: int, k: int = 3) -> float:
    return 2.0 * hw * k * k * cin * cout


def _attn(T: int, C: int) -> float:
    proj = 2.0 * T * C * (3 * C) + 2.0 * T * C * C      # qkv + out
    scores = 2.0 * T * T * C * 2                        # qk^T and attn@v
    ff = 2.0 * (2.0 * T * C * C)                        # two C→C dense
    return proj + scores + ff


def unet_fwd_flops(base_ch: int = 64, lat: int = 28, in_ch: int = 4) -> float:
    """One CondUNet forward on ONE sample (B=1)."""
    b = base_ch
    # torch MaxPool floors odd sizes: 28 → 14 → 7 → 3
    s1 = lat
    s2, s3, s4 = s1 // 2, s1 // 2 // 2, max(1, s1 // 2 // 2 // 2)
    h1, h2, h3, h4 = s1 * s1, s2 * s2, s3 * s3, s4 * s4
    f = 0.0
    f += _conv(h1, in_ch, b) + _conv(h1, b, b)                     # inc
    f += 2 * _conv(h2, b, b) + _conv(h2, b, 2 * b) + _conv(h2, 2 * b, 2 * b)
    f += _attn(h2, 2 * b)                                          # down1+sa1
    f += 2 * _conv(h3, 2 * b, 2 * b) + _conv(h3, 2 * b, 4 * b) + \
        _conv(h3, 4 * b, 4 * b)
    f += _attn(h3, 4 * b)                                          # down2+sa2
    f += 2 * _conv(h4, 4 * b, 4 * b) + 2 * _conv(h4, 4 * b, 4 * b)
    f += _attn(h4, 4 * b)                                          # down3+sa3
    f += _conv(h4, 4 * b, 8 * b) + _conv(h4, 8 * b, 8 * b)         # bot1
    f += 2 * _conv(h4, 8 * b, 8 * b)                               # bot2
    f += _conv(h4, 8 * b, 4 * b) + _conv(h4, 4 * b, 4 * b)         # bot3
    f += 2 * _conv(h3, 8 * b, 8 * b) + _conv(h3, 8 * b, 4 * b) + \
        _conv(h3, 4 * b, 2 * b)
    f += _attn(h3, 2 * b)                                          # up1+sa4
    f += 2 * _conv(h2, 4 * b, 4 * b) + _conv(h2, 4 * b, 2 * b) + \
        _conv(h2, 2 * b, b)
    f += _attn(h2, b)                                              # up2+sa5
    f += 2 * _conv(h1, 2 * b, 2 * b) + _conv(h1, 2 * b, b) + _conv(h1, b, b)
    f += _attn(h1, b)                                              # up3+sa6
    f += _conv(h1, b, in_ch, k=1)                                  # out
    return f


def vae_decode_flops(base_ch: int = 64, lat: int = 28, z_ch: int = 4) -> float:
    """One VAE decode z(lat²) → image(8·lat)² on ONE sample. A k4s2
    ConvTranspose costs 2·H_in·W_in·16·Cin·Cout."""
    b = base_ch
    f = 0.0
    hw = lat * lat
    f += _conv(hw, z_ch, 4 * b)
    f += 2.0 * hw * 16 * (4 * b) * (4 * b)          # up0
    hw *= 4
    f += _conv(hw, 4 * b, 2 * b)
    f += 2.0 * hw * 16 * (2 * b) * (2 * b)          # up1
    hw *= 4
    f += _conv(hw, 2 * b, b)
    f += 2.0 * hw * 16 * b * b                      # up2
    hw *= 4
    f += _conv(hw, b, 3)                            # out
    return f


def run_flops(batch: int, timesteps: int = 1000, guidance: bool = True) -> float:
    """Total FLOPs of one benchmark run: T steps × (2B if CFG else B) U-Net
    forwards + B decodes."""
    mult = 2 if guidance else 1
    return (timesteps * mult * batch * unet_fwd_flops()
            + batch * vae_decode_flops())


# ---------------------------------------------------------------------------

def build_pipeline():
    from diffusion_model_tpu.diffusion import DiffusionSchedule
    from diffusion_model_tpu.models import (
        VAE, VAEConfig, CondUNet, UNetConfig,
    )
    from diffusion_model_tpu.pipeline import DiffusionPipeline

    rng = jax.random.PRNGKey(0)
    unet = CondUNet(UNetConfig(
        in_ch=4, time_dim=256, num_classes=3, geom_dim=12,
        with_geom_head=True, base_ch=64, dtype=jnp.bfloat16,
    ))
    vae = VAE(VAEConfig(base_channels=64, dtype=jnp.bfloat16))

    z = jnp.zeros((1, 28, 28, 4))
    unet_params = unet.init(
        rng, z, jnp.ones((1,), jnp.int32), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 12)), jnp.zeros((1, 12)),
    )["params"]
    vae_params = vae.init(
        {"params": rng, "sample": rng}, jnp.zeros((1, 224, 224, 3))
    )["params"]
    schedule = DiffusionSchedule.create(1000)
    return DiffusionPipeline(
        unet=unet, unet_params=unet_params, vae=vae, vae_params=vae_params,
        schedule=schedule,
    )


def time_batch(pipe, batch: int, reps: int, key, method: str = "ddpm",
               steps: int = 0, guidance: float = 3.0,
               spacing: str = "linear") -> dict:
    def run(k, count, chunk):
        # quantize=True: uint8 conversion on device — the production save
        # path's output format (reverse_to_img parity) and 4× less
        # device→host transfer than f32 images
        return pipe.sample_latent_cond(
            (1, count), guidance_scale=guidance, key=k, to_pil=False,
            image_hw=(224, 224), quantize=True, method=method,
            num_inference_steps=steps, batch_size=chunk,
            timestep_spacing=spacing,
        )

    t0 = time.time()
    run(key, batch, 0)  # compile + warmup
    compile_s = time.time() - t0

    # single-batch latency reps (dispatch → fetch, serialized)
    times = []
    for i in range(reps):
        t0 = time.time()
        run(jax.random.fold_in(key, i + 2), batch, 0)
        times.append(time.time() - t0)
    times = np.asarray(times)

    # steady-state throughput: ONE call generating reps×batch images in
    # batch-size chunks — the pipeline dispatch-ahead overlaps each chunk's
    # device→host fetch with the next chunk's scan, which is exactly the
    # reference workload shape (500 images/class in batches,
    # generate_cond.py:51). This is the headline number.
    t0 = time.time()
    run(jax.random.fold_in(key, 1000), batch * reps, batch)
    steady_s = time.time() - t0
    return {
        "batch": batch,
        "compile_s": round(compile_s, 1),
        "run_s_mean": round(float(times.mean()), 3),
        "run_s_min": round(float(times.min()), 3),
        "run_s_max": round(float(times.max()), 3),
        "run_s_std": round(float(times.std()), 3),
        "ips_mean": round(batch / float(times.mean()), 3),
        "ips_best": round(batch / float(times.min()), 3),
        "steady_s": round(steady_s, 3),
        "steady_batches": reps,
        "ips_steady": round(batch * reps / steady_s, 3),
    }


def time_batch_nofetch(pipe, batch: int, reps: int, key,
                       method: str = "ddpm", steps: int = 0,
                       guidance: float = 3.0,
                       spacing: str = "linear") -> dict:
    """Device-side sink: run the full scan+decode+uint8 program but fetch
    only a reduced scalar — isolates the axon tunnel's device→host image
    fetch from the compute pipeline (VERDICT r2 weak #2: the B=256 droop
    decomposition was estimated, not measured). The split matters most for
    short programs: at 8 DDIM steps the 9.6 MB/batch uint8 image fetch can
    exceed device compute when the tunnel is slow (measured 2026-08-21:
    ~15 MB/s vs round 4's much faster link), making the fetched number a
    property of the tunnel, not the framework — a production TPU host
    fetches over local PCIe at GB/s."""
    import jax.numpy as jnp

    run = pipe._sampler(guidance, True, snapshots=False, quantize=True,
                        method=method, num_inference_steps=steps,
                        timestep_spacing=spacing)
    y = jnp.ones((batch,), jnp.int32)
    vals = jnp.zeros((batch, 12))
    mask = jnp.zeros((batch, 12))
    sink = jax.jit(lambda u8: jnp.sum(u8.astype(jnp.uint32)))

    def go(k):
        x0 = jax.random.normal(k, (batch, 28, 28, 4), dtype=jnp.float32)
        out = run(pipe.unet_params, pipe.vae_params, x0,
                  jax.random.fold_in(k, 1), y, vals, mask)
        return int(sink(out))  # one scalar crosses the tunnel

    t0 = time.time()
    go(key)
    compile_s = time.time() - t0
    times = []
    for i in range(reps):
        t0 = time.time()
        go(jax.random.fold_in(key, i + 2))
        times.append(time.time() - t0)
    times = np.asarray(times)
    return {
        "batch": batch,
        "compile_s": round(compile_s, 1),
        "run_s_mean": round(float(times.mean()), 3),
        "run_s_std": round(float(times.std()), 3),
        "ips_mean": round(batch / float(times.mean()), 3),
    }


def _probe_device_or_die(timeout_s: int = 300) -> None:
    """Fail fast when the TPU tunnel is wedged.

    ``jax.devices()`` under the axon plugin hangs silently (no error, no
    timeout) while the tunnel is down — observed outages run 6-25+ hours.
    Probe device initialization in a bounded subprocess first so an
    unattended bench invocation exits nonzero in minutes instead of
    hanging forever. Skipped for explicit CPU runs.
    """
    if os.environ.get("DIFFUSION_TPU_PLATFORM", "").lower() == "cpu":
        return
    import subprocess
    import sys
    try:
        subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, check=True,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )
    except subprocess.TimeoutExpired:
        print(f"bench: device initialization did not answer within "
              f"{timeout_s}s (TPU tunnel down?) — aborting", flush=True)
        sys.exit(2)
    except subprocess.CalledProcessError as e:
        print(f"bench: device probe failed (rc={e.returncode})", flush=True)
        sys.exit(2)


def _write_local_evidence(result: dict) -> None:
    """Persist every successful bench run to BENCH_LOCAL.json (VERDICT r3 #6).

    Round 3's headline was driver-unverified because the axon tunnel was
    down at bench time (BENCH_r03.json: rc=2, parsed=null). This appends a
    machine-captured record — timestamp, env fingerprint, device kind,
    libtpu/jax versions, the full parsed metrics, and the env overrides in
    effect — so a tunnel-down driver round can still point at verifiable
    on-machine evidence. Append-keyed by UTC timestamp; file is a JSON list.
    """
    import datetime
    try:
        devs = jax.devices()
        fingerprint = {
            "ts_utc": datetime.datetime.now(datetime.timezone.utc).isoformat(
                timespec="seconds"),
            "jax": jax.__version__,
            "device_kind": devs[0].device_kind if devs else "none",
            "platform": devs[0].platform if devs else "none",
            "n_devices": len(devs),
            "env": {k: v for k, v in os.environ.items()
                    if k.startswith(("BENCH_", "DIFFUSION_TPU_", "XLA_FLAGS"))},
            "result": result,
        }
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BENCH_LOCAL.json")
        history = []
        if os.path.exists(path):
            try:
                with open(path) as f:
                    history = json.load(f)
                if not isinstance(history, list):
                    history = [history]
            except Exception:
                history = []
        history.append(fingerprint)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(history[-50:], f, indent=1)
        os.replace(tmp, path)
    except Exception as e:  # evidence write must never fail the bench
        print(f"bench: BENCH_LOCAL.json write skipped ({e})", flush=True)


def main():
    _probe_device_or_die()
    batch = int(os.environ.get("BENCH_BATCH", "64"))
    reps = int(os.environ.get("BENCH_REPS", "5"))
    sweep = os.environ.get("BENCH_SWEEP", "0") == "1"

    pipe = build_pipeline()
    key = jax.random.PRNGKey(1)
    n_chips = max(1, len(jax.devices()))

    exact = time_batch(pipe, batch, reps, key)
    exact_only = os.environ.get("BENCH_EXACT_ONLY", "0") == "1"
    cache_k = int(os.environ.get("BENCH_CACHE_K", "3"))
    if exact_only:
        head, method = exact, "ddpm"
    else:
        # certified fast path (see module docstring): T=1000 guided DDPM
        # with encoder reuse k (default 3 since round 5), quality-pinned
        # vs exact DDPM in quality_r2/ddpm_cached<k>_cert.json
        head = time_batch(pipe, batch, reps, jax.random.fold_in(key, 41),
                          method="ddpm_cached", steps=cache_k)
        method = f"ddpm_cached_k{cache_k}"
    # Headline = sustained throughput over reps×batch images (fetch
    # overlapped with compute); per-batch latency reps reported alongside.
    ips = head["ips_steady"] / n_chips
    # tflops_per_sec always comes from the EXACT run: run_flops() counts
    # full per-step forwards, which the cached path deliberately skips —
    # crediting skipped FLOPs would inflate the rate.
    exact_rate = exact["steady_s"] / exact["steady_batches"]
    tflops = run_flops(batch) / (exact_rate * 1e12) / n_chips

    extras = {}
    if not exact_only:
        extras["exact_ddpm"] = exact
        extras["quality_cert"] = f"quality_r2/ddpm_cached{cache_k}_cert.json"
    if os.environ.get("BENCH_DDIM", "0") == "1":
        extras["ddim50"] = time_batch(pipe, batch, reps,
                                      jax.random.fold_in(key, 999),
                                      method="ddim", steps=50)
    if os.environ.get("BENCH_DPMPP", "0") == "1":
        extras["dpmpp20"] = time_batch(pipe, batch, reps,
                                       jax.random.fold_in(key, 998),
                                       method="dpmpp", steps=20)
    if os.environ.get("BENCH_DISTILL", "0") == "1":
        # the distilled-checkpoint serving mode: 8 DDIM steps on the
        # trailing grid with guidance folded into the weights (NO CFG —
        # each step is a 1B forward). Throughput is weight-independent,
        # so this prices the mode before a distillation run finishes;
        # quality comes from quality_r2/distill8_cert.json.
        extras["ddim8_trailing_nocfg"] = time_batch(
            pipe, batch, reps, jax.random.fold_in(key, 997),
            method="ddim", steps=8, guidance=0.0, spacing="trailing")
        # device-only companion: at 8 steps the program is so short that
        # the image fetch dominates whenever the tunnel is slow; this leg
        # prices the mode as a production host (local PCIe fetch) would
        extras["ddim8_trailing_nocfg_nofetch"] = time_batch_nofetch(
            pipe, batch, reps, jax.random.fold_in(key, 996),
            method="ddim", steps=8, guidance=0.0, spacing="trailing")
    if os.environ.get("BENCH_CACHED", "0") == "1":
        # full-T DDPM with encoder reuse ("Faster Diffusion"); steps slot
        # carries the cache interval k
        for k in (2, 3):
            extras[f"ddpm_cached_k{k}"] = time_batch(
                pipe, batch, reps, jax.random.fold_in(key, 990 + k),
                method="ddpm_cached", steps=k)
    if sweep:
        extras["sweep"] = [
            time_batch(pipe, b, max(2, reps // 2), jax.random.fold_in(key, b))
            for b in (32, 64, 128, 256)
        ]
    if os.environ.get("BENCH_NOFETCH", "0") == "1":
        extras["nofetch"] = [
            time_batch_nofetch(pipe, b, max(2, reps // 2),
                               jax.random.fold_in(key, 7000 + b))
            for b in (64, 256)
        ]

    result = {
        "metric": "cond_gen_images_per_sec",
        "value": round(ips, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / BASELINE_CPU_IMAGES_PER_SEC, 1),
        "method": method,
        "batch": batch,
        "num_timesteps": 1000,
        "guidance_scale": 3.0,
        "chips": n_chips,
        "reps": reps,
        "compile_s": head["compile_s"],
        "run_s_mean": head["run_s_mean"],
        "run_s_min": head["run_s_min"],
        "run_s_std": head["run_s_std"],
        "ips_latency_mean": round(head["ips_mean"] / n_chips, 3),
        "ips_best": round(head["ips_best"] / n_chips, 3),
        "steady_s": head["steady_s"],
        "steady_batches": head["steady_batches"],
        "tflops_per_sec": round(tflops, 2),
        "analytic_tflops_per_run": round(run_flops(batch) / 1e12, 2),
        **extras,
    }
    _write_local_evidence(result)
    print(json.dumps(result))


if __name__ == "__main__":
    main()

"""Decompose the production sampling step's cost on the real chip.

The round-3 per-level scan (scripts/perf_level_scan.py) priced each U-Net
level in isolation; this prices the ASSEMBLED production step — the exact
`sample_loop` body (2B CFG forward + per-step RNG fold + DDPM posterior,
diffusion/sampling.py:128-138) — plus ablations, so the gap between
"sum of parts" and "whole step" (embeddings, resizes, concats, scheduler
glue, scan overhead) is measured instead of guessed.

Rows (all `lax.scan` over N iters inside one jit; ms/iter):
  full_step    production step body at sampling batch B (2B CFG rows)
  unet_fwd     one CondUNet forward at 2B rows (the step's compute core)
  glue         step body with the U-Net replaced by a copy — RNG fold +
               normal + posterior + CFG concat/split/combine
  decode/step  whole-batch chunked VAE decode amortized over T=1000

Usage: timeout 3600 python scripts/perf_step_decomp.py [B]
"""
import sys
import time

t0 = time.time()


def log(*a):
    print(f"[{time.time()-t0:6.1f}s]", *a, flush=True)


import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, "/root/repo")
import os  # noqa: E402

os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import build_pipeline, unet_fwd_flops  # noqa: E402
from diffusion_model_tpu.diffusion.sampling import (  # noqa: E402
    cfg_eps, ddpm_posterior_step,
)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
N = int(os.environ.get("DECOMP_ITERS", "300"))
log("devices:", jax.devices(), "B =", B)

pipe = build_pipeline()
eps_fn = pipe._eps_fn(pipe.unet_params)
schedule = pipe.schedule
T = schedule.num_timesteps

key = jax.random.PRNGKey(0)
y = jnp.ones((B,), jnp.int32)
vals = jnp.zeros((B, 12))
mask = jnp.zeros((B, 12))
x0 = jax.random.normal(key, (B, 28, 28, 4), dtype=jnp.float32)


def timeit(name, body, x_init, gflop_per_iter=0.0):
    f = jax.jit(lambda x: jax.lax.scan(
        lambda c, i: (body(c, i), None), x, jnp.arange(N))[0])
    r = f(x_init)
    r.block_until_ready()
    t1 = time.time()
    r = f(x_init)
    r.block_until_ready()
    ms = (time.time() - t1) / N * 1e3
    tf = f"   {gflop_per_iter/ms:6.1f} TFLOP/s" if gflop_per_iter else ""
    log(f"{name:12s} {ms:7.3f} ms/iter{tf}")
    return ms


def full_step(x, i):
    t = jnp.full((B,), T - (i % T), dtype=jnp.int32)
    eps = cfg_eps(eps_fn, x, t, y, vals, mask, guidance_scale=3.0)
    step_key = jax.random.fold_in(key, i)
    noise = jax.random.normal(step_key, x.shape, dtype=x.dtype)
    return ddpm_posterior_step(schedule, x, t, eps, noise)


def glue_step(x, i):
    # identical body with the network replaced by a pass-through on the
    # same 2B tensor, so concat/split/guidance-combine costs stay in
    def fake_eps(x2, t2, y2, cv2, cm2):
        return x2 * (1.0 + 1e-6 * t2[0].astype(x2.dtype))
    t = jnp.full((B,), T - (i % T), dtype=jnp.int32)
    eps = cfg_eps(fake_eps, x, t, y, vals, mask, guidance_scale=3.0)
    step_key = jax.random.fold_in(key, i)
    noise = jax.random.normal(step_key, x.shape, dtype=x.dtype)
    return ddpm_posterior_step(schedule, x, t, eps, noise)


x2 = jnp.concatenate([x0, x0], axis=0)
t2 = jnp.full((2 * B,), 500, jnp.int32)
y2 = jnp.concatenate([jnp.zeros_like(y), y])
v2 = jnp.concatenate([vals, vals])
m2 = jnp.concatenate([mask, mask])


def unet_only(x, i):
    eps = eps_fn(x, t2 + (i % 3), y2, v2, m2)
    return x + 1e-6 * eps.astype(x.dtype)


gf_fwd = 2 * B * unet_fwd_flops() / 1e9
ms_full = timeit("full_step", full_step, x0, gf_fwd)
ms_unet = timeit("unet_fwd", unet_only, x2, gf_fwd)
ms_glue = timeit("glue", glue_step, x0)

# decode amortization: one whole-batch chunked decode, not per step
dec = jax.jit(lambda z: pipe._decode(pipe.vae_params, z))
try:
    z = jax.random.normal(key, (B, 28, 28, 4), dtype=jnp.float32)
    r = dec(z)
    jax.block_until_ready(r)
    t1 = time.time()
    for _ in range(3):
        r = dec(z)
    jax.block_until_ready(r)
    ms_dec = (time.time() - t1) / 3 * 1e3
    log(f"{'decode(B)':12s} {ms_dec:7.3f} ms  -> {ms_dec/T:7.4f} ms/step amortized")
except Exception as e:  # decode entry name differs — report and continue
    log("decode skipped:", str(e)[:120])
    ms_dec = 0.0

log(f"step accounting: full={ms_full:.3f}  unet={ms_unet:.3f}  "
    f"glue={ms_glue:.3f}  unassigned={ms_full-ms_unet-ms_glue:+.3f} ms")
log(f"projected img/s at B={B}: {B / (ms_full * T / 1e3 + ms_dec / 1e3):.2f} "
    f"(fetch excluded)")
log("DONE")

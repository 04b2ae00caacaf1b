"""High-level generation pipeline: the throughput-critical inference path.

Capability parity with the reference ``Diffuser.sample*`` surface
(/root/reference/diff.py:66-369) and ``EntityCsvSampler``
(/root/reference/entityCsvSampler.py:9-199), re-architected TPU-first:

- ONE jitted program per (batch-shape, guidance, decode) combination runs the
  entire T-step reverse scan AND the VAE decode; latents never leave HBM and
  the host sees only the final uint8 images (the reference does 1000 Python
  steps × 2 model calls + chunked fp16 decode with gc/empty_cache,
  diff.py:326-367);
- CFG is one batched 2B forward per step (diffusion/sampling.py);
- bf16 compute throughout the model, fp32 posterior math;
- generation batches shard over the mesh's ``data`` axis — every chip runs
  the scan on its slice (SURVEY.md §2 "DP (sampling)").

Input-normalization parity: ``class_counts`` as ``{cls: n}`` / ``(cls, n)`` /
``[(cls, n), ...]`` (diff.py:206-220); ``cond``/``cond_mask`` as dicts,
per-sample dict lists, or (B, K) arrays (diff.py:241-312 via
data.geometry.conditions_from_dicts).
"""
from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .data import geometry as G
from .diffusion import (
    DiffusionSchedule,
    sample_loop,
    sample_loop_ddim,
    sample_loop_ddim_parallel,
    sample_loop_encoder_cached,
    sample_loop_dpmpp,
    sample_loop_with_snapshots,
)
from .diffusion.sampling import v_to_eps
from .models import VAE, CondUNet
from .parallel import make_mesh, shard_batch
from .train.checkpoints import load_params

ClassCounts = Union[Dict[int, int], Tuple[int, int], List[Tuple[int, int]]]


def _env_compiler_options() -> Optional[Dict[str, str]]:
    """Per-jit XLA compiler options from DIFFUSION_TPU_COMPILER_OPTIONS
    (``key=val,key=val``), e.g. ``xla_tpu_scoped_vmem_limit_kib=65536``.

    TPU-backend flags CANNOT be set via XLA_FLAGS on this stack: the axon
    client's local XLA parser rejects flags it doesn't know (fatal
    ``Unknown flag in XLA_FLAGS``) even though compilation happens on the
    remote TPU server. Per-jit compiler_options travel inside the compile
    request instead, so backend-only options reach the compiler that
    actually understands them. Benchmark/A-B plumbing — unset (the
    default) means no override."""
    raw = os.environ.get("DIFFUSION_TPU_COMPILER_OPTIONS", "").strip()
    if not raw:
        return None
    out: Dict[str, str] = {}
    for kv in raw.split(","):
        k, _, v = kv.partition("=")
        if k.strip():
            out[k.strip()] = v.strip()
    return out or None


def normalize_class_counts(cc: ClassCounts) -> List[Tuple[int, int]]:
    """diff.py:206-220 normalization: {cls: n} | (cls, n) | [(cls, n)...]."""
    if isinstance(cc, dict):
        items = list(cc.items())
    elif isinstance(cc, tuple) and len(cc) == 2:
        items = [cc]
    elif isinstance(cc, list):
        items = list(cc)
    else:
        raise ValueError(
            "class_counts must be {cls: n}, (cls, n), or a list of pairs"
        )
    items = [(int(c), int(n)) for c, n in items if int(n) > 0]
    if not items:
        raise ValueError("requested zero images")
    return items


def to_uint8(images: np.ndarray) -> np.ndarray:
    """[0,1] float images → uint8 (diff.py:58-64 reverse_to_img).

    Arrays already quantized on device pass through unchanged."""
    arr = np.asarray(images)
    if arr.dtype == np.uint8:
        return arr
    return np.clip(arr * 255.0, 0, 255).astype(np.uint8)


def to_pil_list(images: np.ndarray) -> list:
    from PIL import Image

    arr = to_uint8(images)
    return [Image.fromarray(a) for a in arr]


@dataclasses.dataclass
class DiffusionPipeline:
    """Bundles (unet, vae, schedule, params) with compiled samplers."""

    unet: CondUNet
    unet_params: dict
    vae: Optional[VAE]
    vae_params: Optional[dict]
    schedule: DiffusionSchedule
    use_data_parallel: bool = True
    # "epsilon" (reference semantics) or "v": what the U-Net checkpoint was
    # trained to predict; "v" outputs are converted to ε exactly inside the
    # jitted program (diffusion.sampling.v_to_eps), so every sampler works
    # with either parameterization
    prediction_type: str = "epsilon"
    # decode the final latents in fixed chunks of this many images inside
    # the jit (0 = whole batch); bounds 224² decoder intermediates at large
    # batches — see _decode
    decode_chunk: int = 32

    def __post_init__(self):
        import threading

        # Pin params to the device ONCE: checkpoint loads
        # (flax.serialization.from_bytes) return host numpy, and a host
        # pytree passed into the jitted samplers re-uploads the whole
        # U-Net (~120 MB fp32) on EVERY generate call — pure latency, and
        # under the remote-device client the retained per-dispatch host
        # buffers accumulate (the round-4 distill OOM signature). No-op
        # for already-device-resident pytrees.
        self.unet_params = jax.device_put(self.unet_params)
        if self.vae_params is not None:
            self.vae_params = jax.device_put(self.vae_params)

        self._compiled = {}
        # serve.py drives one pipeline from ThreadingHTTPServer threads;
        # guard the jit cache so concurrent first requests for the same
        # sampler key compile once instead of racing
        self._compile_lock = threading.Lock()
        self._mesh = None
        if self.use_data_parallel and len(jax.devices()) > 1:
            self._mesh = make_mesh(("data",))

    # ------------------------------------------------------------------
    @classmethod
    def from_checkpoints(
        cls,
        unet_ckpt: str,
        vae_ckpt: Optional[str],
        unet: CondUNet,
        vae: Optional[VAE],
        schedule: Optional[DiffusionSchedule] = None,
        latent_hw: Tuple[int, int] = (28, 28),
        image_hw: Tuple[int, int] = (224, 224),
    ) -> "DiffusionPipeline":
        """Load msgpack params saved by the trainers (Utils.loadModel parity,
        utils.py:67-73)."""
        schedule = schedule or DiffusionSchedule.create(1000)
        rng = jax.random.PRNGKey(0)
        zc = unet.config.in_ch
        dummy_z = jnp.zeros((1, latent_hw[0], latent_hw[1], zc))
        target_u = unet.init(
            rng, dummy_z, jnp.ones((1,), jnp.int32), jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, unet.config.geom_dim)),
            jnp.zeros((1, unet.config.geom_dim)),
        )["params"]
        unet_params = load_params(unet_ckpt, target_u)
        vae_params = None
        if vae is not None and vae_ckpt:
            dummy_x = jnp.zeros((1, image_hw[0], image_hw[1], 3))
            target_v = vae.init({"params": rng, "sample": rng}, dummy_x)[
                "params"
            ]
            vae_params = load_params(vae_ckpt, target_v)
        return cls(unet=unet, unet_params=unet_params, vae=vae,
                   vae_params=vae_params, schedule=schedule)

    # ------------------------------------------------------------------
    def _eps_fn(self, params):
        def eps(x, t, y, cv, cm):
            out = self.unet.apply({"params": params}, x, t, y, cv, cm)
            out = out[0] if isinstance(out, tuple) else out
            if self.prediction_type == "v":
                out = v_to_eps(self.schedule, x, t, out)
            return out
        return eps

    def _sampler(self, guidance_scale: float, decode: bool, snapshots: bool,
                 method: str = "ddpm", num_inference_steps: int = 0,
                 eta: float = 0.0, quantize: bool = False,
                 cache_interval: int = 2, timestep_spacing: str = "linear"):
        """Build (and cache) the jitted scan+decode program."""
        # DDPM scan unroll factor: a pure scheduling knob (see sample_loop
        # docstring) — numerics-identical, it only changes how many step
        # bodies XLA lays out per loop iteration. Default 2 from the
        # round-4 A/B on the real chip: 10.35 vs 10.06 img/s at B=64
        # (+2.9%, docs/ROUND4_NOTES.md); unroll=4 regressed in round 3.
        # Env-read so bench.py can sweep it without API churn, and part of
        # the cache key so a changed value recompiles.
        unroll = max(1, int(os.environ.get("DIFFUSION_TPU_SCAN_UNROLL", "2")))
        key_ = (float(guidance_scale), decode, snapshots, method,
                int(num_inference_steps), float(eta), quantize,
                int(self.decode_chunk), int(cache_interval),
                self.prediction_type, timestep_spacing, unroll,
                os.environ.get("DIFFUSION_TPU_COMPILER_OPTIONS", ""))
        with self._compile_lock:
            return self._sampler_locked(key_, guidance_scale, decode,
                                        snapshots, method,
                                        num_inference_steps, eta, quantize,
                                        cache_interval, timestep_spacing,
                                        unroll)

    def _decode(self, vae_params, zf):
        """VAE decode inside the sampling jit, optionally in fixed-size
        chunks via ``lax.map`` (``decode_chunk``).

        Chunking bounds the decoder's 224²-resolution intermediates: at
        large batches XLA's whole-batch decode loses more to HBM pressure
        than the scan's sequential chunks cost (measured in
        docs/PERFORMANCE.md batch-scaling notes)."""
        dec = lambda z: self.vae.apply(
            {"params": vae_params}, z, method=VAE.decode
        )
        B = zf.shape[0]
        c = self.decode_chunk
        if c <= 0 or B <= c or B % c != 0:
            return dec(zf)
        zc = zf.reshape((B // c, c) + zf.shape[1:])
        out = jax.lax.map(dec, zc)
        return out.reshape((B,) + out.shape[2:])

    def _sampler_locked(self, key_, guidance_scale, decode, snapshots,
                        method, num_inference_steps, eta, quantize,
                        cache_interval=2, timestep_spacing="linear",
                        unroll=1):
        if key_ in self._compiled:
            return self._compiled[key_]

        def run(unet_params, vae_params, x_init, key, y, vals, mask,
                snapshot_ts=None):
            eps = self._eps_fn(unet_params)
            if snapshots:
                zf, snaps = sample_loop_with_snapshots(
                    self.schedule, eps, x_init, key, snapshot_ts, y=y,
                    cond_vals=vals, cond_mask=mask,
                    guidance_scale=guidance_scale,
                )
            elif method == "ddim_parallel":
                # Picard sliding-window DDIM: the window·B model batch
                # shards over the data axis, so a small request still uses
                # the whole mesh (diffusion/parallel_sampling.py).
                S = num_inference_steps or 50
                zf, _sweeps = sample_loop_ddim_parallel(
                    self.schedule, eps, x_init,
                    num_inference_steps=S,
                    window=min(max(8, len(jax.devices())), S), tol=1e-3,
                    y=y, cond_vals=vals, cond_mask=mask,
                    guidance_scale=guidance_scale,
                    mesh=self._mesh, shard_axis="data",
                    timestep_spacing=timestep_spacing,
                )
                snaps = None
            elif method == "dpmpp":
                zf = sample_loop_dpmpp(
                    self.schedule, eps, x_init,
                    num_inference_steps=num_inference_steps or 20,
                    y=y, cond_vals=vals, cond_mask=mask,
                    guidance_scale=guidance_scale,
                    timestep_spacing=timestep_spacing,
                )
                snaps = None
            elif method == "ddpm_cached":
                # full T-step DDPM with the encoder re-run only every
                # cache_interval steps ("Faster Diffusion",
                # arXiv:2312.09608). cache_interval=1 == plain DDPM.
                from .models.unet import CondUNet as _CU

                def _embed(t, y_, cv, cm):
                    return self.unet.apply({"params": unet_params}, t, y_,
                                           cv, cm, method=_CU.embed)

                def _encode(x, emb):
                    return self.unet.apply({"params": unet_params}, x, emb,
                                           method=_CU.encode)

                def _decode_eps(feats, emb):
                    out = self.unet.apply({"params": unet_params}, feats,
                                          emb, method=_CU.decode)
                    return out[0] if isinstance(out, tuple) else out

                to_eps = None
                if self.prediction_type == "v":
                    to_eps = (lambda x2, t2, out:
                              v_to_eps(self.schedule, x2, t2, out))
                zf = sample_loop_encoder_cached(
                    self.schedule, _embed, _encode, _decode_eps, x_init,
                    key, y=y, cond_vals=vals, cond_mask=mask,
                    guidance_scale=guidance_scale,
                    cache_interval=max(1, int(cache_interval)),
                    model_out_to_eps=to_eps,
                )
                snaps = None
            elif method == "ddim":
                zf = sample_loop_ddim(
                    self.schedule, eps, x_init, key,
                    num_inference_steps=num_inference_steps or 50, eta=eta,
                    y=y, cond_vals=vals, cond_mask=mask,
                    guidance_scale=guidance_scale,
                    timestep_spacing=timestep_spacing,
                )
                snaps = None
            else:
                zf = sample_loop(
                    self.schedule, eps, x_init, key, y=y, cond_vals=vals,
                    cond_mask=mask, guidance_scale=guidance_scale,
                    unroll=unroll,
                )
                snaps = None
            if decode and self.vae is not None:
                out = self._decode(vae_params, zf)
            else:
                out = zf
            if quantize:
                # uint8 on device (reverse_to_img semantics, diff.py:58-64):
                # 4× less device→host transfer than f32 images
                out = jnp.clip(out * 255.0, 0.0, 255.0).astype(jnp.uint8)
            return (out, snaps) if snapshots else out

        jitted = jax.jit(run, static_argnames=(),
                         compiler_options=_env_compiler_options())
        self._compiled[key_] = jitted
        return jitted

    def _latent_shape(self, B: int, z_shape: Optional[Tuple[int, int, int]],
                      image_hw: Tuple[int, int]) -> Tuple[int, int, int, int]:
        if z_shape is not None:
            c, h, w = z_shape  # reference passes (C, H, W)
            return (B, h, w, c)
        h, w = self.vae.config.latent_hw(*image_hw)
        return (B, h, w, self.unet.config.in_ch)

    # ------------------------------------------------------------------
    def sample_latent_cond(
        self,
        class_counts: ClassCounts,
        z_shape: Optional[Tuple[int, int, int]] = None,
        cond=None,
        cond_mask=None,
        guidance_scale: float = 3.0,
        key: Optional[jax.Array] = None,
        to_pil: bool = True,
        decode: bool = True,
        image_hw: Tuple[int, int] = (224, 224),
        batch_size: int = 0,
        method: str = "ddpm",
        num_inference_steps: int = 0,
        cache_interval: int = 2,
        eta: float = 0.0,
        timestep_spacing: str = "linear",
        quantize: Optional[bool] = None,
        remainder: str = "pad",
    ):
        """Conditional latent generation (diff.py:174-369 parity).

        ``batch_size`` > 0 splits the request into fixed-size scan launches
        (one compilation, reused); 0 runs everything in one scan.
        ``remainder`` controls the short final chunk when ``count %
        batch_size != 0``: ``"pad"`` (default) repeats the last sample up to
        ``batch_size`` and discards the padding — right for one-shot CLI
        runs where an extra compilation costs minutes; ``"exact"`` runs the
        final chunk at its true size — one extra (cached) compilation, no
        wasted scan compute, right for long-lived serving processes.
        ``method="ddim"`` switches to the strided DDIM sampler with
        ``num_inference_steps`` model evaluations (default 50) and
        ``method="dpmpp"`` to second-order DPM-Solver++(2M) (default 20
        evaluations) — beyond-reference fast paths.
        ``timestep_spacing="karras"`` swaps their uniform-stride grid for
        the EDM ρ=7 sigma spacing (denser near t=1; usually better few-step
        detail — see docs/SAMPLERS.md).
        ``quantize`` converts decoded images to uint8 ON DEVICE (default:
        whenever the caller only needs uint8, i.e. ``to_pil and decode``) —
        4× less device→host transfer.
        Returns PIL images (default), float/uint8 images (``to_pil=False``)
        or raw latents (``decode=False``).
        """
        if quantize is None:
            quantize = bool(decode and to_pil)
        elif quantize and not decode:
            # clip(z*255)→uint8 on raw latents (values far outside [0,1])
            # would silently return saturated garbage
            raise ValueError(
                "quantize=True requires decode=True: quantization is only "
                "meaningful for [0,1] decoded images, not raw latents"
            )
        items = normalize_class_counts(class_counts)
        y_list: List[int] = []
        for cls_id, n in items:
            y_list += [cls_id] * n
        B = len(y_list)
        vals_np, mask_np = G.conditions_from_dicts(cond, cond_mask, y_list)
        y_np = np.asarray(y_list, dtype=np.int32)

        key = key if key is not None else jax.random.PRNGKey(0)
        run = self._sampler(guidance_scale, decode, snapshots=False,
                            method=method,
                            num_inference_steps=num_inference_steps, eta=eta,
                            cache_interval=cache_interval,
                            timestep_spacing=timestep_spacing,
                            quantize=quantize)

        if remainder not in ("pad", "exact"):
            raise ValueError(f"remainder must be 'pad' or 'exact', "
                             f"got {remainder!r}")
        chunks = []
        step = batch_size if batch_size > 0 else B
        for s in range(0, B, step):
            e = min(s + step, B)
            n = e - s
            pad = step - n if (
                batch_size > 0 and e == B and remainder == "pad"
            ) else 0
            sl = slice(s, e)
            y_c = np.concatenate([y_np[sl], y_np[sl][:0]]) if pad == 0 else \
                np.concatenate([y_np[sl], np.repeat(y_np[sl][-1:], pad, 0)])
            v_c = vals_np[sl] if pad == 0 else np.concatenate(
                [vals_np[sl], np.repeat(vals_np[sl][-1:], pad, 0)])
            m_c = mask_np[sl] if pad == 0 else np.concatenate(
                [mask_np[sl], np.repeat(mask_np[sl][-1:], pad, 0)])
            bshape = self._latent_shape(len(y_c), z_shape, image_hw)
            ck = jax.random.fold_in(key, s)
            x_init = jax.random.normal(ck, bshape, dtype=jnp.float32)
            args = dict(y=jnp.asarray(y_c), vals=jnp.asarray(v_c),
                        mask=jnp.asarray(m_c))
            if self._mesh is not None and len(y_c) % len(jax.devices()) == 0:
                put = shard_batch(
                    {"x": x_init, **args}, self._mesh
                )
                x_init, args = put["x"], {k: put[k] for k in args}
            out = run(self.unet_params, self.vae_params, x_init,
                      jax.random.fold_in(ck, 1), args["y"], args["vals"],
                      args["mask"])
            # Dispatch-ahead: keep the result on device and queue the next
            # chunk's scan immediately (JAX async dispatch). The device→host
            # fetch of chunk i then overlaps chunk i+1's compute — through
            # the axon tunnel (~21 MB/s) the fetch is ~0.45 s per 64-image
            # uint8 chunk, pure latency if serialized. Held per-chunk device
            # buffers are small (uint8 images or latents).
            # copy_to_host_async() starts each chunk's transfer the moment
            # its compute finishes instead of when np.asarray is reached —
            # without it the first fetches wait behind the whole dispatch
            # loop and only partially overlap (measured ~1.4 s residual on a
            # 5×64 steady-state run; ~3 unoverlapped fetches).
            if hasattr(out, "copy_to_host_async"):
                out.copy_to_host_async()
            chunks.append((out, n))
        result = np.concatenate(
            [np.asarray(out)[:n] for out, n in chunks], axis=0)
        if decode and to_pil:
            return to_pil_list(result)
        return result

    # ------------------------------------------------------------------
    def sample_latent(
        self,
        n: int,
        z_shape: Optional[Tuple[int, int, int]] = None,
        key: Optional[jax.Array] = None,
        to_pil: bool = True,
        decode: bool = True,
        image_hw: Tuple[int, int] = (224, 224),
    ):
        """Unconditional latent sampling (diff.py:87-125 parity)."""
        key = key if key is not None else jax.random.PRNGKey(0)
        shape = self._latent_shape(n, z_shape, image_hw)
        x_init = jax.random.normal(key, shape, dtype=jnp.float32)
        run = self._sampler(0.0, decode, snapshots=False)
        out = run(self.unet_params, self.vae_params, x_init,
                  jax.random.fold_in(key, 1),
                  jnp.zeros((n,), jnp.int32), None, None)
        out = np.asarray(out)
        if decode and to_pil:
            return to_pil_list(out)
        return out

    def sample_pixel(
        self,
        x_shape: Tuple[int, int, int, int] = (20, 80, 80, 3),
        key: Optional[jax.Array] = None,
        to_pil: bool = True,
    ):
        """Pixel-space sampling for a VAE-less model (diff.py:66-85 parity);
        ``x_shape`` is NHWC."""
        key = key if key is not None else jax.random.PRNGKey(0)
        x_init = jax.random.normal(key, x_shape, dtype=jnp.float32)
        run = self._sampler(0.0, False, snapshots=False)
        out = np.asarray(
            run(self.unet_params, None, x_init, jax.random.fold_in(key, 1),
                jnp.zeros((x_shape[0],), jnp.int32), None, None)
        )
        return to_pil_list(out) if to_pil else out

    def sample_cond(
        self,
        y,
        x_shape: Tuple[int, int, int, int],
        guidance_scale: float = 0.0,
        key: Optional[jax.Array] = None,
        to_pil: bool = False,
    ):
        """Class-conditional PIXEL-space sampling (``Diffuser.sample_cond``
        parity, diff.py:165-172): the same CFG reverse scan as the latent
        path, with no VAE decode. ``y`` is (B,) class ids (0 = null label);
        ``x_shape`` is NHWC with ``x_shape[0] == len(y)``. The reference
        returns the raw tensor, so ``to_pil`` defaults to False.

        Note: the reference's ``guidance_scale == 0 ∧ y ≠ None`` path crashes
        on an unbound ``eps`` (diff.py:146-156) — here scale 0 means "plain
        conditional eps", the documented fix (SURVEY.md §7).
        """
        y = np.asarray(y, dtype=np.int32)
        if y.shape[0] != x_shape[0]:
            raise ValueError(
                f"y has {y.shape[0]} labels for batch {x_shape[0]}"
            )
        key = key if key is not None else jax.random.PRNGKey(0)
        x_init = jax.random.normal(key, x_shape, dtype=jnp.float32)
        run = self._sampler(guidance_scale, False, snapshots=False)
        out = np.asarray(
            run(self.unet_params, None, x_init, jax.random.fold_in(key, 1),
                jnp.asarray(y), None, None)
        )
        return to_pil_list(out) if to_pil else out

    # ------------------------------------------------------------------
    def sample_latent_cond_with_steps(
        self,
        class_id: int,
        cond_vals: np.ndarray,
        cond_mask: np.ndarray,
        snapshot_ts: Sequence[int],
        z_shape: Optional[Tuple[int, int, int]] = None,
        guidance_scale: float = 3.0,
        key: Optional[jax.Array] = None,
        image_hw: Tuple[int, int] = (224, 224),
    ):
        """Reverse diffusion capturing x_t at the given (1-indexed) steps —
        the device-resident replacement for generate_steps.py's per-step host
        sync. Returns (final_latents, snapshots (S, B, h, w, c))."""
        key = key if key is not None else jax.random.PRNGKey(0)
        B = int(np.asarray(cond_vals).shape[0])
        shape = self._latent_shape(B, z_shape, image_hw)
        x_init = jax.random.normal(key, shape, dtype=jnp.float32)
        run = self._sampler(guidance_scale, False, snapshots=True)
        y = jnp.full((B,), int(class_id), jnp.int32)
        zf, snaps = run(
            self.unet_params, self.vae_params, x_init,
            jax.random.fold_in(key, 1), y, jnp.asarray(cond_vals),
            jnp.asarray(cond_mask),
            snapshot_ts=jnp.asarray(list(snapshot_ts), jnp.int32),
        )
        return np.asarray(zf), np.asarray(snaps)

    def decode_latents(self, z: np.ndarray) -> np.ndarray:
        """VAE decode helper (host-callable, jitted)."""
        if not hasattr(self, "_decode_jit"):
            self._decode_jit = jax.jit(
                lambda p, z: self.vae.apply({"params": p}, z,
                                            method=VAE.decode)
            )
        return np.asarray(self._decode_jit(self.vae_params, jnp.asarray(z)))


class CsvConditionSampler:
    """CSV → (cond_vals, cond_mask) → pipeline bridge
    (EntityCsvSampler parity, entityCsvSampler.py:9-199).

    ``base_wh`` fixes the drawing canvas; None infers it per CSV with
    snap-to-canonical-sizes (entityCsvSampler.py:167-190).
    """

    KEY_ORDER = G.KEY_ORDER

    def __init__(
        self,
        pipeline: DiffusionPipeline,
        class_id: int = 1,
        base_wh: Optional[Tuple[float, float]] = (400.0, 400.0),
        image_hw: Tuple[int, int] = (224, 224),
    ):
        self.pipeline = pipeline
        self.class_id = int(class_id)
        self.base_wh = base_wh
        self.image_hw = image_hw

    def set_class_id(self, class_id: int) -> None:
        self.class_id = int(class_id)

    def load_cond(
        self, csv_path: str, count: Optional[int] = None, start: int = 0
    ) -> Tuple[np.ndarray, np.ndarray]:
        import pandas as pd

        df = pd.read_csv(csv_path, header=None)
        rows = df.to_numpy(dtype=np.float32)
        vals, mask = G.conditions_from_csv_rows(
            rows, self.class_id, drawing_size=self.base_wh,
            image_size=(float(self.image_hw[0]), float(self.image_hw[1])),
            angle_mode="heuristic",  # sampler-side parity: _norm_angle_vec
        )
        end = len(vals) if count is None else min(start + count, len(vals))
        if start >= end:
            raise ValueError("empty selection — check start/count")
        return vals[start:end], mask[start:end]

    def sample(
        self,
        csv_path: str,
        count: Optional[int] = None,
        start: int = 0,
        guidance_scale: float = 3.0,
        key: Optional[jax.Array] = None,
        to_pil: bool = True,
        batch_size: int = 0,
        method: str = "ddpm",
        num_inference_steps: int = 0,
        cache_interval: int = 2,
        eta: float = 0.0,
        timestep_spacing: str = "linear",
    ):
        vals, mask = self.load_cond(csv_path, count, start)
        return self.pipeline.sample_latent_cond(
            class_counts=(self.class_id, len(vals)),
            cond=vals, cond_mask=mask, guidance_scale=guidance_scale,
            key=key, to_pil=to_pil, image_hw=self.image_hw,
            batch_size=batch_size, method=method,
            num_inference_steps=num_inference_steps, eta=eta,
            cache_interval=cache_interval,
            timestep_spacing=timestep_spacing,
        )

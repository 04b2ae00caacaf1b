"""CLI: progressive guided distillation of a trained stage-2 checkpoint.

Beyond-reference entry (the reference samples only with its 1000-step CFG
DDPM loop, /root/reference/diff.py:326-344): halve the sampler's step
count stage by stage while folding the CFG guidance weight into the
student's weights, down to single-digit model evaluations per image.

Sample the result with:
  generate-cond --unet_ckpt distilled_S8.msgpack --sampler ddim \
    --num_inference_steps 8 --timestep_spacing trailing \
    --prediction_type v --guidance_scale 0

(trailing grid + v-prediction + guidance OFF — all three are properties
the distillation baked in; docs/SAMPLERS.md "Distilled checkpoints".)
"""
from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from ..data import LabelDataset
from ..data.synthetic import generate_all_classes
from ..diffusion import DiffusionSchedule
from ..models import VAE, VAEConfig, CondUNet, UNetConfig
from ..train import progressive_distill
from ..train.checkpoints import load_params, save_params
from .train_vae import parse_items


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        description="Progressive guided distillation (fewer-step sampler)")
    ap.add_argument("--unet_ckpt", type=str, required=True,
                    help="trained stage-2 teacher (trained_para*.msgpack)")
    ap.add_argument("--vae_ckpt", type=str, required=True)
    ap.add_argument("--teacher_prediction_type", choices=["epsilon", "v"],
                    default=None,
                    help="default = the teacher checkpoint's .arch.json "
                         "sidecar record, falling back to epsilon")
    ap.add_argument("--guidance", type=float, default=3.0,
                    help="CFG weight folded into the stage-0 ε-space "
                         "student (Meng et al. Alg. 1 stage one)")
    ap.add_argument("--start_steps", type=int, default=256)
    ap.add_argument("--min_steps", type=int, default=8)
    ap.add_argument("--steps_per_stage", type=int, default=2000)
    ap.add_argument("--fold_steps", type=int, default=0,
                    help="guidance-fold stage length (0 = steps_per_stage)")
    ap.add_argument("--x0_clip", type=float, default=4.0,
                    help="clip the halving stages' implied-x0 target to "
                         "±this (0 disables; real latents span |z0|≲2)")
    ap.add_argument("--batch_size", type=int, default=128)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--num_timesteps", type=int, default=0,
                    help="0 = from teacher checkpoint sidecar, else 1000")
    ap.add_argument("--schedule", choices=["linear", "cosine"], default=None,
                    help="teacher's beta schedule; default = the teacher "
                         "checkpoint's .arch.json sidecar, else linear")
    ap.add_argument("--z_channels", type=int, default=4)
    ap.add_argument("--geom_dim", type=int, default=12)
    ap.add_argument("--base_ch", type=int, default=64)
    ap.add_argument("--time_dim", type=int, default=256)
    ap.add_argument("--vae_base_channels", type=int, default=64)
    ap.add_argument("--image_size", type=int, nargs=2, default=(224, 224))
    ap.add_argument("--items", action="append", default=None,
                    help="train data: csv,image_dir,class_id (repeatable)")
    ap.add_argument("--synthetic_root", type=str, default="./data")
    ap.add_argument("--synthetic_count", type=int, default=1024)
    ap.add_argument("--out_dir", type=str, default="./model_para")
    ap.add_argument("--no_bf16", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--fresh", action="store_true",
                    help="ignore completed distilled_S*.msgpack stage "
                         "artifacts in --out_dir (default: resume the "
                         "halving schedule after the deepest one)")
    ap.add_argument("--no_preencode", action="store_true",
                    help="keep uint8 images device-resident and run the "
                         "frozen VAE encoder inside every distill step "
                         "(the pre-round-4 behavior) instead of "
                         "pre-encoding posterior moments once")
    ap.add_argument("--encode_chunk", type=int, default=256)
    ap.add_argument("--rss_limit_gb", type=float, default=100.0)
    ap.add_argument("--log_rss_every", type=int, default=250)
    return ap


def main(argv=None) -> None:
    import jax.numpy as jnp

    args = build_parser().parse_args(argv)
    dt = jnp.float32 if args.no_bf16 else jnp.bfloat16

    vae = VAE(VAEConfig(base_channels=args.vae_base_channels, dtype=dt))
    unet = CondUNet(UNetConfig(
        in_ch=args.z_channels, time_dim=args.time_dim, num_classes=3,
        geom_dim=args.geom_dim, with_geom_head=True, base_ch=args.base_ch,
        dtype=dt,
    ))
    rng = jax.random.PRNGKey(args.seed)
    z = jnp.zeros((1, args.image_size[0] // 8, args.image_size[1] // 8,
                   args.z_channels))
    t0 = jnp.ones((1,), jnp.int32)
    y0 = jnp.zeros((1,), jnp.int32)
    g0 = jnp.zeros((1, args.geom_dim))
    teacher_params = load_params(
        args.unet_ckpt, unet.init(rng, z, t0, y0, g0, g0)["params"])
    vae_params = load_params(
        args.vae_ckpt,
        vae.init({"params": rng, "sample": rng},
                 jnp.zeros((1,) + tuple(args.image_size) + (3,)))["params"])

    items = parse_items(args.items)
    if not items:
        dirs = generate_all_classes(
            args.synthetic_root, args.synthetic_count,
            image_size=tuple(args.image_size), seed=args.seed)
        items = [(f"{d}/{d.rsplit('/', 1)[-1]}.csv", d, cls)
                 for cls, d in dirs.items()]
    ds = LabelDataset(items, image_size=tuple(args.image_size))
    data_np = ds.materialize()
    if args.no_preencode:
        data = {k: jax.device_put(v) for k, v in data_np.items()}
        distill_vae, distill_vae_params = vae, vae_params
    else:
        # Pre-encode the frozen VAE's posterior moments ONCE (the encoder
        # output is a pure function of the image; only the per-step eps
        # draw varies — that draw moves inside the distill step). This
        # drops the N×224×224×3 uint8 tensor AND the whole encoder from
        # the per-step program: smaller compile, no per-step encode
        # FLOPs, and ~12× less device-resident data (two (N,28,28,4) f32
        # moment tensors). Chunks are padded to a fixed size so ONE
        # compiled encode serves the whole pass.
        import time as _time
        t0 = _time.time()
        enc = jax.jit(lambda p, x: vae.apply(
            {"params": p}, x, method=VAE.encode_stats))
        vp = jax.device_put(vae_params)
        imgs = data_np.pop("image_u8")
        n_img, c = imgs.shape[0], max(1, args.encode_chunk)
        sf = vae.config.scale_factor
        mus, stds = [], []
        for i0 in range(0, n_img, c):
            chunk = imgs[i0:i0 + c].astype(np.float32) / 255.0
            real = chunk.shape[0]
            if real < c:
                chunk = np.concatenate(
                    [chunk, np.zeros((c - real,) + chunk.shape[1:],
                                     np.float32)])
            mu, logvar = enc(vp, chunk)
            mus.append(np.asarray(mu[:real], np.float32) * sf)
            stds.append(np.exp(0.5 * np.asarray(logvar[:real],
                                                np.float32)) * sf)
        del imgs
        data = {
            "z_mu": jax.device_put(np.concatenate(mus)),
            "z_std": jax.device_put(np.concatenate(stds)),
            "y": jax.device_put(data_np["y"]),
            "vals": jax.device_put(data_np["vals"]),
            "mask": jax.device_put(data_np["mask"]),
        }
        del mus, stds
        distill_vae, distill_vae_params = None, None
        print(f"pre-encoded {n_img} latents in {_time.time() - t0:.1f}s",
              flush=True)
    print(f"distilling on {len(ds)} images; "
          f"stages {args.start_steps} -> {args.min_steps} "
          f"({args.steps_per_stage} steps each, guidance {args.guidance})",
          flush=True)

    # flag > teacher's .arch.json sidecar > reference defaults (a teacher
    # trained on cosine betas must be distilled on the same ᾱ table)
    from .generate_cond import _arch_sidecar
    ua = _arch_sidecar(args.unet_ckpt)
    schedule_kind = args.schedule or ua.get("schedule_kind", "linear")
    schedule = DiffusionSchedule.create(
        args.num_timesteps or ua.get("num_timesteps", 1000),
        kind=schedule_kind)
    os.makedirs(args.out_dir, exist_ok=True)

    def write_sidecar(ckpt_path, prediction_type, steps=None):
        """Every distilled checkpoint gets the same ``.arch.json`` sidecar
        the trainers write (train_latent.py::_write_arch_sidecars), so the
        inference CLIs auto-apply the correct parameterization. Critical
        here: the halving stages emit v-prediction students that MUST be
        sampled with a trailing grid and guidance already folded in —
        without the sidecar a consumer defaults to epsilon and silently
        generates garbage (ADVICE r4 #1)."""
        import json as _json

        meta = {
            "kind": "unet",
            "in_ch": args.z_channels,
            "time_dim": args.time_dim,
            "num_classes": 3,
            "geom_dim": args.geom_dim,
            "with_geom_head": True,
            "base_ch": args.base_ch,
            "schedule_kind": schedule_kind,
            "num_timesteps": schedule.num_timesteps,
            "prediction_type": prediction_type,
            # guidance was folded into the weights during the fold stage;
            # sample with CFG OFF and the trailing step grid
            "guidance_scale": 0.0 if prediction_type == "v" else None,
            "timestep_spacing": "trailing" if prediction_type == "v"
            else None,
        }
        if steps is not None:
            meta["distilled_steps"] = steps
        meta = {k: v for k, v in meta.items() if v is not None}
        with open(ckpt_path + ".arch.json", "w") as f:
            _json.dump(meta, f, indent=2)

    def on_stage(S, params, log):
        base = "distilled_fold" if S == 0 else f"distilled_S{S}"
        name = (f"{base}_partial{log['partial']}.msgpack"
                if "partial" in log else f"{base}.msgpack")
        path = os.path.join(args.out_dir, name)
        save_params(path, params)
        # fold-stage output is still an ε-model (guidance folded, steps not
        # yet reduced); every halving-stage output is a v-model
        write_sidecar(path, "epsilon" if S == 0 else "v",
                      steps=None if S == 0 else S)
        tail = [round(x, 5) for x in log["losses"][-3:]]
        print(f"[stage S={S}] loss tail {tail} -> {path}", flush=True)

    # Stage resume: a completed stage's checkpoint IS the next stage's
    # teacher (the fold stage yields an ε-model with guidance folded in;
    # halving stages yield v-models), so a killed run restarts at the
    # first un-checkpointed stage instead of paying the whole schedule.
    start_steps = args.start_steps
    guidance = args.guidance
    teacher_ptype = (args.teacher_prediction_type
                     or ua.get("prediction_type", "epsilon"))
    if not args.fresh:
        s, deepest = args.start_steps, None
        while s >= args.min_steps:
            if os.path.exists(os.path.join(args.out_dir,
                                           f"distilled_S{s}.msgpack")):
                deepest = s
            s //= 2
        fold_path = os.path.join(args.out_dir, "distilled_fold.msgpack")
        if deepest is not None:
            path = os.path.join(args.out_dir, f"distilled_S{deepest}.msgpack")
            teacher_params = load_params(path, teacher_params)
            print(f"resuming after completed stage S={deepest} ({path})",
                  flush=True)
            if deepest == args.min_steps:
                final_path = os.path.join(args.out_dir,
                                          "distilled_final.msgpack")
                save_params(final_path, teacher_params)
                write_sidecar(final_path, "v", steps=args.min_steps)
                print("[OK] all stages already complete; final re-saved")
                return
            start_steps = deepest // 2
            guidance = 0.0       # folded during the completed fold stage
            teacher_ptype = "v"  # halving-stage outputs are v-models
        elif guidance > 0.0 and os.path.exists(fold_path):
            teacher_params = load_params(fold_path, teacher_params)
            print(f"resuming after completed fold stage ({fold_path})",
                  flush=True)
            guidance = 0.0
            teacher_ptype = "epsilon"  # the folded student is an ε-model

    final, logs = progressive_distill(
        unet, teacher_params, distill_vae, distill_vae_params, schedule,
        data,
        start_steps=start_steps, min_steps=args.min_steps,
        steps_per_stage=args.steps_per_stage, batch_size=args.batch_size,
        lr=args.lr, guidance_w=guidance,
        teacher_prediction_type=teacher_ptype,
        seed=args.seed, on_stage_done=on_stage,
        rss_limit_gb=args.rss_limit_gb,
        log_rss_every=args.log_rss_every,
        fold_steps=args.fold_steps or None,
        x0_clip=args.x0_clip,
    )
    path = os.path.join(args.out_dir, "distilled_final.msgpack")
    save_params(path, final)
    write_sidecar(path, "v", steps=args.min_steps)
    print(f"[OK] distilled checkpoint: {path} "
          f"(sample: --sampler ddim --num_inference_steps "
          f"{args.min_steps} --timestep_spacing trailing "
          f"--prediction_type v --guidance_scale 0)")


if __name__ == "__main__":
    main()

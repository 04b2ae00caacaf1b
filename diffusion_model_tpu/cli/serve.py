"""CLI: inference server — keep the pipeline warm and serve generation over
HTTP (stdlib only; no reference counterpart — the production-serving entry
the single-shot reference scripts lack).

Endpoints:
  GET  /healthz              → {"status": "ok", "backend": ...}
  POST /generate             → JSON body:
       {"class_id": 1|2|3, "count": N (≤ max_batch),
        "cond": {key: val, ...} | [[12 floats] ...] | null,
        "guidance_scale": float = 3.0,
        "sampler": "ddpm" | "ddim" | "dpmpp" | "ddim_parallel" | "ddpm_cached",
        "num_inference_steps": int, "cache_interval": int (ddpm_cached encoder cadence, default 2),
        "timestep_spacing": "linear" | "karras" (ddim/dpmpp step grid),
        "seed": int}
     response: {"images": [<base64 PNG>, ...], "elapsed_s": ...}

The first request per (batch, sampler, guidance) combination compiles; the
server optionally pre-warms the default shape at startup (--warm).
"""
from __future__ import annotations

import argparse
import base64
import io
import json
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import jax
import numpy as np


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description="diffusion inference server")
    ap.add_argument("--unet_ckpt", type=str, required=True)
    ap.add_argument("--vae_ckpt", type=str, required=True)
    ap.add_argument("--host", type=str, default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8500)
    ap.add_argument("--num_timesteps", type=int, default=1000)
    ap.add_argument("--max_batch", type=int, default=64)
    ap.add_argument("--base_ch", type=int, default=64)
    ap.add_argument("--time_dim", type=int, default=256)
    ap.add_argument("--z_channels", type=int, default=4)
    ap.add_argument("--vae_base_channels", type=int, default=64)
    ap.add_argument("--geom_dim", type=int, default=12)
    ap.add_argument("--image_size", type=int, nargs=2, default=(224, 224))
    ap.add_argument("--no_bf16", action="store_true")
    ap.add_argument("--prediction_type", choices=["epsilon", "v"],
                    default="epsilon",
                    help="what the checkpoint predicts (match training)")
    ap.add_argument("--warm", action="store_true",
                    help="compile the default DDPM shape at startup")
    ap.add_argument("--default_sampler",
                    choices=["ddpm", "ddim", "dpmpp", "ddim_parallel",
                             "ddpm_cached"],
                    default="ddpm")
    return ap


def make_handler(pipeline, image_hw, max_batch, default_sampler):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, fmt, *args):  # quiet the default stderr spam
            pass

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, {"status": "ok",
                                 "backend": jax.default_backend(),
                                 "max_batch": max_batch})
            else:
                self._send(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/generate":
                self._send(404, {"error": "unknown path"})
                return
            try:
                n = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(n) or b"{}")
                class_id = int(req.get("class_id", 1))
                if class_id not in (1, 2, 3):
                    raise ValueError("class_id must be 1, 2 or 3")
                count = int(req.get("count", 1))
                if not 1 <= count <= max_batch:
                    raise ValueError(f"count must be in [1, {max_batch}]")
                cond = req.get("cond")
                if isinstance(cond, list):
                    cond = np.asarray(cond, np.float32)
                elif isinstance(cond, dict):
                    cond = {class_id: cond}
                sampler = req.get("sampler", default_sampler)
                if sampler not in ("ddpm", "ddim", "dpmpp", "ddim_parallel",
                                   "ddpm_cached"):
                    raise ValueError(
                        "sampler must be 'ddpm', 'ddim', 'dpmpp', "
                        "'ddim_parallel' or 'ddpm_cached'")
                spacing = str(req.get("timestep_spacing", "linear"))
                if spacing not in ("linear", "karras"):
                    # reject before the jit trace so the client gets a 400,
                    # not a mid-compile server error
                    raise ValueError(
                        "timestep_spacing must be 'linear' or 'karras'")
                tic = time.time()
                # Static-shape bucketing: every request runs the warmed
                # max_batch program (short requests padded, padding
                # discarded) — one compilation serves all counts instead
                # of one multi-minute compile per distinct count.
                images = pipeline.sample_latent_cond(
                    (class_id, count),
                    cond=cond,
                    guidance_scale=float(req.get("guidance_scale", 3.0)),
                    key=jax.random.PRNGKey(int(req.get("seed", 0))),
                    image_hw=image_hw,
                    method=sampler,
                    num_inference_steps=int(
                        req.get("num_inference_steps", 50)),
                    cache_interval=int(req.get("cache_interval", 2)),
                    timestep_spacing=spacing,
                    batch_size=max_batch,
                    remainder="pad",
                )
                out = []
                for img in images:
                    buf = io.BytesIO()
                    img.save(buf, format="PNG")
                    out.append(base64.b64encode(buf.getvalue()).decode())
                self._send(200, {"images": out,
                                 "elapsed_s": round(time.time() - tic, 3)})
            except (ValueError, KeyError, json.JSONDecodeError) as e:
                self._send(400, {"error": str(e)})
            except Exception as e:  # pragma: no cover
                self._send(500, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    from .generate_cond import build_pipeline_from_args

    pipeline = build_pipeline_from_args(args)
    image_hw = tuple(args.image_size)
    if args.warm:
        print("warming default shape (compiles the sampler) ...")
        pipeline.sample_latent_cond(
            (1, args.max_batch), image_hw=image_hw,
            method=args.default_sampler, to_pil=False,
            num_inference_steps=50, cache_interval=2,
        )
    server = ThreadingHTTPServer(
        (args.host, args.port),
        make_handler(pipeline, image_hw, args.max_batch,
                     args.default_sampler),
    )
    print(f"serving on http://{args.host}:{args.port} "
          f"(backend={jax.default_backend()})")
    server.serve_forever()


if __name__ == "__main__":
    main()

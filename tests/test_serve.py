"""Inference server: spin up on a tiny model, drive /healthz and /generate
over real HTTP, probe malformed requests."""
import base64
import io
import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from diffusion_model_tpu.diffusion import DiffusionSchedule
from diffusion_model_tpu.models import VAE, VAEConfig, CondUNet, UNetConfig
from diffusion_model_tpu.pipeline import DiffusionPipeline
from diffusion_model_tpu.cli.serve import make_handler


@pytest.fixture(scope="module")
def server():
    rng = jax.random.PRNGKey(0)
    vae = VAE(VAEConfig(base_channels=8))
    unet = CondUNet(UNetConfig(in_ch=4, time_dim=32, num_classes=3,
                               with_geom_head=True, base_ch=8,
                               remove_deep_conv=True))
    vae_params = vae.init({"params": rng, "sample": rng},
                          jnp.zeros((1, 32, 32, 3)))["params"]
    z = jnp.zeros((1, 4, 4, 4))
    unet_params = unet.init(
        rng, z, jnp.ones((1,), jnp.int32), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 12)), jnp.zeros((1, 12)))["params"]
    pipe = DiffusionPipeline(
        unet=unet, unet_params=unet_params, vae=vae, vae_params=vae_params,
        schedule=DiffusionSchedule.create(4), use_data_parallel=False,
    )
    srv = ThreadingHTTPServer(
        ("127.0.0.1", 0), make_handler(pipe, (32, 32), 4, "ddpm"))
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _post(url, payload):
    req = urllib.request.Request(
        url + "/generate", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_healthz(server):
    with urllib.request.urlopen(server + "/healthz") as r:
        body = json.loads(r.read())
    assert r.status == 200 and body["status"] == "ok"


def test_generate_roundtrip(server):
    code, body = _post(server, {
        "class_id": 2, "count": 2,
        "cond": {"cx": 0.5, "cy": 0.5, "cr": 0.2},
        "guidance_scale": 2.0, "seed": 7,
    })
    assert code == 200
    assert len(body["images"]) == 2
    img = Image.open(io.BytesIO(base64.b64decode(body["images"][0])))
    assert img.size == (32, 32)
    assert body["elapsed_s"] >= 0


def test_generate_ddim(server):
    code, body = _post(server, {"class_id": 1, "count": 1,
                                "sampler": "ddim",
                                "num_inference_steps": 2})
    assert code == 200 and len(body["images"]) == 1


def test_generate_ddim_parallel(server):
    """Time-parallel sampler through the serving surface: the Picard
    window batch shards over whatever mesh the pipeline holds."""
    code, body = _post(server, {"class_id": 3, "count": 1,
                                "sampler": "ddim_parallel",
                                "num_inference_steps": 3})
    assert code == 200 and len(body["images"]) == 1


def test_generate_ddpm_cached(server):
    """Encoder-cached DDPM through the serving surface; cache_interval is
    its own request field (a stray num_inference_steps must NOT become
    the encoder cadence — review finding)."""
    code, body = _post(server, {"class_id": 2, "count": 1,
                                "sampler": "ddpm_cached",
                                "cache_interval": 2,
                                "num_inference_steps": 50})
    assert code == 200 and len(body["images"]) == 1


def test_generate_rejects_bad_requests(server):
    code, body = _post(server, {"class_id": 9})
    assert code == 400 and "class_id" in body["error"]
    code, body = _post(server, {"class_id": 1, "count": 999})
    assert code == 400 and "count" in body["error"]
    code, body = _post(server, {"class_id": 1, "sampler": "magic"})
    assert code == 400 and "sampler" in body["error"]
    # unknown path
    req = urllib.request.Request(server + "/nope", data=b"{}")
    try:
        urllib.request.urlopen(req)
        assert False
    except urllib.error.HTTPError as e:
        assert e.code == 404


def test_serve_parser():
    from diffusion_model_tpu.cli.serve import build_parser

    a = build_parser().parse_args(["--unet_ckpt", "u", "--vae_ckpt", "v",
                                   "--port", "9000", "--warm"])
    assert a.port == 9000 and a.warm


@pytest.fixture(scope="module")
def batch_server():
    """Same tiny model, dynamic batching on (500 ms window)."""
    from diffusion_model_tpu.cli.serve import DynamicBatcher

    rng = jax.random.PRNGKey(1)
    vae = VAE(VAEConfig(base_channels=8))
    unet = CondUNet(UNetConfig(in_ch=4, time_dim=32, num_classes=3,
                               with_geom_head=True, base_ch=8,
                               remove_deep_conv=True))
    vae_params = vae.init({"params": rng, "sample": rng},
                          jnp.zeros((1, 32, 32, 3)))["params"]
    z = jnp.zeros((1, 4, 4, 4))
    unet_params = unet.init(
        rng, z, jnp.ones((1,), jnp.int32), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 12)), jnp.zeros((1, 12)))["params"]
    pipe = DiffusionPipeline(
        unet=unet, unet_params=unet_params, vae=vae, vae_params=vae_params,
        schedule=DiffusionSchedule.create(4), use_data_parallel=False,
    )
    # a v-prediction pipe so the distilled preset is servable (HTTP
    # semantics only — the tiny random weights never see a quality check)
    pipe.prediction_type = "v"
    batcher = DynamicBatcher(pipe, (32, 32), 4, 0.5)
    srv = ThreadingHTTPServer(
        ("127.0.0.1", 0),
        make_handler(pipe, (32, 32), 4, "ddpm", batcher=batcher,
                     distilled_preset={"steps": 2}))
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_dynamic_batching_coalesces_concurrent_requests(batch_server):
    """Two same-signature requests of different classes fired together
    must run as ONE device launch (batched_requests == 2) and each get
    its own image count back."""
    results = {}

    def fire(name, payload):
        results[name] = _post(batch_server, payload)

    t1 = threading.Thread(target=fire, args=("a", {
        "class_id": 1, "count": 2, "seed": 1}))
    t2 = threading.Thread(target=fire, args=("b", {
        "class_id": 2, "count": 2, "seed": 2,
        "cond": {"cx": 0.5, "cy": 0.5, "cr": 0.2}}))
    t1.start(); t2.start(); t1.join(); t2.join()

    for name, want_count in (("a", 2), ("b", 2)):
        code, body = results[name]
        assert code == 200, body
        assert len(body["images"]) == want_count
        assert body["batched_requests"] == 2, (name, body["batched_requests"])


def test_distilled_preset(batch_server, server):
    """VERDICT r4 next #9: 'distilled' expands to the certified preset
    (DDIM, sidecar step count, trailing, guidance 0) on a v-checkpoint
    server, and is a client-attributable 400 on an ε-checkpoint server."""
    code, body = _post(batch_server, {"class_id": 1, "count": 1,
                                      "sampler": "distilled", "seed": 3})
    assert code == 200 and len(body["images"]) == 1
    # the plain `server` fixture loaded an ε-model (distilled_preset=None)
    code, body = _post(server, {"class_id": 1, "count": 1,
                                "sampler": "distilled"})
    assert code == 400 and "distilled" in body["error"]


def test_dynamic_batching_solo_and_errors(batch_server):
    """A lone request still works (batched_requests == 1); client errors
    surface as 400 from the HTTP thread, not a wedged future."""
    code, body = _post(batch_server, {"class_id": 3, "count": 1})
    assert code == 200 and body["batched_requests"] == 1
    code, body = _post(batch_server, {"class_id": 9})
    assert code == 400
    # bad cond shape is caught at submit time in the HTTP thread
    code, body = _post(batch_server, {"class_id": 1, "count": 1,
                                      "cond": [[1.0, 2.0]]})
    assert code == 400


def _make_tiny_pipe(seed=2):
    rng = jax.random.PRNGKey(seed)
    vae = VAE(VAEConfig(base_channels=8))
    unet = CondUNet(UNetConfig(in_ch=4, time_dim=32, num_classes=3,
                               with_geom_head=True, base_ch=8,
                               remove_deep_conv=True))
    vae_params = vae.init({"params": rng, "sample": rng},
                          jnp.zeros((1, 32, 32, 3)))["params"]
    z = jnp.zeros((1, 4, 4, 4))
    unet_params = unet.init(
        rng, z, jnp.ones((1,), jnp.int32), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 12)), jnp.zeros((1, 12)))["params"]
    return DiffusionPipeline(
        unet=unet, unet_params=unet_params, vae=vae, vae_params=vae_params,
        schedule=DiffusionSchedule.create(4), use_data_parallel=False,
    )


def _serve(handler):
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, f"http://127.0.0.1:{srv.server_address[1]}"


def test_overflow_returns_429():
    """Admission bound: with max_pending=1 row, a second concurrent
    request (or any multi-row request) must get 429, not queue forever."""
    from diffusion_model_tpu.cli.serve import make_handler

    pipe = _make_tiny_pipe()
    srv, url = _serve(make_handler(pipe, (32, 32), 4, "ddpm",
                                   max_pending=1))
    try:
        # a 2-row request alone exceeds the 1-row bound -> immediate 429
        code, body = _post(url, {"class_id": 1, "count": 2})
        assert code == 429 and "capacity" in body["error"]
        # a 1-row request fits
        code, body = _post(url, {"class_id": 1, "count": 1})
        assert code == 200 and len(body["images"]) == 1
    finally:
        srv.shutdown()


def test_timeout_returns_504():
    """Per-request deadline: a deliberately blocked device lane must
    surface as 504, not an indefinitely hung HTTP thread."""
    from diffusion_model_tpu.cli.serve import make_handler

    pipe = _make_tiny_pipe()
    srv, url = _serve(make_handler(pipe, (32, 32), 4, "ddpm",
                                   request_timeout_s=0.5))
    try:
        # make the device call slower than the 0.5 s deadline
        orig = pipe.sample_latent_cond
        ev = threading.Event()

        def slow(*a, **k):
            ev.wait(2.0)
            return orig(*a, **k)

        pipe.sample_latent_cond = slow
        code, body = _post(url, {"class_id": 1, "count": 1})
        assert code == 504 and "deadline" in body["error"]
        ev.set()
        pipe.sample_latent_cond = orig
    finally:
        srv.shutdown()


def test_metrics_endpoint(batch_server):
    """/metrics must expose counters, coalescing stats, and the compiled-
    program cache keys; numbers must move with traffic."""
    code, body = _post(batch_server, {"class_id": 1, "count": 1})
    assert code == 200
    with urllib.request.urlopen(batch_server + "/metrics") as r:
        m = json.loads(r.read())
    assert r.status == 200
    assert m["requests_total"] >= 1
    assert m["responses"]["2xx"] >= 1
    assert m["launches"] >= 1
    assert m["batched_rows"] >= 1
    assert m["mean_rows_per_launch"] >= 1
    assert m["dynamic_batching"] is True
    assert isinstance(m["compiled_programs"], list)
    assert len(m["compiled_programs"]) >= 1  # ddpm program is warm


def test_load_eight_concurrent_mixed_sampler_clients(batch_server):
    """VERDICT r3 #8 load test: 8 concurrent clients with mixed samplers /
    signatures; every request must complete 200 with the right image count
    (batching groups same-signature ones, never mixes)."""
    payloads = [
        {"class_id": 1, "count": 1, "seed": 11},
        {"class_id": 2, "count": 2, "seed": 12},
        {"class_id": 3, "count": 1, "seed": 13},
        {"class_id": 1, "count": 1, "sampler": "ddim",
         "num_inference_steps": 2, "seed": 14},
        {"class_id": 2, "count": 1, "sampler": "ddim",
         "num_inference_steps": 2, "seed": 15},
        {"class_id": 3, "count": 1, "sampler": "dpmpp",
         "num_inference_steps": 2, "seed": 16},
        {"class_id": 1, "count": 2, "sampler": "ddpm_cached",
         "cache_interval": 2, "seed": 17},
        {"class_id": 2, "count": 1, "sampler": "distilled", "seed": 18},
    ]
    results = [None] * len(payloads)

    def fire(i):
        results[i] = _post(batch_server, payloads[i])

    threads = [threading.Thread(target=fire, args=(i,))
               for i in range(len(payloads))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for i, (code, body) in enumerate(results):
        assert code == 200, (i, body)
        assert len(body["images"]) == payloads[i]["count"], i


def test_dynamic_batching_different_signatures_do_not_merge(batch_server):
    """Different guidance scales are different compiled programs; firing
    them together must NOT put them in one launch."""
    results = {}

    def fire(name, payload):
        results[name] = _post(batch_server, payload)

    t1 = threading.Thread(target=fire, args=("g2", {
        "class_id": 1, "count": 1, "guidance_scale": 2.0}))
    t2 = threading.Thread(target=fire, args=("g3", {
        "class_id": 1, "count": 1, "guidance_scale": 3.0}))
    t1.start(); t2.start(); t1.join(); t2.join()

    for name in ("g2", "g3"):
        code, body = results[name]
        assert code == 200, body
        assert body["batched_requests"] == 1, (name, body)

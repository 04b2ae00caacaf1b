"""Worker for the true multi-process (multi-host) test.

Run as: ``python tests/_mp_worker.py <coordinator_port> <process_id> <nproc>``

Each process owns 4 virtual CPU devices; ``jax.distributed.initialize``
joins them into one 8-device SPMD world (the CPU stand-in for a 2-host TPU
pod slice, SURVEY.md §4 test strategy). The worker then runs ONE full
latent-cond DP train step over the global mesh:

- params/state: replicated global arrays built with
  ``jax.make_array_from_callback`` (every process holds the same host
  value — same seed — so replication is sound);
- batch: each process contributes its LOCAL half via
  ``jax.make_array_from_process_local_data`` (the production multi-host
  input path — no host ever materializes the global batch);
- the jitted step runs collectives over the global mesh; the scalar loss
  comes back fully replicated and must match on both processes.

Prints ``MP_OK <loss>`` on success; the parent test asserts both workers
print the same finite loss.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
port, pid, nproc = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = ("--xla_force_host_platform_device_count=4 "
                           "--xla_backend_optimization_level=0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nproc, process_id=pid)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from diffusion_model_tpu.config import LatentTrainConfig  # noqa: E402
from diffusion_model_tpu.diffusion import DiffusionSchedule  # noqa: E402
from diffusion_model_tpu.models import (  # noqa: E402
    VAE, VAEConfig, CondUNet, UNetConfig,
)
from diffusion_model_tpu.parallel import make_mesh  # noqa: E402
from diffusion_model_tpu.train import make_latent_train_step  # noqa: E402
from diffusion_model_tpu.train.train_latent import (  # noqa: E402
    create_latent_state,
)

assert jax.process_count() == nproc, jax.process_count()
assert jax.device_count() == 4 * nproc, jax.device_count()
assert jax.local_device_count() == 4

mesh = make_mesh(("data",))  # global mesh over all 8 devices, both hosts


def replicate_global(tree):
    """Host value -> fully-replicated global array (same value on every
    process by construction: identical seeds)."""
    sh = NamedSharding(mesh, P())

    def one(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])

    return jax.tree_util.tree_map(one, tree)


cfg = LatentTrainConfig(base_ch=8, time_dim=32, vae_base_channels=8,
                        bf16=False, num_timesteps=8)
rng = jax.random.PRNGKey(0)
vae = VAE(VAEConfig(base_channels=8))
unet = CondUNet(UNetConfig(in_ch=4, time_dim=32, num_classes=3,
                           with_geom_head=True, base_ch=8,
                           remove_deep_conv=True))
vae_params = replicate_global(
    vae.init({"params": rng, "sample": rng},
             jnp.zeros((1, 32, 32, 3)))["params"])
state = create_latent_state(rng, cfg, unet, (4, 4))
state = state.replace(
    params=replicate_global(state.params),
    opt_state=jax.tree_util.tree_map(
        lambda x: replicate_global(x) if hasattr(x, "shape") else x,
        state.opt_state),
)

# global batch: 16 rows, each process materializes only ITS 8 (the
# multi-host input path — per-host data loading, no global gather)
GB = 16
local = slice(pid * (GB // nproc), (pid + 1) * (GB // nproc))
host_rng = np.random.default_rng(0)  # same stream; slice per process
image = host_rng.uniform(size=(GB, 32, 32, 3)).astype(np.float32)
y = np.tile(np.array([1, 2], np.int32), GB // 2)
bsh = NamedSharding(mesh, P("data"))
batch = {
    "image": jax.make_array_from_process_local_data(bsh, image[local]),
    "vals": jax.make_array_from_process_local_data(
        bsh, np.zeros((GB // nproc, 12), np.float32)),
    "mask": jax.make_array_from_process_local_data(
        bsh, np.ones((GB // nproc, 12), np.float32)),
    "y": jax.make_array_from_process_local_data(bsh, y[local]),
}

step = make_latent_train_step(unet, vae, DiffusionSchedule.create(8),
                              0.1, 0.1)
# the PRNG key must be a global (replicated) array too — a process-local
# committed array can't feed a computation spanning both processes
rng = replicate_global(rng)
state, m = step(state, vae_params, batch, rng)
loss = float(m["loss"])
assert np.isfinite(loss), loss
# second step: donation + resharded state across processes
state, m2 = step(state, vae_params, batch, jax.random.fold_in(rng, 1))
loss2 = float(m2["loss"])
assert np.isfinite(loss2), loss2

# DP-sharded INFERENCE across both hosts (VERDICT r4 next #7 — the
# training-only coverage gap): the distilled serving shape (DDIM-8 on the
# trailing grid, guidance 0; quality_r2/distill8*_cert.json flags) with
# the request batch sharded over the global 'data' axis — one row per
# device, each process feeding only its local half, exactly like a
# 2-host serving fan-out.
from functools import partial  # noqa: E402

from diffusion_model_tpu.diffusion import sample_loop_ddim  # noqa: E402

def eps_fn(z, t, yv, cv, cm):
    out = unet.apply({"params": state.params}, z, t, yv, cv, cm)
    return out[0] if isinstance(out, tuple) else out

loc = 4  # rows per process (one per local device)
bsh4 = NamedSharding(mesh, P("data"))
x0 = jax.make_array_from_process_local_data(
    bsh4, np.random.default_rng(10 + pid).normal(
        size=(loc, 4, 4, 4)).astype(np.float32))
y_inf = jax.make_array_from_process_local_data(
    bsh4, np.ones((loc,), np.int32))
cv = jax.make_array_from_process_local_data(
    bsh4, np.zeros((loc, 12), np.float32))
cm = jax.make_array_from_process_local_data(
    bsh4, np.ones((loc, 12), np.float32))
samp = jax.jit(partial(sample_loop_ddim, DiffusionSchedule.create(8),
                       eps_fn, num_inference_steps=8, guidance_scale=0.0,
                       timestep_spacing="trailing"))
xs = samp(x0, jax.random.fold_in(rng, 2), y=y_inf,
          cond_vals=cv, cond_mask=cm)
for s in xs.addressable_shards:
    assert np.isfinite(np.asarray(s.data)).all(), "non-finite sample shard"
print("MP_INFER_OK", flush=True)
print(f"MP_OK {loss:.6f} {loss2:.6f}", flush=True)

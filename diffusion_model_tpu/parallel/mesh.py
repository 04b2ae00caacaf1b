"""Device mesh construction and sharding rules.

The reference has no parallelism at all (SURVEY.md §2: single
``"cuda" if available else "cpu"`` device). Here parallelism is first-class
and TPU-native: a ``jax.sharding.Mesh`` over all chips, ``NamedSharding``
annotations, and XLA-inserted collectives over ICI (the "NCCL" of this stack
— no custom comms layer):

- **DP** (``data`` axis): batches sharded on the leading axis; gradient
  all-reduce happens inside the jitted train step.
- **TP** (``model`` axis): optional; large kernels shard their output-feature
  dim, biases/embeddings follow, XLA inserts the matching all-gathers /
  reduce-scatters. The U-Net here is ~30M params so TP is about headroom
  (and exercising the path), not necessity — see SURVEY.md §2.
- Multi-host: call :func:`initialize_distributed` first; device order in
  ``jax.devices()`` already interleaves hosts correctly for DP.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(**kwargs) -> None:
    """Multi-host init (no-op if already initialized or single-process)."""
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError):
        pass  # already initialized or single-process


def make_mesh(
    axes: Sequence[str] = ("data",),
    shape: Optional[Sequence[int]] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a mesh over the given devices (default: all).

    ``shape`` defaults to all devices on the first axis and 1 elsewhere.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axes) - 1)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} != device count {n}")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, tuple(axes))


def mesh_for_batch(batch_size: int,
                   devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1-D data mesh over the largest device subset dividing ``batch_size``.

    Keeps the static shapes constraint (every shard equal) without forcing
    callers to round their batch size to the chip count."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    while n > 1 and batch_size % n:
        n -= 1
    if n < len(devices):
        import logging

        logging.getLogger(__name__).warning(
            "mesh_for_batch: batch_size=%d not divisible by %d devices; "
            "using %d device(s)", batch_size, len(devices), n,
        )
    return make_mesh(("data",), (n,), devices[:n])


def make_dp_tp_mesh(tp: int = 1,
                    devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """2-D (data, model) mesh with ``tp`` chips of tensor parallelism."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % tp:
        raise ValueError(f"device count {n} not divisible by tp={tp}")
    return make_mesh(("data", "model"), (n // tp, tp), devices)


def training_mesh(batch_size: int, tp: int = 1, distributed: bool = False,
                  devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """The mesh a trainer runs on: 1-D ``data`` mesh for pure DP, or a 2-D
    ``(data, model)`` mesh when ``tp > 1``. ``distributed=True`` performs
    multi-host init first (jax.distributed.initialize)."""
    if distributed:
        initialize_distributed()
    if tp <= 1:
        return mesh_for_batch(batch_size, devices)
    mesh = make_dp_tp_mesh(tp, devices)
    dp = mesh.devices.shape[0]
    if batch_size % dp:
        raise ValueError(
            f"batch_size {batch_size} must divide by the data-parallel "
            f"width {dp} ({mesh.devices.size} devices / tp={tp})"
        )
    return mesh


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis; replicate the rest."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """device_put a pytree of host arrays with the batch axis sharded."""
    sh = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), batch)


def replicate(tree, mesh: Mesh):
    """device_put a pytree fully replicated across the mesh."""
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), tree)


# ---------------------------------------------------------------------------
# Tensor-parallel parameter partitioning
# ---------------------------------------------------------------------------

def _tp_spec_for(path: str, shape: Tuple[int, ...], tp: int,
                 min_dim: int = 256) -> P:
    """Heuristic TP rule: shard the output-feature (last) dim of large
    kernels over ``model``; replicate everything else.

    ``min_dim`` keeps small tensors (norms, biases, tiny convs) replicated —
    sharding them would cost more in collectives than it saves.
    """
    if not shape or shape[-1] < min_dim or shape[-1] % tp:
        return P()
    if len(shape) >= 2 and ("kernel" in path or "embedding" in path):
        return P(*([None] * (len(shape) - 1) + ["model"]))
    return P()


def param_shardings(params, mesh: Mesh, min_dim: int = 256):
    """NamedShardings for a param pytree under the mesh's ``model`` axis.

    With no ``model`` axis (pure DP) everything is replicated.
    """
    tp = dict(zip(mesh.axis_names, mesh.devices.shape)).get("model", 1)

    def one(path, leaf):
        if tp == 1:
            return NamedSharding(mesh, P())
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        return NamedSharding(mesh, _tp_spec_for(name, leaf.shape, tp, min_dim))

    return jax.tree_util.tree_map_with_path(one, params)


def shard_params(params, mesh: Mesh, min_dim: int = 256):
    """device_put params with TP shardings (replicated under pure DP)."""
    shardings = param_shardings(params, mesh, min_dim)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)

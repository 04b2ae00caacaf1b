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
- **FSDP** (``fsdp=True``; over the ``data`` axis): ZeRO-style — every
  large parameter leaf (and therefore the Adam moments created over it)
  shards its widest free dim across the data axis; XLA all-gathers at use
  in the forward and reduce-scatters gradients in the backward. Composes
  with TP on a 2-D mesh. Headroom for models that outgrow one chip's HBM.
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


def _fsdp_axis_for(shape: Tuple[int, ...], spec: list, dp: int,
                   min_size: int) -> Optional[int]:
    """Pick the dim FSDP shards over ``data``: the largest dim divisible by
    the data-parallel width that TP hasn't already claimed. ``None`` (keep
    replicated) for small leaves — norm scales and biases cost more to
    gather than they save."""
    if dp <= 1 or int(np.prod(shape or (1,))) < min_size:
        return None
    for d in sorted(range(len(shape)), key=lambda i: -shape[i]):
        if spec[d] is None and shape[d] % dp == 0:
            return d
    return None


def param_shardings(params, mesh: Mesh, min_dim: int = 256,
                    fsdp: bool = False, fsdp_min_size: int = 1 << 16):
    """NamedShardings for a param pytree.

    - ``model`` axis present: TP — large kernels' output-feature dim.
    - ``fsdp=True``: ZeRO-style parameter sharding over the ``data`` axis
      (each leaf's largest free dim), composable with TP. XLA inserts the
      all-gather at use in the forward and the matching reduce-scatter in
      the backward; the optimizer state created over these params inherits
      the layout, so Adam moments are sharded too (the actual memory win).
      This is the standard GSPMD FSDP recipe — annotate, don't hand-write
      collectives.
    - neither: fully replicated (pure DP).
    """
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    tp = sizes.get("model", 1)
    dp = sizes.get("data", 1) if fsdp else 1

    def one(path, leaf):
        shape = tuple(leaf.shape)
        spec = [None] * len(shape)
        if tp > 1:
            name = "/".join(str(getattr(k, "key", k)) for k in path)
            tp_spec = _tp_spec_for(name, shape, tp, min_dim)
            for i, ax in enumerate(tuple(tp_spec)):
                spec[i] = ax
        d = _fsdp_axis_for(shape, spec, dp, fsdp_min_size)
        if d is not None:
            spec[d] = "data"
        while spec and spec[-1] is None:  # P(None,...) == replicated; keep
            spec.pop()                    # the canonical P() for those dims
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map_with_path(one, params)


def shard_params(params, mesh: Mesh, min_dim: int = 256,
                 fsdp: bool = False, fsdp_min_size: int = 1 << 16):
    """device_put params with TP and/or FSDP shardings (replicated under
    pure DP)."""
    shardings = param_shardings(params, mesh, min_dim, fsdp, fsdp_min_size)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)


def reshard_train_state(state, mesh: Mesh, min_dim: int = 256,
                        fsdp: bool = False, fsdp_min_size: int = 1 << 16):
    """Re-apply TP/FSDP shardings to a whole TrainState — params, the Adam
    moments (same layout as params), and the EMA copy if present.

    Needed after an Orbax restore: restored leaves come back as plain
    device arrays with no shardings, which would silently turn an FSDP run
    replicated (losing the ZeRO memory win) for the rest of training."""
    import optax

    sh = param_shardings(state.params, mesh, min_dim, fsdp, fsdp_min_size)

    def put(tree):
        return jax.tree_util.tree_map(jax.device_put, tree, sh)

    def reshard_opt(os_):
        if isinstance(os_, optax.ScaleByAdamState):
            return os_._replace(mu=put(os_.mu), nu=put(os_.nu))
        return os_

    opt_state = state.opt_state
    if isinstance(opt_state, tuple):
        opt_state = tuple(reshard_opt(o) for o in opt_state)
    else:
        opt_state = reshard_opt(opt_state)
    kw = {}
    if getattr(state, "ema_params", None) is not None:
        kw["ema_params"] = put(state.ema_params)
    return state.replace(params=put(state.params), opt_state=opt_state, **kw)

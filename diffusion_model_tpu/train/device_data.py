"""Device-resident dataset placement + epoch index batching.

The TPU-native data path for datasets that fit in HBM: the whole uint8
image tensor (plus conditions) is ``device_put`` once, and every train step
receives only a (B,) int32 index vector — the batch gather and uint8→float
conversion happen inside the jitted program. This removes ALL per-step
host→device image traffic (the reference re-uploads every batch,
train_latent_cond.py:115-118; and the axon tunnel makes per-step transfers
particularly expensive). Datasets beyond ``max_bytes`` fall back to the
streaming PrefetchLoader.
"""
from __future__ import annotations

import os
from typing import Iterator

import jax
import numpy as np

from ..parallel import batch_sharding, replicate


def epoch_fuse_default() -> bool:
    """Whether trainers should fuse a whole epoch into ONE jitted
    ``lax.scan`` program (vs one jitted step per batch, Python loop).

    On TPU the fused program is the fast path: per-dispatch host↔device
    latency (0.3-0.4 s through the axon tunnel) would otherwise dominate
    small-dataset epochs. On XLA:CPU the opposite holds — measured on the
    full-size stage-2 step (96px images, bs 32): 22.6 s/step inside the
    epoch scan vs 2.1 s/step for the identical jitted step called from
    Python (XLA:CPU de-optimizes conv-heavy bodies inside While loops).
    ``DIFFUSION_TPU_EPOCH_FUSE=0/1`` overrides the platform default.
    """
    env = os.environ.get("DIFFUSION_TPU_EPOCH_FUSE")
    if env is not None:
        return env != "0"
    return jax.default_backend() != "cpu"

# ~12 GB of HBM on a v5e chip after weights/activations; stay conservative.
DEFAULT_MAX_BYTES = 6 * 1024**3


def estimate_bytes(dataset) -> int:
    w, h = dataset.image_size
    return len(dataset) * h * w * 3


def maybe_device_resident(dataset, mesh, max_bytes: int = DEFAULT_MAX_BYTES):
    """materialize + replicate the dataset onto the mesh, or None if too big
    (or the dataset cannot materialize)."""
    if not hasattr(dataset, "materialize"):
        return None
    if estimate_bytes(dataset) > max_bytes:
        return None
    return replicate(dataset.materialize(), mesh)


def epoch_index_batches(
    n: int,
    batch_size: int,
    rng: np.random.Generator,
    shuffle: bool = True,
) -> Iterator[np.ndarray]:
    """Index batches covering [0, n), wrap-padded to a static batch size."""
    idx = np.arange(n)
    if shuffle:
        rng.shuffle(idx)
    pad = (-n) % batch_size
    if pad:
        # wrap-pad may need more than one full copy when batch_size > n
        reps = -(-pad // n)
        idx = np.concatenate([idx, np.tile(idx, reps)[:pad]])
    for b in idx.reshape(-1, batch_size):
        yield b


def put_indices(b: np.ndarray, mesh) -> jax.Array:
    """Ship an index batch sharded over the mesh's data axis (the gathered
    batch inherits the sharding → DP compute)."""
    return jax.device_put(np.asarray(b, np.int32), batch_sharding(mesh))


def epoch_index_matrix(
    n: int,
    batch_size: int,
    rng: np.random.Generator,
    shuffle: bool = True,
) -> np.ndarray:
    """All of an epoch's index batches as one (S, B) int32 matrix, for the
    epoch-fused lax.scan train functions."""
    return np.stack(
        list(epoch_index_batches(n, batch_size, rng, shuffle))
    ).astype(np.int32)


def epoch_index_matrix_stratified(
    labels: np.ndarray,
    batch_size: int,
    rng: np.random.Generator,
) -> np.ndarray:
    """Class-balanced epoch batching: every batch carries (as close as the
    divisibility allows) the same number of samples of each class.

    Why: with global shuffling a thin class can be under-represented in
    the batches that dominate an epoch's gradient, and the global
    objective trades it away — exactly the line-class regression seen in
    the round-2 continuation (BASELINE.md). Stratifying fixes every
    batch's class mix instead of leaving it to sampling noise.

    Mechanics: per-class index pools are shuffled independently, each is
    wrap-padded to the same number of batches, then interleaved so each
    (S, B) row takes ``B // n_classes`` (±1) from every pool and is
    shuffled within the row (so class is not correlated with batch
    position). Epoch length matches the plain path: S = ceil(n / B).
    """
    labels = np.asarray(labels)
    n = labels.shape[0]
    classes = np.unique(labels)
    steps = -(-n // batch_size)  # ceil: same epoch length as plain path
    # per-batch quota per class: split B as evenly as possible
    base = batch_size // len(classes)
    extra = batch_size - base * len(classes)
    quotas = {c: base + (1 if i < extra else 0)
              for i, c in enumerate(classes)}
    rows = []
    pools = {}
    for c in classes:
        idx = np.flatnonzero(labels == c)
        rng.shuffle(idx)
        need = quotas[c] * steps
        reps = -(-need // max(1, len(idx)))
        pools[c] = np.tile(idx, reps)[:need]
    for s in range(steps):
        row = np.concatenate([
            pools[c][s * quotas[c]:(s + 1) * quotas[c]] for c in classes
        ])
        rng.shuffle(row)
        rows.append(row)
    return np.stack(rows).astype(np.int32)


def put_index_matrix(mat: np.ndarray, mesh) -> jax.Array:
    """(S, B) index matrix with the batch axis sharded over 'data'."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    return jax.device_put(
        np.asarray(mat, np.int32), NamedSharding(mesh, P(None, "data"))
    )

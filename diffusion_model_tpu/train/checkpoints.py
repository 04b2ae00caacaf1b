"""Checkpointing: parameter artifacts + full resumable train state.

The reference only ever saves bare ``state_dict`` .pth files and cannot
resume (optimizer state is never saved — SURVEY.md §5). Here:

- :func:`save_params` / :func:`load_params` — msgpack parameter artifacts
  (flax.serialization), the ``.pth``-equivalents written at the reference's
  paths (``vae/<ts>/vae_best.msgpack``, ``result/<ts>/trained_para.msgpack``,
  rolling ``model_para/trained_para.msgpack``);
- :class:`CheckpointManager` — Orbax-backed full train state
  (params + opt state + step) with resume, the TPU-native upgrade.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
from flax import serialization

try:  # orbax is baked into the image; guard anyway for minimal installs
    import orbax.checkpoint as ocp

    _HAS_ORBAX = True
except Exception:  # pragma: no cover
    _HAS_ORBAX = False


def save_params(path: str, params: Any) -> None:
    """Serialize a parameter pytree to msgpack at ``path``.

    Writes to a temp file in the same directory and atomically renames it
    over the target, so an interruption mid-write (the exact scenario
    periodic checkpointing exists for) never destroys the previous good
    checkpoint.
    """
    path = os.path.abspath(path)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    params = jax.device_get(params)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(params))
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def load_params(path: str, target: Any) -> Any:
    """Load a parameter pytree; ``target`` provides structure/dtypes."""
    with open(path, "rb") as f:
        return serialization.from_bytes(target, f.read())


class CheckpointManager:
    """Orbax checkpoint manager for resumable training.

    Saves the full train state every ``save_interval`` steps under
    ``directory/<step>``; ``restore`` resumes from the latest.
    """

    def __init__(self, directory: str, max_to_keep: int = 3,
                 save_interval: int = 1):
        if not _HAS_ORBAX:  # pragma: no cover
            raise RuntimeError("orbax-checkpoint is not available")
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, save_interval_steps=save_interval
            ),
        )

    def save(self, step: int, state: Any, force: bool = False) -> bool:
        saved = self._mgr.save(
            step, args=ocp.args.StandardSave(jax.device_get(state)),
            force=force,
        )
        return bool(saved)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, target: Any, step: Optional[int] = None) -> Any:
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(jax.device_get(target))
        )

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()

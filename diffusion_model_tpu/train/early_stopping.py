"""Patience-based early stopping on validation loss.

Behavioral parity with /root/reference/early_stopping.py:6-57: first finite
val loss seeds the best; improvement must beat ``best - delta``; NaN epochs
are ignored; the best checkpoint is written through a callback (here: any
callable, typically checkpoints.save_params)."""
from __future__ import annotations

import math
from typing import Callable, Optional


class EarlyStopping:
    def __init__(
        self,
        patience: int = 7,
        delta: float = 0.0,
        verbose: bool = False,
        save_fn: Optional[Callable[[], None]] = None,
        trace_func: Callable[[str], None] = print,
    ):
        self.patience = patience
        self.delta = delta
        self.verbose = verbose
        self.save_fn = save_fn
        self.trace_func = trace_func
        self.counter = 0
        self.best_val_loss: Optional[float] = None
        self.early_stop = False
        self.val_loss_min = math.inf

    def __call__(self, val_loss: float) -> None:
        if math.isnan(val_loss):
            self.trace_func("Validation loss is NaN. Ignoring this epoch.")
            return
        if self.best_val_loss is None:
            self.best_val_loss = val_loss
            self._save(val_loss)
        elif val_loss < self.best_val_loss - self.delta:
            self.best_val_loss = val_loss
            self._save(val_loss)
            self.counter = 0
        else:
            self.counter += 1
            self.trace_func(
                f"EarlyStopping counter: {self.counter} out of {self.patience}"
            )
            if self.counter >= self.patience:
                self.early_stop = True

    def _save(self, val_loss: float) -> None:
        if self.verbose:
            self.trace_func(
                f"Validation loss decreased ({self.val_loss_min:.6f} --> "
                f"{val_loss:.6f}).  Saving model ..."
            )
        if self.save_fn is not None:
            self.save_fn()
        self.val_loss_min = val_loss

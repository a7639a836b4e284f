"""Training callbacks.

Reference: /root/reference/neural-network-implementation/src/training/callbacks.rs
(EarlyStoppingCallback{patience,min_delta}, CheckpointCallback{frequency,dir}).
Adds a History recorder and a generic LambdaCallback; the Trainer invokes
``on_epoch_end(epoch, logs)`` after each epoch and stops when any callback
returns True.
"""
from __future__ import annotations

import os
from typing import Callable, Optional


class Callback:
    def on_train_begin(self, trainer):  # noqa: D401 - hook
        pass

    def on_epoch_end(self, epoch: int, logs: dict, trainer) -> bool:
        """Return True to stop training."""
        return False

    def on_train_end(self, trainer):
        pass


class EarlyStopping(Callback):
    """Stop when the monitored metric hasn't improved by min_delta for
    ``patience`` epochs (callbacks.rs EarlyStoppingCallback)."""

    def __init__(self, patience: int = 5, min_delta: float = 0.0,
                 monitor: str = "val_loss"):
        self.patience = patience
        self.min_delta = min_delta
        self.monitor = monitor
        self.best = float("inf")
        self.wait = 0
        self.stopped_epoch: Optional[int] = None

    def on_epoch_end(self, epoch, logs, trainer) -> bool:
        val = logs.get(self.monitor, logs.get("loss"))
        if val is None:
            return False
        if val < self.best - self.min_delta:
            self.best = val
            self.wait = 0
            return False
        self.wait += 1
        if self.wait >= self.patience:
            self.stopped_epoch = epoch
            return True
        return False


class ModelCheckpoint(Callback):
    """Save parameters every ``frequency`` epochs (callbacks.rs
    CheckpointCallback); keeps the best-loss path in ``best_path``."""

    def __init__(self, directory: str, frequency: int = 5, monitor: str = "val_loss"):
        self.directory = directory
        self.frequency = max(int(frequency), 1)
        self.monitor = monitor
        self.best = float("inf")
        self.best_path: Optional[str] = None

    def on_train_begin(self, trainer):
        os.makedirs(self.directory, exist_ok=True)

    def on_epoch_end(self, epoch, logs, trainer) -> bool:
        if (epoch + 1) % self.frequency == 0:
            path = os.path.join(self.directory, f"epoch_{epoch + 1:04d}.msgpack")
            trainer.save(path)
            val = logs.get(self.monitor, logs.get("loss", float("inf")))
            if val < self.best:
                self.best = val
                self.best_path = path
        return False


class History(Callback):
    """Records per-epoch logs (training/mod.rs TrainingHistory)."""

    def __init__(self):
        self.epochs: list[dict] = []

    def on_epoch_end(self, epoch, logs, trainer) -> bool:
        self.epochs.append({"epoch": epoch, **logs})
        return False


class LambdaCallback(Callback):
    def __init__(self, on_epoch_end: Callable[[int, dict], Optional[bool]]):
        self._fn = on_epoch_end

    def on_epoch_end(self, epoch, logs, trainer) -> bool:
        return bool(self._fn(epoch, logs))

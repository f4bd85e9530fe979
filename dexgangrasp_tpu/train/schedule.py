"""Host-side training schedules.

- ``PlateauScheduler``: torch ReduceLROnPlateau equivalent (mode='min',
  factor 0.2, relative threshold 0.01, patience 3 — reference
  ``networks.py:12-23`` + ``config_dexgangrasp.yaml``).
- ``EarlyStopping``: patience-7 val-loss stopper (reference
  ``train_tools.py:4-42``; instantiated-but-unused there, first-class here).
"""
from __future__ import annotations

import math
from typing import Optional


class PlateauScheduler:
    """Reduce lr by ``factor`` after ``patience`` epochs without
    (relative) improvement.  Mirrors torch's ReduceLROnPlateau semantics:
    best is updated on any improvement; 'rel' threshold mode compares
    ``value < best * (1 - threshold)``."""

    def __init__(self, lr: float, factor: float = 0.2, patience: int = 3,
                 threshold: float = 0.01, min_lr: float = 0.0,
                 mode: str = "min", threshold_mode: str = "rel"):
        assert mode == "min"
        self.lr = lr
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.threshold_mode = threshold_mode
        self.min_lr = min_lr
        self.best = math.inf
        self.num_bad_epochs = 0

    def _is_better(self, value: float) -> bool:
        if self.threshold_mode == "rel":
            return value < self.best * (1.0 - self.threshold)
        return value < self.best - self.threshold

    def step(self, value: float) -> float:
        """Feed the epoch's monitored loss; returns the (possibly reduced)
        learning rate."""
        if self._is_better(value):
            self.best = value
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
            if self.num_bad_epochs > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.num_bad_epochs = 0
        return self.lr

    def state_dict(self) -> dict:
        return {"lr": self.lr, "best": self.best,
                "num_bad_epochs": self.num_bad_epochs}

    def load_state_dict(self, sd: dict) -> None:
        self.lr = sd["lr"]
        self.best = sd["best"]
        self.num_bad_epochs = sd["num_bad_epochs"]


class EarlyStopping:
    """Early-stop once val loss hasn't improved for ``patience`` epochs."""

    def __init__(self, patience: int = 7, delta: float = 0.0):
        self.patience = patience
        self.delta = delta
        self.best_score: Optional[float] = None
        self.counter = 0
        self.early_stop = False

    def __call__(self, val_loss: float) -> bool:
        score = -val_loss
        if self.best_score is None:
            self.best_score = score
        elif score < self.best_score + self.delta:
            self.counter += 1
            if self.counter >= self.patience:
                self.early_stop = True
        else:
            self.best_score = score
            self.counter = 0
        return self.early_stop

    def state_dict(self) -> dict:
        return {"best_score": self.best_score, "counter": self.counter,
                "early_stop": self.early_stop}

    def load_state_dict(self, sd: dict) -> None:
        self.best_score = sd["best_score"]
        self.counter = sd["counter"]
        self.early_stop = sd["early_stop"]

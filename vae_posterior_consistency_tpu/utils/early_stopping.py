"""Patience-based early stopping with best-checkpoint saving.

Functional equivalent of the reference's EarlyStopping helper
(reference: src/utils/pytorchtools.py:5-58) — which is imported by the training
loop but never instantiated (reference: src/experiment_main/train.py:4). Here
it IS wired in: `engine.train.train(..., early_stopping=EarlyStopping(...))`
runs a compiled validation pass at every chunk boundary, calls `update()`, and
on stop restores the best parameters (tests/test_engine.py covers both the
stop-early and the restore-best behaviors).
"""

from __future__ import annotations

import numpy as np

from vae_posterior_consistency_tpu.engine import checkpoint


class EarlyStopping:
    """Stop when the validation loss hasn't improved for `patience` checks.

    update(val_loss, params) returns True when training should stop; the best
    parameters are checkpointed to `path` on every improvement (the reference
    saves model + epoch the same way, pytorchtools.py:51-58).
    """

    def __init__(self, patience: int = 100, verbose: bool = False,
                 delta: float = 0.0, path: str | None = None):
        self.patience = patience
        self.verbose = verbose
        self.delta = delta
        self.path = path
        self.counter = 0
        self.best_loss = np.inf
        self.early_stop = False
        self.best_params = None

    def update(self, val_loss: float, params) -> bool:
        if val_loss < self.best_loss - self.delta:
            if self.verbose:
                print(f"Validation loss decreased "
                      f"({self.best_loss:.6f} -> {val_loss:.6f}).")
            self.best_loss = float(val_loss)
            self.best_params = params
            self.counter = 0
            if self.path is not None:
                checkpoint.save(params, self.path)
        else:
            self.counter += 1
            if self.verbose:
                print(f"EarlyStopping counter: {self.counter} / {self.patience}")
            if self.counter >= self.patience:
                self.early_stop = True
        return self.early_stop

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


class EnsembleEarlyStopping:
    """Per-replica early stopping for the stacked-pytree ensemble trainers
    (parallel/sweep) — the vmapped generalization of `EarlyStopping`.

    `update(val_losses [S], params_ens)` tracks an independent
    (best_loss, patience counter, best-params row) per replica and returns
    True only when EVERY replica has exhausted patience — one replica still
    improving keeps the whole compiled program training (replicas that
    plateaued earlier simply keep their already-recorded best rows; extra
    epochs on them are dead weight, exactly like the trainers' dp padding
    rows). On stop — or at the natural end of training — the trainer
    returns each replica's own best-epoch parameters, so per-replica
    stopping needs no masked in-program freezing.

    `best_params` lives on HOST (numpy leaves, leading [S] axis): only the
    improved rows transfer per check, and the snapshot survives the chunk
    runner's donated device buffers. The reference has no ensemble concept
    at all; its (never-instantiated) serial helper is
    src/utils/pytorchtools.py:5-58.
    """

    def __init__(self, patience: int = 100, delta: float = 0.0,
                 verbose: bool = False):
        self.patience = patience
        self.delta = delta
        self.verbose = verbose
        self.best_loss = None     # np [S] after the first update
        self.counter = None       # np int [S]
        self.best_params = None   # host pytree, leading [S] axis per leaf
        self.early_stop = False

    def clone_config(self) -> "EnsembleEarlyStopping":
        """Fresh tracker with the same thresholds (no accumulated state) —
        the grouped ultra-wide seed path gives each sequential group its
        own tracker (groups are separate compiled programs over disjoint
        replica rows)."""
        return EnsembleEarlyStopping(patience=self.patience,
                                     delta=self.delta, verbose=self.verbose)

    def update(self, val_losses, params_ens) -> bool:
        import jax

        v = np.asarray(val_losses, dtype=np.float64)
        first = self.best_loss is None
        if first:
            self.best_loss = np.full(v.shape[0], np.inf)
            self.counter = np.zeros(v.shape[0], dtype=np.int64)
        improved = v < self.best_loss - self.delta
        self.counter = np.where(improved, 0, self.counter + 1)
        self.best_loss = np.where(improved, v, self.best_loss)
        idx = np.flatnonzero(improved)
        if first or idx.size == v.shape[0]:
            # full snapshot: every replica has SOME best row even if its
            # loss never improves again (e.g. a diverged NaN replica)
            self.best_params = jax.tree_util.tree_map(
                lambda leaf: np.array(leaf), params_ens)
        elif idx.size:
            # transfer only the improved rows (device fancy-index, then one
            # host copy per leaf)
            def put(best, leaf):
                best[idx] = np.asarray(leaf[idx])
                return best

            self.best_params = jax.tree_util.tree_map(
                put, self.best_params, params_ens)
        if self.verbose:
            # report exhausted-replica counts, not the max counter: a row's
            # counter can exceed patience while OTHER rows still improve
            # (the program only stops when all rows have exhausted)
            done = int(np.sum(self.counter >= self.patience))
            print(f"EnsembleEarlyStopping: {int(improved.sum())}/{v.shape[0]} "
                  f"improved, {done}/{v.shape[0]} exhausted "
                  f"(patience {self.patience})")
        self.early_stop = bool(np.all(self.counter >= self.patience))
        return self.early_stop

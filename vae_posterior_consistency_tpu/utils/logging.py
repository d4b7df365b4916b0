"""Console progress + profiling helpers.

The reference's observability is a tqdm bar printing total epoch loss
(reference: src/experiment_main/train.py:26,118). We print chunked epoch-loss
lines (the training loop is compiled in chunks, so per-epoch host prints would
serialize the device) and add `jax.profiler` trace contexts the reference lacks.
"""

from __future__ import annotations

import contextlib
import time


def epoch_logger(max_epochs: int):
    """Returns log_fn(epochs_done, last_epoch_loss) in the reference's format
    ('Epoch: [i/max], Total Loss: x' — src/experiment_main/train.py:118)."""
    start = time.time()

    def log(done: int, loss: float):
        rate = done / max(time.time() - start, 1e-9)
        print(
            f"Epoch: [{done - 1}/{max_epochs}], Total Loss: {loss}"
            f"  ({rate:.1f} epochs/s)"
        )

    return log


@contextlib.contextmanager
def profile_trace(logdir: str = "/tmp/vpc_tpu_trace"):
    """jax.profiler trace context — view with TensorBoard/Perfetto."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(label: str):
    t0 = time.time()
    yield
    print(f"[timing] {label}: {time.time() - t0:.3f}s")

"""Numerical-anomaly tripwires.

The reference enables torch's global autograd anomaly detection in every entry
point (reference: src/experiment_main/imputation.py:19 — NaN/inf tripwire at
heavy runtime cost). The JAX equivalents here are opt-in:

- `enable_nan_debugging()` — `jax_debug_nans`: re-runs the op that produced a
  NaN un-jitted and raises with a stack trace.
- `checked(fn)` — `checkify` wrapper surfacing NaN/OOB errors as values, usable
  inside jit without deoptimizing the whole program.
"""

from __future__ import annotations

import jax
from jax.experimental import checkify


def enable_nan_debugging(enable: bool = True) -> None:
    """Global NaN tripwire (equivalent in intent to
    torch.autograd.set_detect_anomaly(True))."""
    jax.config.update("jax_debug_nans", enable)


def checked(fn):
    """Wrap fn with checkify NaN + index checks; the wrapper raises on error.

    Usage: loss = checked(train_loss)(params, ...) — stays jit-compatible.
    """
    cfn = checkify.checkify(
        fn, errors=checkify.float_checks | checkify.index_checks
    )

    def wrapper(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        err.throw()
        return out

    return wrapper


def enable_nan_debugging_from_env(var: str = "VPC_DEBUG_NANS") -> None:
    """Enable jax_debug_nans when the env var is set — the opt-in equivalent
    of the reference's unconditional torch detect_anomaly (PARITY.md
    documented deviation #7). Called by every experiment_main entry point."""
    import os

    if os.environ.get(var):
        enable_nan_debugging()


def apply_platform_from_env(var: str = "VPC_PLATFORM") -> None:
    """VPC_PLATFORM=cpu (or any backend name) pins the jax platform for the
    entry points. The JAX_PLATFORMS *env var* can be overridden by pinned
    experimental TPU plugins; the config API wins when applied before the
    backend initializes — so the CLI scripts call this first thing. Used by
    tests to drive the CLI on a virtual CPU mesh, and by users to force CPU
    runs on a TPU host."""
    import os

    plat = os.environ.get(var)
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)

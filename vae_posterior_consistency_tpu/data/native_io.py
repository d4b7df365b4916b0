"""ctypes bindings for the native host-side data-plane (native/vpc_io.cpp).

Provides fast CSV ingestion, a bit-packed observation-mask codec, and offline
MCAR sampling as a C++ library, built on demand with g++ (no pybind11
dependency) and cached next to the source. Every entry point has a pure-NumPy
fallback so the framework works on hosts without a toolchain.

This is the framework's native runtime component for the host data path (the
TPU compute path is jax/XLA/Pallas; device-side training masks use jax.random —
see ops/masks.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
_SRC = os.path.join(_REPO_ROOT, "native", "vpc_io.cpp")
_SO = os.path.join(_REPO_ROOT, "native", "libvpc_io.so")

_lock = threading.Lock()
_lib = None
_build_failed = False

#: must match native/vpc_io.cpp:vpc_io_abi_version — the loader refuses a
#: stale .so (e.g. built before a signature change, with the source since
#: removed) rather than calling it with the wrong argument list.
_ABI_VERSION = 3


def _load():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            # Always rebuild from source when it is newer or the .so is
            # absent. Portable codegen (no -march=native): the .so may travel
            # between hosts via caches, and a foreign ISA-tuned binary would
            # SIGILL inside data loading with no way to fall back.
            src_ok = os.path.exists(_SRC)
            if src_ok and (
                not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)
            ):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC],
                    check=True, capture_output=True,
                )
            if not os.path.exists(_SO):
                raise FileNotFoundError(_SO)
            lib = ctypes.CDLL(_SO)
            try:
                lib.vpc_io_abi_version.restype = ctypes.c_int64
                abi = int(lib.vpc_io_abi_version())
            except AttributeError:
                abi = -1
            if abi != _ABI_VERSION:
                raise RuntimeError(
                    f"stale {_SO}: abi {abi} != expected {_ABI_VERSION}"
                )
            lib.vpc_csv_count.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
            ]
            lib.vpc_csv_count.restype = ctypes.c_int
            lib.vpc_csv_parse.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64,
                ctypes.c_int64,
            ]
            lib.vpc_csv_parse.restype = ctypes.c_int64
            lib.vpc_pack_mask.argtypes = [
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint8),
            ]
            lib.vpc_unpack_mask.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_float),
            ]
            lib.vpc_mcar_mask.argtypes = [
                ctypes.c_int64,
                ctypes.c_double,
                ctypes.c_uint64,
                ctypes.POINTER(ctypes.c_float),
            ]
            _lib = lib
        except Exception:
            _build_failed = True
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


# ---------------------------------------------------------------------------
# CSV ingestion
# ---------------------------------------------------------------------------


def read_csv(path: str) -> np.ndarray:
    """Numeric CSV -> float32 [rows, cols]; native fast path with numpy
    fallback."""
    lib = _load()
    if lib is None:
        return np.loadtxt(path, delimiter=",", dtype=np.float32).reshape(
            -1, _numpy_cols(path)
        )
    rows = ctypes.c_int64()
    cols = ctypes.c_int64()
    if lib.vpc_csv_count(path.encode(), ctypes.byref(rows),
                         ctypes.byref(cols)):
        raise FileNotFoundError(path)
    n = rows.value * cols.value
    out = np.empty(n, np.float32)
    got = lib.vpc_csv_parse(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
        cols.value,
    )
    if got <= -2:
        raise ValueError(
            f"{path}: ragged CSV — data row {-got - 2} does not have "
            f"{cols.value} values"
        )
    if got != n:
        raise ValueError(f"{path}: parsed {got} values, expected {n}")
    return out.reshape(rows.value, cols.value)


def _numpy_cols(path: str) -> int:
    with open(path) as fh:
        return len(fh.readline().split(","))


# ---------------------------------------------------------------------------
# Mask codec
# ---------------------------------------------------------------------------


def pack_mask(mask: np.ndarray) -> np.ndarray:
    """float32 0/1 mask -> LSB-first bit-packed uint8 (8x smaller)."""
    flat = np.ascontiguousarray(mask, np.float32).reshape(-1)
    lib = _load()
    if lib is None:
        return np.packbits(flat.astype(bool), bitorder="little")
    out = np.empty((flat.size + 7) // 8, np.uint8)
    lib.vpc_pack_mask(
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), flat.size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out


def unpack_mask(packed: np.ndarray, shape) -> np.ndarray:
    """Inverse of pack_mask -> float32 mask of `shape`."""
    n = int(np.prod(shape))
    lib = _load()
    if lib is None:
        bits = np.unpackbits(packed, bitorder="little")[:n]
        return bits.astype(np.float32).reshape(shape)
    out = np.empty(n, np.float32)
    lib.vpc_unpack_mask(
        np.ascontiguousarray(packed).ctypes.data_as(
            ctypes.POINTER(ctypes.c_uint8)
        ),
        n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out.reshape(shape)


def _xorshift128p_uniforms(n: int, seed: int) -> np.ndarray:
    """The exact xorshift128+ stream of native/vpc_io.cpp:vpc_mcar_mask.

    The recurrence is inherently sequential (each state depends on the last),
    so this no-g++ fallback is a host loop — pure-Python ints, which run ~6x
    faster than per-element numpy uint64 scalars. It is intended for offline
    artifact generation only (the largest artifact, the MNIST-scale mask at
    ~1.3M cells, takes ~1 s); per-batch training masks never come through
    here (they are jax.random on device, ops/masks.py). Bit-identical to the
    native path for a given seed, which is the property that matters."""
    M = 0xFFFFFFFFFFFFFFFF
    s0 = (seed ^ 0x9E3779B97F4A7C15) & M
    s1 = ((seed << 1) | 1) & M
    out = np.empty(n, np.float64)
    scale = 1.0 / 9007199254740992.0
    for i in range(n):
        x, y = s0, s1
        s0 = y
        x ^= (x << 23) & M
        s1 = x ^ y ^ (x >> 17) ^ (y >> 26)
        out[i] = (((s1 + y) & M) >> 11) * scale
    return out


def mcar_mask(shape, missing_rate: float, seed: int) -> np.ndarray:
    """Offline MCAR observation-mask sampling (artifact generation).

    Native path and pure-python fallback share one RNG (xorshift128+), so
    artifacts are reproducible per seed across hosts with or without g++."""
    n = int(np.prod(shape))
    lib = _load()
    if lib is None:
        u = _xorshift128p_uniforms(n, int(seed) & 0xFFFFFFFFFFFFFFFF)
        return (u < 1.0 - missing_rate / 100.0).astype(
            np.float32
        ).reshape(shape)
    out = np.empty(n, np.float32)
    lib.vpc_mcar_mask(
        n, float(missing_rate), int(seed) & 0xFFFFFFFFFFFFFFFF,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out.reshape(shape)

"""Native data-plane (C++ vpc_io via ctypes) vs pure-NumPy behavior."""

import numpy as np
import pytest

from vae_posterior_consistency_tpu.data import native_io


def test_native_builds():
    assert native_io.available(), "g++ build of native/vpc_io.cpp failed"


def test_csv_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    arr = rng.normal(size=(37, 5)).astype(np.float32)
    path = tmp_path / "t.csv"
    np.savetxt(path, arr, delimiter=",", fmt="%.7g")
    out = native_io.read_csv(str(path))
    assert out.shape == arr.shape
    np.testing.assert_allclose(out, arr, rtol=1e-5)


def test_csv_single_row(tmp_path):
    # index CSVs are written as one row (see data/generate.py)
    path = tmp_path / "idx.csv"
    path.write_text("3,1,4,1,5\n")
    out = native_io.read_csv(str(path))
    assert out.shape == (1, 5)
    np.testing.assert_array_equal(out[0], [3, 1, 4, 1, 5])


def test_mask_pack_roundtrip():
    rng = np.random.default_rng(1)
    for shape in [(64, 12), (7, 3), (1, 1), (100, 13)]:
        mask = (rng.random(shape) < 0.5).astype(np.float32)
        packed = native_io.pack_mask(mask)
        assert packed.nbytes <= mask.size // 8 + 1
        back = native_io.unpack_mask(packed, shape)
        np.testing.assert_array_equal(back, mask)


def test_pack_matches_numpy_packbits():
    mask = (np.random.default_rng(2).random(130) < 0.4).astype(np.float32)
    ours = native_io.pack_mask(mask)
    ref = np.packbits(mask.astype(bool), bitorder="little")
    np.testing.assert_array_equal(ours, ref)


def test_native_mcar_rate():
    m = native_io.mcar_mask((2000, 10), 30.0, seed=42)
    assert abs(m.mean() - 0.7) < 0.02
    # deterministic per seed
    m2 = native_io.mcar_mask((2000, 10), 30.0, seed=42)
    np.testing.assert_array_equal(m, m2)
    m3 = native_io.mcar_mask((2000, 10), 30.0, seed=43)
    assert not np.array_equal(m, m3)


def test_missing_file_raises():
    # pin the TYPE: both the native path and the numpy fallback raise
    # FileNotFoundError (a bare Exception would accept e.g. a ctypes
    # ArgumentError from a broken binding)
    with pytest.raises(FileNotFoundError):
        native_io.read_csv("/nonexistent/file.csv")


def test_csv_rejects_wide_final_row(tmp_path):
    """A final row WIDER than the header must hard-error like a mid-file
    ragged row (pre-fix the capacity-bounded parse loop silently dropped
    the extra values)."""
    import pytest

    p = tmp_path / "wide.csv"
    p.write_text("1,2\n3,4,5\n")
    with pytest.raises(ValueError, match="ragged"):
        native_io.read_csv(str(p))


def test_csv_rejects_partially_numeric_tokens(tmp_path):
    """Corrupted cells ('3.1.4', '12abc') must error, matching the numpy
    fallback (np.loadtxt raises on the same file) — pre-fix strtof silently
    truncated them to their numeric prefix."""
    import pytest

    for cell in ("3.1.4", "12abc", "nanx"):
        p = tmp_path / "corrupt.csv"
        p.write_text(f"1,2\n{cell},4\n")
        with pytest.raises(ValueError):
            native_io.read_csv(str(p))

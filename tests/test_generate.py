"""Dataset fabrication (data/generate.py) — source-table provenance and the
artifact contract (reference: src/utils/loaders.py:319-384 consumes these).

The `wine` and `digits` tables are GENUINE sklearn-bundled UCI data (the
data-fidelity banner in RESULTS.md); these tests pin that provenance so a
refactor can't silently swap in synthetic values.
"""

import numpy as np
import pytest

from vae_posterior_consistency_tpu.data import generate, loaders


def test_digits_table_is_genuine_and_finite_under_minmax():
    from sklearn.datasets import load_digits

    rng = np.random.default_rng(0)
    x = generate._source_table("digits", rng)
    raw = load_digits().data.astype(np.float32) / 16.0
    keep = (raw.max(0) - raw.min(0)) > 0
    assert x.shape == (1797, int(keep.sum()))
    np.testing.assert_array_equal(x, raw[:, keep])
    # the reason the constant columns are dropped: minmax divides by the
    # column range in both stacks
    rng_col = x.max(0) - x.min(0)
    assert (rng_col > 0).all()


def test_wine_table_is_genuine():
    from sklearn.datasets import load_wine

    rng = np.random.default_rng(0)
    x = generate._source_table("wine", rng)
    np.testing.assert_array_equal(x, load_wine().data.astype(np.float32))


def test_digits_artifacts_load_through_data_loader(tmp_path):
    generate.generate_uci(str(tmp_path), "digits", seed=3)
    ds = loaders.data_loader(str(tmp_path), "vanilla_vae1", 30, 64, "digits")
    assert ds.obs_dim == 61
    for split in (ds.train, ds.test):
        assert np.isfinite(np.asarray(split.x)).all()
        m = np.asarray(split.mask)
        assert 0.6 < m.mean() < 0.8  # 30% MCAR
    assert ds.train.x.shape[0] + ds.test.x.shape[0] == 1797


def test_cancer_table_is_genuine_and_loads(tmp_path):
    from sklearn.datasets import load_breast_cancer

    rng = np.random.default_rng(0)
    x = generate._source_table("cancer", rng)
    raw = load_breast_cancer().data.astype(np.float32)
    keep = (raw.max(0) - raw.min(0)) > 0
    np.testing.assert_array_equal(x, raw[:, keep])
    assert x.shape == (569, 30)
    generate.generate_uci(str(tmp_path), "cancer", seed=3)
    ds = loaders.data_loader(str(tmp_path), "vanilla_vae1", 30, 64, "cancer")
    assert ds.obs_dim == 30
    assert np.isfinite(np.asarray(ds.train.x)).all()


def test_unknown_data_type_rejected():
    with pytest.raises(ValueError):
        generate._source_table("nope", np.random.default_rng(0))

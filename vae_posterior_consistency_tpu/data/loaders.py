"""Dataset loading: whole-table device-resident arrays instead of host DataLoaders.

The reference wraps tiny tabular datasets in torch DataLoaders that re-batch on
the host every epoch (reference: src/utils/loaders.py:319-397). On TPU the whole
table fits in HBM thousands of times over, so we load each split once as a jnp
array; batching is an on-device `permutation + dynamic_slice` inside the compiled
training loop (see engine/train.py). File-format parity: reads the same
`data.pt` / `mask_*.pt` / `*_index*.csv` artifacts via torch host-side IO.

Split-selection parity: the split index is the first digit embedded in
`vae_type` (reference: src/utils/loaders.py:322); `minmax` vs `stand`
normalization matches src/utils/loaders.py:327-336.
"""

from __future__ import annotations

import dataclasses
import os

import jax.numpy as jnp
import numpy as np

from vae_posterior_consistency_tpu.config import parse_vae_type


@dataclasses.dataclass
class Split:
    """One data split, fully device-resident."""

    x: jnp.ndarray  # [N, D] float32
    mask: jnp.ndarray  # [N, D] float32 observation mask (1 = observed)
    stage: str  # 'train' | 'test'

    @property
    def n(self) -> int:
        return self.x.shape[0]


@dataclasses.dataclass
class Dataset:
    train: Split
    test: "Split | None"
    obs_dim: int


def _torch_load(path):
    import torch

    t = torch.load(path, map_location="cpu", weights_only=False)
    return np.asarray(t)


def _load_indices(path) -> np.ndarray:
    from vae_posterior_consistency_tpu.data import native_io

    return native_io.read_csv(path).astype(np.int64).reshape(-1)


def _transform(data: np.ndarray, how: str) -> np.ndarray:
    # host-side numpy twin of ops/math.py:minmax_normalize/standardize (the
    # jnp versions serve on-device callers); keep the two in sync — both
    # deliberately reproduce the reference's no-guard divide (constant
    # columns -> NaN, loaders.py:327-336)
    if how == "minmax":
        lo, hi = data.min(axis=0), data.max(axis=0)
        return (data - lo) / (hi - lo)
    # 'stand': torch .std(0) default is Bessel-corrected
    return (data - data.mean(axis=0)) / data.std(axis=0, ddof=1)


def data_loader(data_path, vae_type, missing_rate, batch_size, data_type,
                data_transform="minmax") -> Dataset:
    """MCAR UCI pipeline (reference: src/utils/loaders.py:319-354)."""
    index = parse_vae_type(vae_type).split_index or "1"
    base = os.path.join(data_path, data_type)
    data = _torch_load(os.path.join(base, "data.pt")).astype(np.float32)
    mask = _torch_load(
        os.path.join(base, f"mask_{missing_rate}_missing{index}.pt")
    ).astype(np.float32)
    data = _transform(data, data_transform)
    tr = _load_indices(os.path.join(base, f"train_index{index}.csv"))
    te = _load_indices(os.path.join(base, f"test_index{index}.csv"))
    return Dataset(
        train=Split(jnp.asarray(data[tr]), jnp.asarray(mask[tr]), "train"),
        test=Split(jnp.asarray(data[te]), jnp.asarray(mask[te]), "test"),
        obs_dim=data.shape[1],
    )


def data_loader_mnar(data_path, vae_type, missing_rate, batch_size, data_type,
                     data_transform="minmax") -> Dataset:
    """MNAR pipeline: row permutation, target column dropped, MNAR mask
    (reference: src/utils/loaders.py:357-384)."""
    index = parse_vae_type(vae_type).split_index or "1"
    base = os.path.join(data_path, data_type)
    data = _torch_load(os.path.join(base, "data.pt")).astype(np.float32)
    perm = _torch_load(os.path.join(base, f"rand_perm{index}.pt")).astype(np.int64)
    data = data[perm, :][:, :-1]
    mask = _torch_load(
        os.path.join(base, f"mnar_mask_missing{index}.pt")
    ).astype(np.float32)[:, :-1]
    data = _transform(data, data_transform)
    return Dataset(
        train=Split(jnp.asarray(data), jnp.asarray(mask), "train"),
        test=None,
        obs_dim=data.shape[1],
    )


def data_loader_mnist(data_path, vae_type, missing_rate, batch_size,
                      data_type="mnist", data_transform="minmax") -> Dataset:
    """Prebuilt MNIST artifacts (reference: src/utils/loaders.py:249-316)."""
    base = os.path.join(data_path, data_type)
    tr_x = _torch_load(os.path.join(base, "experiment_train_data.pt")).astype(np.float32)
    te_x = _torch_load(os.path.join(base, "experiment_test_data.pt")).astype(np.float32)
    tr_m = _torch_load(os.path.join(base, "experiment_train_mask.pt")).astype(np.float32)
    te_m = _torch_load(os.path.join(base, "experiment_test_mask.pt")).astype(np.float32)
    return Dataset(
        train=Split(jnp.asarray(tr_x), jnp.asarray(tr_m), "train"),
        test=Split(jnp.asarray(te_x), jnp.asarray(te_m), "test"),
        obs_dim=28 * 28,
    )

"""End-to-end example: impute missing cells in YOUR OWN CSV.

Takes any numeric CSV where missing cells are empty or `nan`, trains the
flagship posterior-consistency model (reg_vae + kl_reg) on the observed
cells, and writes a completed CSV — the full capability of the reference
research pipeline (src/experiment_main/imputation.py) packaged as a
one-command tool for arbitrary tables.

Usage:
  python3 examples/impute_csv.py --input my_table.csv --output filled.csv \
      [--epochs 1000] [--vae_type reg_vae1] [--alpha 1.0]

Notes:
- values are min-max normalized per column for training and de-normalized on
  output (the reference's default transform);
- the imputation for each missing cell is the trained decoder mean given the
  row's observed cells; per-row quality scores go to stderr.
"""

from __future__ import annotations

import argparse
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _read_csv_with_nans(path: str) -> np.ndarray:
    txt = open(path).read()
    # empty fields -> nan so genfromtxt keeps the grid rectangular
    return np.genfromtxt(io.StringIO(txt), delimiter=",", dtype=np.float32)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--epochs", type=int, default=1000)
    ap.add_argument("--vae_type", default="reg_vae1")
    ap.add_argument("--alpha", type=float, default=1.0)
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vae_posterior_consistency_tpu.config import RunConfig, apply_rng_impl
    from vae_posterior_consistency_tpu.data.loaders import Dataset, Split
    from vae_posterior_consistency_tpu.engine import train as train_engine
    from vae_posterior_consistency_tpu.engine.serve import ImputationServer

    raw = _read_csv_with_nans(args.input)
    if raw.ndim == 1:
        raw = raw[:, None]
    mask = (~np.isnan(raw)).astype(np.float32)
    n_missing = int((1 - mask).sum())
    print(f"{args.input}: {raw.shape[0]} rows x {raw.shape[1]} cols, "
          f"{n_missing} missing cells "
          f"({100 * n_missing / raw.size:.1f}%)", file=sys.stderr)

    # min-max normalize on observed cells only
    filled0 = np.where(mask > 0, raw, 0.0)
    with np.errstate(all="ignore"):
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)  # all-NaN columns
            lo = np.nanmin(raw, axis=0)
            hi = np.nanmax(raw, axis=0)
    # a column with NO observed values has NaN lo/hi, and NaN * mask is NaN
    # even where mask == 0 — which would poison every training input. There
    # is nothing to learn for such a column; normalize it as identity and
    # tell the user its imputations are the model prior only.
    empty_cols = ~np.isfinite(lo)
    if empty_cols.any():
        print(f"warning: columns {np.flatnonzero(empty_cols).tolist()} have "
              f"no observed values; their imputations are unconditioned",
              file=sys.stderr)
        lo = np.where(empty_cols, 0.0, lo)
        hi = np.where(empty_cols, 1.0, hi)
    span = np.where(hi > lo, hi - lo, 1.0)
    x = (filled0 - lo) / span * mask  # missing cells zero

    cfg = RunConfig(vae_type=args.vae_type, epoch=args.epochs,
                    batch_size=min(args.batch_size, raw.shape[0]),
                    alpha=args.alpha, p_missingness=30, reg_type="kl_reg",
                    seed=args.seed, M=2)
    apply_rng_impl(cfg)
    split = Split(x=jnp.asarray(x), mask=jnp.asarray(mask), stage="train")
    ds = Dataset(train=split, test=None, obs_dim=raw.shape[1])

    params, _ = train_engine.train(ds, cfg, save=False)

    server = ImputationServer(params, cfg, raw.shape[1],
                              buckets=(raw.shape[0],))
    filled_norm, row_score = server.impute(x, mask)
    filled = filled_norm * span + lo
    out = np.where(mask > 0, raw, filled)
    np.savetxt(args.output, out, delimiter=",", fmt="%.6g")
    print(f"wrote {args.output}; per-row score (lower=better): "
          f"median {np.median(row_score):.3f}", file=sys.stderr)


if __name__ == "__main__":
    main()

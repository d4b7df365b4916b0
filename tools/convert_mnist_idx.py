"""Convert genuine MNIST IDX files into the framework's artifact contract.

The reference consumes prebuilt `experiment_{train,test}_{data,mask}.pt`
tensors it never shows the provenance of (reference: src/utils/loaders.py:
249-316, all construction code commented out). This tool builds those
artifacts from the REAL dataset: the standard IDX files every MNIST mirror
distributes (`train-images-idx3-ubyte[.gz]`, `t10k-images-idx3-ubyte[.gz]`),
pixel values scaled to [0,1] (the models use a Sigmoid decoder head,
reference VAE.py:41-44), plus reproducible seeded MCAR observation masks at
the requested missing rate (same xorshift128+ stream as the native
data-plane, data/native_io.py, so artifacts are bit-identical across hosts).

`data/generate.py:generate_mnist` remains the offline stand-in when no real
download exists (this environment has no network egress);
`data.loaders.data_loader_mnist` consumes either interchangeably — genuine
artifacts win simply by being the files on disk.

Usage:
  python3 tools/convert_mnist_idx.py \
      --train_images path/to/train-images-idx3-ubyte.gz \
      --test_images  path/to/t10k-images-idx3-ubyte.gz \
      [--out Data/mnist] [--missing_rate 30] [--seed 1234]
"""

from __future__ import annotations

import argparse
import gzip
import os
import struct
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def read_idx_images(path: str) -> np.ndarray:
    """IDX3 image file (optionally gzipped) -> float32 [N, rows*cols] in
    [0, 1]."""
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as fh:
        magic, n, rows, cols = struct.unpack(">IIII", fh.read(16))
        if magic != 2051:
            raise ValueError(f"{path}: not an IDX3 image file "
                             f"(magic {magic}, expected 2051)")
        buf = fh.read(n * rows * cols)
    if len(buf) != n * rows * cols:
        raise ValueError(f"{path}: truncated — {len(buf)} bytes for "
                         f"{n}x{rows}x{cols}")
    x = np.frombuffer(buf, np.uint8).reshape(n, rows * cols)
    return x.astype(np.float32) / 255.0


def convert(train_images: str, test_images: str, out: str,
            missing_rate: int = 30, seed: int = 1234) -> None:
    import torch

    from vae_posterior_consistency_tpu.data import native_io

    os.makedirs(out, exist_ok=True)
    for stage, path, mask_seed in (("train", train_images, seed),
                                   ("test", test_images, seed + 1)):
        x = read_idx_images(path)
        mask = native_io.mcar_mask(x.shape, missing_rate, mask_seed) > 0.5
        torch.save(torch.from_numpy(x),
                   os.path.join(out, f"experiment_{stage}_data.pt"))
        torch.save(torch.from_numpy(mask),
                   os.path.join(out, f"experiment_{stage}_mask.pt"))
        print(f"{stage}: {x.shape[0]} images x {x.shape[1]} px, "
              f"observed {float(mask.mean()):.3f} -> {out}")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--train_images", required=True)
    ap.add_argument("--test_images", required=True)
    ap.add_argument("--out", default="Data/mnist")
    ap.add_argument("--missing_rate", type=int, default=30)
    ap.add_argument("--seed", type=int, default=1234)
    args = ap.parse_args(argv)
    convert(args.train_images, args.test_images, args.out,
            args.missing_rate, args.seed)


if __name__ == "__main__":
    main()

"""Point-cloud text loading with a native C++ fast path.

The reference loads whitespace-delimited ``x y z r g b`` text clouds through
``pandas.read_table`` (reference ``data_utils.py:30,150``) — the data-layer
equivalent of its native dependency.  Here the hot path is a small C++
parser (piccolo_tpu/native/txt_loader.cpp, mmap + multithreaded float
parsing via ctypes) with a pandas/numpy fallback, plus the random
subsampling knob.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

__all__ = ["load_txt_pointcloud", "subsample"]


def _load_pandas(filepath: str) -> np.ndarray:
    import pandas as pd

    return pd.read_table(filepath, header=None, sep=r"\s+").values


def load_txt_pointcloud(
    filepath: str, sample_rate: float = 1.0, use_native: bool = True
) -> Tuple[np.ndarray, np.ndarray]:
    """Load an ``x y z r g b`` text cloud.

    Returns (xyz (N,3) float, rgb (N,3) float in [0,1]); colors in the file
    are 0..255. ``sample_rate > 1`` keeps N/sample_rate random points via a
    permutation of np.random's global stream (reference data_utils.py:36-41,
    so a seeded harness reproduces the reference's subsets).
    """
    data = None
    if use_native:
        try:
            from ..native import txt_loader

            data = txt_loader.load(filepath)
        except Exception:
            data = None
    if data is None:
        data = _load_pandas(filepath)

    xyz = np.ascontiguousarray(data[:, :3], dtype=np.float64)
    rgb = np.ascontiguousarray(data[:, 3:6], dtype=np.float64) / 255.0
    return subsample(xyz, rgb, sample_rate)


def subsample(
    xyz: np.ndarray, rgb: np.ndarray, sample_rate: float = 1.0
) -> Tuple[np.ndarray, np.ndarray]:
    if sample_rate > 1.0:
        perm = np.random.permutation(xyz.shape[0])
        idx = perm[: int(xyz.shape[0] / sample_rate)]
        xyz = xyz[idx]
        rgb = rgb[idx]
    return xyz, rgb

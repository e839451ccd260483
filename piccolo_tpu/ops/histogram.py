"""Masked colour histograms and histogram intersection.

Replaces the reference's ``color_utils.histogram`` /
``histogram_intersection`` (reference: ``color_utils.py:68-144``) with
jit/vmap-safe scatter-add formulations; the blockwise variant used by the
second init stage (reference ``utils.py:546-581``) is fused into a single
scatter over (block, bin) pairs instead of a Python loop over blocks.

Bin convention (identical to the reference): values in [0, 255], per-channel
bin size = ceil(255 / n_bins) (so 8 bins -> size 32, ids 0..7), flat id =
r + Br*g + Br*Bg*b.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax.numpy as jnp

__all__ = [
    "bin_ids",
    "masked_histogram",
    "histogram_intersection",
    "block_histograms",
]


def bin_ids(img255: jnp.ndarray, bins: Sequence[int] = (8, 8, 8)) -> jnp.ndarray:
    """Map (..., 3) values in [0, 255] to flat bin ids in [0, prod(bins))."""
    bs = [math.ceil(255.0 / b) for b in bins]
    v = img255.astype(jnp.int32)
    r = v[..., 0] // bs[0]
    g = v[..., 1] // bs[1]
    b = v[..., 2] // bs[2]
    return r + bins[0] * g + bins[0] * bins[1] * b


def masked_histogram(
    img255: jnp.ndarray,
    mask: jnp.ndarray,
    bins: Sequence[int] = (8, 8, 8),
    normalize: bool = True,
    use_pallas: bool = False,
) -> jnp.ndarray:
    """Histogram of masked pixels. img255: (..., 3) in [0, 255]; mask (...,).

    Returns a flat (prod(bins),) histogram (the reference reshapes to
    (*bins,) — intersection only needs the flat view).
    ``use_pallas`` routes through the MXU one-hot kernel
    (kernels/histogram_mxu.py) instead of XLA's scatter-add — bit-exact;
    see docs/PERFORMANCE.md for when that pays off.
    """
    nb = int(jnp.prod(jnp.array(bins)))
    ids = bin_ids(img255, bins).reshape(-1)
    m = mask.reshape(-1).astype(jnp.float32)
    if use_pallas:
        from ..kernels import histogram_pallas

        hist = histogram_pallas(ids, m, nb)
    else:
        hist = jnp.zeros((nb,), dtype=jnp.float32).at[ids].add(m)
    if normalize:
        hist = hist / jnp.maximum(hist.sum(), 1e-12)
    return hist


def histogram_intersection(h1: jnp.ndarray, h2: jnp.ndarray) -> jnp.ndarray:
    """Sum of elementwise minima over the last axis.

    Accepts flat (C,) histograms (scalar result) or batched (B, C) pairs
    (per-row result), matching the reference's two branches
    (color_utils.py:122-144).
    """
    if h1.ndim > 1:
        h1 = h1.reshape(h1.shape[0], -1)
        h2 = h2.reshape(h2.shape[0], -1)
    else:
        h1 = h1.reshape(-1)
        h2 = h2.reshape(-1)
    return jnp.minimum(h1, h2).sum(-1)


def block_histograms(
    img255: jnp.ndarray,
    mask: jnp.ndarray,
    bins: Sequence[int],
    num_split_h: int,
    num_split_w: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-block masked histograms of an equirectangular image.

    The image is tiled into num_split_h x num_split_w blocks of size
    (H // sh, W // sw) anchored at the top-left (reference
    ``utils.py:543-560``; trailing remainder rows/cols fall outside every
    block and are ignored, matching the reference's block masks).

    Returns:
      hists:  (sh*sw, prod(bins)) unnormalised counts
      counts: (sh*sw,) number of masked pixels per block
    """
    H, W, _ = img255.shape
    sh, sw = num_split_h, num_split_w
    bh, bw = H // sh, W // sw
    nb = 1
    for b in bins:
        nb *= int(b)

    ids = bin_ids(img255, bins)  # (H, W)
    row = jnp.arange(H)[:, None] // bh  # block row (may reach sh at remainder)
    col = jnp.arange(W)[None, :] // bw
    in_grid = (row < sh) & (col < sw)
    block = jnp.clip(row, 0, sh - 1) * sw + jnp.clip(col, 0, sw - 1)

    m = (mask & in_grid).astype(jnp.float32).reshape(-1)
    flat = (block * nb + ids).reshape(-1)
    hists = (
        jnp.zeros((sh * sw * nb,), dtype=jnp.float32).at[flat].add(m)
    ).reshape(sh * sw, nb)
    counts = hists.sum(-1)
    return hists, counts

"""Bilinear image sampling with grid_sample-parity semantics.

TPU-native replacement for the reference's ``sample_from_img``
(reference: ``utils.py:64-103``) which calls torch
``F.grid_sample(align_corners=False, padding_mode='zeros')`` after clipping
coordinates to +-0.99.

Instead of translating ATen's CUDA kernel we implement the gather+lerp
directly in jnp: four row gathers from the flattened image plus the lerp.
XLA fuses the index arithmetic and the weighting into the gather, and the
whole op is differentiable w.r.t. the coordinates (gradients flow through the
lerp weights; ``floor`` contributes zero gradient, exactly like grid_sample's
backward).

Semantics verified 1:1 against torch in tests/test_sampling.py:
  * unnormalise: p = ((c + 1) * size - 1) / 2   (align_corners=False)
  * corners outside the image contribute zero (zeros padding)
  * incoming coords are clipped to [-0.99, 0.99] first
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "bilinear_sample",
    "pack_bilinear_blocks",
    "bilinear_sample_packed",
    "packed_rows_and_weights",
    "cast_packed_table",
    "resolve_descent_table",
    "AUTO_BF16_TABLE_BYTES",
]

# ``descent_table = auto`` switches the descent's packed sampling table to
# bf16 texels once the f32 table would exceed this footprint.  The measured
# gather-rate curve (docs/PERFORMANCE.md "gather rate vs table size") is
# row-count-bound below ~25 MB — where bf16 is a small pessimization (extra
# upcast work, no rate win: 0.53 vs 0.32 s/pano at Stanford scale) — and
# footprint-bound by 100 MB, where halving texel bytes recovers most of the
# lost rate (OmniScenes 1.18 -> 0.53 s/pano at BETTER median error).  64 MB
# sits between the two measured regimes.
AUTO_BF16_TABLE_BYTES = 64 * 10**6


def resolve_descent_table(dtype_str: str, height: int, width: int) -> str:
    """Resolve the ``auto`` descent-table policy for a (height, width) image.

    ``auto`` -> ``bfloat16`` when the packed f32 sampling table exceeds
    :data:`AUTO_BF16_TABLE_BYTES` (the footprint-bound gather regime, e.g.
    2048x1024 OmniScenes panoramas), ``float32`` otherwise (small-table
    regime; also the trajectory-exact parity mode vs the torch reference).
    Accuracy at the flip point is gated by the multi-room eval — bf16
    matched or beat f32 under both success criteria (docs/PERFORMANCE.md,
    docs/ROUND3.md).  Explicit dtypes pass through unchanged.
    """
    if dtype_str != "auto":
        return dtype_str
    rows = (height + 1) * (width + 1)
    return "bfloat16" if rows * 48 > AUTO_BF16_TABLE_BYTES else "float32"


def bilinear_sample(
    img: jnp.ndarray,
    coords: jnp.ndarray,
    clip: bool = True,
    wrap: bool = False,
) -> jnp.ndarray:
    """Sample ``img`` at normalised ``coords``.

    Args:
      img:    (H, W, C) image.
      coords: (..., 2) sampling locations, (x, y) in [-1, 1].
      clip:   clip coords to +-0.99 first (reference behaviour at
              ``utils.py:85,97``). Disable for plain grid_sample semantics.
      wrap:   wrap the x (longitude) axis across the equirect seam at
              phi=+-pi instead of clipping it — the left neighbour of
              column 0 is column W-1 and vice versa.  The reference CLIPS
              (SURVEY §7(e)); off by default for parity.  y (latitude)
              keeps the clip + zeros border either way (the poles are real
              image edges).

    Returns:
      (..., C) sampled values; zero where all four corners fall outside.
    """
    H, W, C = img.shape
    if wrap:
        # wrap x into [-1, 1) BEFORE the pixel transform; keep y clipped
        x_n = jnp.mod(coords[..., 0] + 1.0, 2.0) - 1.0
        y_n = jnp.clip(coords[..., 1], -0.99, 0.99) if clip else coords[..., 1]
    elif clip:
        c = jnp.clip(coords, -0.99, 0.99)
        x_n, y_n = c[..., 0], c[..., 1]
    else:
        x_n, y_n = coords[..., 0], coords[..., 1]

    x = ((x_n + 1.0) * W - 1.0) / 2.0
    y = ((y_n + 1.0) * H - 1.0) / 2.0

    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    x1 = x0 + 1
    y1 = y0 + 1

    wx1 = x - x0f  # weight of the x1 column
    wx0 = 1.0 - wx1
    wy1 = y - y0f
    wy0 = 1.0 - wy1

    flat = img.reshape(H * W, C)

    def tap(ix, iy, w):
        if wrap:
            valid = (iy >= 0) & (iy < H)  # x always lands in-image
            ixc = jnp.mod(ix, W)
        else:
            valid = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
            ixc = jnp.clip(ix, 0, W - 1)
        iyc = jnp.clip(iy, 0, H - 1)
        vals = jnp.take(flat, iyc * W + ixc, axis=0)
        return vals * (w * valid)[..., None]

    out = (
        tap(x0, y0, wx0 * wy0)
        + tap(x1, y0, wx1 * wy0)
        + tap(x0, y1, wx0 * wy1)
        + tap(x1, y1, wx1 * wy1)
    )
    return out


def pack_bilinear_blocks(img: jnp.ndarray, wrap: bool = False) -> jnp.ndarray:
    """Precompute the 2x2 texel neighbourhoods for one-gather sampling.

    TPU gathers are op-bound, not byte-bound: four row gathers per sample
    (one per bilinear tap) cost ~4x one gather of a wider row.  This packs
    every (y0, x0) anchor's four taps into a single 12-float row of a
    zero-padded table, so :func:`bilinear_sample_packed` needs exactly ONE
    gather per sample while reproducing grid_sample's zeros padding exactly
    (out-of-image taps read the zero border).

    ``wrap=True`` builds the SEAM-WRAPPED table: the x padding columns
    carry the opposite edge's texels (left neighbour of column 0 is column
    W-1 and vice versa) so wrap-mode sampling needs no index changes — the
    same one-gather row layout serves both modes.  y padding stays zero
    (poles clip either way).

    Args:
      img: (H, W, 3) image.
    Returns:
      ((H+1)*(W+1), 12) table; row r = (y0+1)*(W+1) + (x0+1) holds
      [tex(y0,x0), tex(y0,x0+1), tex(y0+1,x0), tex(y0+1,x0+1)] channels,
      with y0 in [-1, H-1], x0 in [-1, W-1].
    """
    H, W, C = img.shape
    if wrap:
        Pr = jnp.pad(img, ((1, 1), (0, 0), (0, 0)))  # zero rows (poles)
        P = jnp.concatenate([Pr[:, -1:], Pr, Pr[:, :1]], axis=1)
    else:
        P = jnp.pad(img, ((1, 1), (1, 1), (0, 0)))
    blocks = jnp.concatenate(
        [P[:-1, :-1], P[:-1, 1:], P[1:, :-1], P[1:, 1:]], axis=-1
    )  # (H+1, W+1, 4C)
    return blocks.reshape((H + 1) * (W + 1), 4 * C)


def cast_packed_table(blocks: jnp.ndarray, dtype) -> jnp.ndarray:
    """Shrink a packed sampling table to a narrower texel dtype.

    XLA's TPU gather rate falls with table FOOTPRINT at OmniScenes-scale
    tables (docs/PERFORMANCE.md "gather rate vs table size"), so halving or
    quartering the texel bytes speeds the descent's gathers; the lerp/loss
    math stays f32 (``bilinear_sample_packed`` upcasts after the gather).

      float32   exact (trajectory parity vs the torch reference)
      bfloat16  8-bit mantissa texels
      uint8     fixed-point x/255 texels, exact for raw [0, 1] uint8-sourced
                images; values are clipped to [0, 1] first

    The zero border (grid_sample zeros padding + the loss's pure-black
    sample mask) survives every cast: 0.0 -> 0 exactly.
    """
    dtype = jnp.dtype(dtype)
    if dtype == jnp.uint8:
        return jnp.round(jnp.clip(blocks, 0.0, 1.0) * 255.0).astype(jnp.uint8)
    return blocks.astype(dtype)


def packed_rows_and_weights(
    coords: jnp.ndarray,
    height: int,
    width: int,
    clip: bool = True,
    wrap: bool = False,
):
    """Packed-table row index and bilinear fractions for ``coords``.

    The single source of the index/weight math shared by
    :func:`bilinear_sample_packed` and the sorted-slab kernel planner
    (kernels/slab_sampling.py) — both must floor to the same texel and lerp
    with the same fractions to stay bit-compatible.

    ``wrap=True`` pairs with a ``pack_bilinear_blocks(img, wrap=True)``
    table: x wraps into [-1, 1) instead of clipping (the wrapped table's x
    padding columns carry the opposite edge), y keeps the clip.

    Returns ``(row, wx1, wy1)``: int32 row into pack_bilinear_blocks' table
    and the x/y fractions of the (x1, y1) taps.
    """
    H, W = height, width
    if wrap:
        x_n = jnp.mod(coords[..., 0] + 1.0, 2.0) - 1.0
        y_n = jnp.clip(coords[..., 1], -0.99, 0.99) if clip else coords[..., 1]
    elif clip:
        c = jnp.clip(coords, -0.99, 0.99)
        x_n, y_n = c[..., 0], c[..., 1]
    else:
        x_n, y_n = coords[..., 0], coords[..., 1]
    x = ((x_n + 1.0) * W - 1.0) / 2.0
    y = ((y_n + 1.0) * H - 1.0) / 2.0
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    # clipped/wrapped coords guarantee x0 in [-1, W-1], y0 in [-1, H-1]
    row = (y0f.astype(jnp.int32) + 1) * (W + 1) + (x0f.astype(jnp.int32) + 1)
    return row, x - x0f, y - y0f


def bilinear_sample_packed(
    blocks: jnp.ndarray,
    height: int,
    width: int,
    coords: jnp.ndarray,
    clip: bool = True,
    wrap: bool = False,
) -> jnp.ndarray:
    """Sample with one gather per point from a packed-neighbourhood table.

    Exactly equivalent to :func:`bilinear_sample` on the image that produced
    ``blocks`` (verified in tests/test_sampling.py), ~4x fewer gather ops.
    ``wrap`` requires ``blocks`` from ``pack_bilinear_blocks(img, wrap=True)``.
    """
    row, wx1, wy1 = packed_rows_and_weights(coords, height, width, clip, wrap)
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    g = jnp.take(blocks, row, axis=0)  # (..., 4C)
    if g.dtype == jnp.uint8:
        # fixed-point texels (cast_packed_table): dequantize post-gather;
        # texels are constants w.r.t. pose, so gradients (which flow only
        # through the lerp weights) are exact for the quantized values
        g = g.astype(jnp.float32) * jnp.float32(1.0 / 255.0)
    C = blocks.shape[-1] // 4
    return (
        g[..., 0:C] * (wx0 * wy0)[..., None]
        + g[..., C : 2 * C] * (wx1 * wy0)[..., None]
        + g[..., 2 * C : 3 * C] * (wx0 * wy1)[..., None]
        + g[..., 3 * C :] * (wx1 * wy1)[..., None]
    )

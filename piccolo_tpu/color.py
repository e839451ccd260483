"""Color harmonization preprocessing (host-side).

Re-implements the reference's ``color_utils.color_mod`` (joint image+cloud
Y-channel histogram equalization in YCrCb; reference ``color_utils.py:7-65``)
and ``color_utils.color_match`` (sin-latitude-weighted per-channel CDF
matching of the image to the cloud colors; ``color_utils.py:146-234``).

These are one-time per-query preprocessing steps on uint8-derived data, so
they run on the host in numpy: the reference's O(N^2) Python interpolation
loop (``color_utils.py:175-180``) becomes a vectorized ``np.interp``.

cv2 is used for the uint8 YCrCb round-trip when available (matching the
reference bit-for-bit); a pure-numpy fallback implements the same fixed
formulas.

Documented behaviour delta: the reference's ``_match_cumulative_cdf``
indexes its per-intensity interpolant with *unique-value* indices
(``color_utils.py:201``), which silently misaligns whenever some intensity
bins are absent from the image; here each unique source value is mapped to
its own intensity bin explicitly.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

try:  # pragma: no cover - environment probe
    import cv2

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False

__all__ = ["color_mod", "color_match", "rgb_to_ycrcb", "ycrcb_to_rgb"]


def rgb_to_ycrcb(rgb_u8: np.ndarray) -> np.ndarray:
    """uint8 RGB -> uint8 YCrCb with cv2's fixed formulas."""
    if _HAS_CV2:
        return cv2.cvtColor(rgb_u8.reshape(1, -1, 3), cv2.COLOR_RGB2YCR_CB).reshape(
            rgb_u8.shape
        )
    r = rgb_u8[..., 0].astype(np.float64)
    g = rgb_u8[..., 1].astype(np.float64)
    b = rgb_u8[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cr = (r - y) * 0.713 + 128.0
    cb = (b - y) * 0.564 + 128.0
    return np.clip(np.stack([y, cr, cb], -1).round(), 0, 255).astype(np.uint8)


def ycrcb_to_rgb(ycc_u8: np.ndarray) -> np.ndarray:
    """uint8 YCrCb -> uint8 RGB with cv2's fixed formulas."""
    if _HAS_CV2:
        return cv2.cvtColor(ycc_u8.reshape(1, -1, 3), cv2.COLOR_YCR_CB2RGB).reshape(
            ycc_u8.shape
        )
    y = ycc_u8[..., 0].astype(np.float64)
    cr = ycc_u8[..., 1].astype(np.float64) - 128.0
    cb = ycc_u8[..., 2].astype(np.float64) - 128.0
    r = y + 1.403 * cr
    g = y - 0.714 * cr - 0.344 * cb
    b = y + 1.773 * cb
    return np.clip(np.stack([r, g, b], -1).round(), 0, 255).astype(np.uint8)


def color_mod(
    img: np.ndarray, rgb: np.ndarray, num_bins: int = 256
) -> Tuple[np.ndarray, np.ndarray]:
    """Sharpen colors by joint Y-histogram equalization.

    Args:
      img: (H, W, 3) float image in [0, 1].
      rgb: (N, 3) float cloud colors in [0, 1].
      num_bins: luminance histogram bins (reference default 256).

    Returns:
      (img, rgb) both modified, same shapes/dtypes/ranges.
    """
    H, W, _ = img.shape
    flat = img.reshape(-1, 3).copy()
    nonblack = (flat * 255).astype(np.int64).sum(-1) > 0

    tgt = rgb_to_ycrcb((flat[nonblack] * 255).astype(np.uint8)) / 255.0
    cloud = rgb_to_ycrcb((rgb * 255).astype(np.uint8)) / 255.0

    img_y_hist = np.bincount(
        (tgt[:, 0] * (num_bins - 1)).astype(np.int64), minlength=num_bins
    ).astype(np.float64)
    rgb_y_hist = np.bincount(
        (cloud[:, 0] * (num_bins - 1)).astype(np.int64), minlength=num_bins
    ).astype(np.float64)

    tot = img_y_hist + rgb_y_hist
    tot /= tot.sum()
    cdf = np.cumsum(tot)

    tgt[:, 0] = cdf[(tgt[:, 0] * (num_bins - 1)).astype(np.int64)]
    cloud[:, 0] = cdf[(cloud[:, 0] * (num_bins - 1)).astype(np.int64)]

    new_tgt = ycrcb_to_rgb((tgt * 255).astype(np.uint8)) / 255.0
    new_cloud = ycrcb_to_rgb((cloud * 255).astype(np.uint8)) / 255.0

    flat[nonblack] = new_tgt
    return flat.reshape(H, W, 3).astype(np.float32), new_cloud.astype(np.float32)


def _match_cdf_channel(
    src_bins: np.ndarray, template: np.ndarray, weight: np.ndarray
) -> np.ndarray:
    """Weighted CDF matching of one channel (src as int bins in [0, 255])."""
    counts = np.bincount(src_bins, weights=weight)
    src_quant = np.cumsum(counts)
    src_quant = src_quant / src_quant[-1]

    tmp_values, tmp_counts = np.unique(template, return_counts=True)
    tmp_quant = np.cumsum(tmp_counts) / template.shape[0]

    # np.interp clamps outside [xp[0], xp[-1]] — the same endpoint behaviour
    # the reference's periodic extension produces for in-[0,1] data.
    mapped = np.interp(src_quant, tmp_quant, tmp_values)
    return mapped[src_bins].astype(np.float32)


def color_match(img: np.ndarray, rgb: np.ndarray) -> np.ndarray:
    """Match the image's per-channel CDF to the cloud colors.

    Pixels are weighted by sin(latitude) to undo equirectangular
    oversampling at the poles (reference color_utils.py:220-221). Black
    pixels are left untouched.

    Args:
      img: (H, W, 3) float image in [0, 1].
      rgb: (N, 3) float cloud colors in [0, 1].
    Returns:
      (H, W, 3) float32 image in [0, 1].
    """
    H, W, _ = img.shape
    flat = np.array(img.reshape(-1, 3), dtype=np.float32)
    # ONE truncating int conversion serves the black mask and all three
    # channel-bin lookups (the repeated 2M-pixel int64 astypes dominated the
    # preprocessing wall time otherwise). int truncation matches the
    # reference's .long() semantics.
    flat_i = (flat * 255).astype(np.int32)
    nonblack = flat_i.sum(-1) > 0
    rows = np.repeat(np.arange(H, dtype=np.float32), W)
    sin_w = np.sin(rows / H * np.pi)

    src_i = flat_i[nonblack]
    w = sin_w[nonblack]

    matched = np.empty((src_i.shape[0], 3), np.float32)
    for c in range(3):
        matched[:, c] = _match_cdf_channel(src_i[:, c], rgb[:, c], w)

    flat[nonblack] = matched
    return flat.reshape(H, W, 3)

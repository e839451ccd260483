"""Color harmonization preprocessing (host-side).

Re-implements the reference's ``color_utils.color_mod`` (joint image+cloud
Y-channel histogram equalization in YCrCb; reference ``color_utils.py:7-65``)
and ``color_utils.color_match`` (sin-latitude-weighted per-channel CDF
matching of the image to the cloud colors; ``color_utils.py:146-234``).

These are one-time per-query preprocessing steps on uint8-derived data, so
they run on the host in numpy: the reference's O(N^2) Python interpolation
loop (``color_utils.py:175-180``) becomes a vectorized ``np.interp``.

One exception: the video tracking extension (tracking.py) localizes a frame
every few tens of milliseconds, where the host's per-pixel numpy work
(~0.5 s/frame at 2048x1024) dwarfs the descent itself.  For that path
:func:`color_match_device` runs the SAME per-channel CDF matching as jnp
inside the tracked-frame jit — the cloud side is precomputed once per room
by :func:`cloud_color_cdf`, and the per-frame side (weighted histogram,
256-entry LUT, per-pixel gather) is device work fused with the descent.

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

__all__ = [
    "color_mod",
    "color_match",
    "color_match_device",
    "cloud_color_cdf",
    "rgb_to_ycrcb",
    "ycrcb_to_rgb",
]


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


def cloud_color_cdf(rgb: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Per-channel empirical CDF of the cloud colors, for device matching.

    The cloud side of :func:`color_match` (``np.unique`` + normalized
    cumulative counts — reference ``color_utils.py:208-214``) depends only
    on the room, so the tracking fast path precomputes it once here and
    ships it to the device.

    Returns ``(values, quant)``, both ``(3, K)`` float32, where per channel
    ``quant[k] = P(color <= values[k])``.  Channels are padded to a common
    K by extending the last node with strictly increasing quant > 1 and the
    same value — ``jnp.interp`` never sees duplicate xp, and queries are
    <= 1 so the pads are inert.
    """
    vals, quants = [], []
    for c in range(3):
        v, cnt = np.unique(rgb[:, c], return_counts=True)
        vals.append(v.astype(np.float32))
        quants.append((np.cumsum(cnt) / rgb.shape[0]).astype(np.float32))
    k_max = max(v.shape[0] for v in vals)
    values = np.empty((3, k_max), np.float32)
    quant = np.empty((3, k_max), np.float32)
    for c in range(3):
        n = vals[c].shape[0]
        values[c, :n] = vals[c]
        quant[c, :n] = quants[c]
        if n < k_max:
            values[c, n:] = vals[c][-1]
            quant[c, n:] = quants[c][-1] + np.arange(
                1, k_max - n + 1, dtype=np.float32
            )
    return values, quant


def color_match_device(img, cdf_values, cdf_quant):
    """:func:`color_match` as a jittable device program (tracking fast path).

    Same semantics as the host version — truncating 255-bin conversion,
    sin(latitude) pixel weights, per-channel weighted CDF matched to the
    cloud CDF via ``interp``, black pixels untouched — with the image-side
    quantiles accumulated in f32 on-device instead of f64 on the host.
    The quantile noise (~1e-6 relative) is far below one cloud-CDF step
    (1/N_points), so outputs agree with the host to float noise
    (tests/test_color.py golden).

    Args:
      img: (H, W, 3) float array in [0, 1] (traced).
      cdf_values / cdf_quant: (3, K) from :func:`cloud_color_cdf`.
    Returns:
      (H, W, 3) float32 matched image.
    """
    import jax
    import jax.numpy as jnp

    H, W, _ = img.shape
    img_i = (img * 255).astype(jnp.int32)  # truncation = reference .long()
    nonblack = img_i.sum(-1) > 0
    sin_w = jnp.sin(jnp.arange(H, dtype=jnp.float32) / H * jnp.pi)
    w = jnp.where(nonblack, sin_w[:, None], 0.0).reshape(-1)
    flat_i = img_i.reshape(-1, 3)
    flat = img.reshape(-1, 3)
    # Weighted 256-bin histogram as an MXU dot instead of a scatter-add:
    # TPU scatters serialize (measured ~110 ms for the 2M-pixel frame —
    # 7x the tracked descent itself), so factor each bin id into hi/lo
    # 16-digits and accumulate hist[hi, lo] = (onehot_hi * w)^T @ onehot_lo
    # — the same factoring as kernels/histogram_mxu.py.  f32-exact
    # (precision='highest'; each product is w_t * {0,1}).
    digits = jnp.arange(16, dtype=jnp.int32)
    out = []
    for c in range(3):
        bins = flat_i[:, c]
        oh_hi = ((bins[:, None] >> 4) == digits).astype(jnp.float32)
        oh_lo = ((bins[:, None] & 15) == digits).astype(jnp.float32)
        hist = jax.lax.dot_general(
            oh_hi * w[:, None], oh_lo,
            (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )
        counts = hist.reshape(256)
        src_quant = jnp.cumsum(counts)
        src_quant = src_quant / src_quant[-1]
        lut = jnp.interp(src_quant, cdf_quant[c], cdf_values[c])
        # Applying the LUT per pixel is ALSO gather-shaped — and at 2M
        # rows x 3 channels the gather costs ~60 ms device (row-count
        # bound), 4x the tracked descent.  Reuse the SAME one-hots to
        # select from the 16x16-reshaped LUT with two tiny dots instead:
        # picked[t] = ((oh_hi @ L) * oh_lo).sum(-1) — each row of oh_hi /
        # oh_lo has exactly one 1, so the selection is f32-exact.
        picked = (
            jax.lax.dot_general(
                oh_hi, lut.reshape(16, 16),
                (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
            )
            * oh_lo
        ).sum(-1)
        out.append(jnp.where(nonblack.reshape(-1), picked, flat[:, c]))
    return jnp.stack(out, -1).reshape(H, W, 3).astype(jnp.float32)

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

from typing import NamedTuple, Tuple

import numpy as np

try:  # pragma: no cover - environment probe
    import cv2

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False

__all__ = [
    "color_mod",
    "color_mod_device",
    "cloud_sharpen_state",
    "color_match",
    "color_match_device",
    "cloud_color_cdf",
    "rgb_to_ycrcb",
    "ycrcb_to_rgb",
]

# cv2's 8-bit YCrCb conversion is FIXED-POINT: 14-bit coefficients with a
# round-half-up descale ``(x + 2^13) >> 14`` (OpenCV color.cpp; YCRF=0.713,
# YCBF=0.564 and the inverse 1.403/0.714/0.344/1.773 scaled by 2^14).
# Replicating the integer math exactly lets (a) the no-cv2 host fallback and
# (b) the on-device sharpen (color_mod_device) match cv2 BIT-FOR-BIT —
# verified exhaustively over all 256^3 inputs in both directions
# (tests/test_color.py).  All intermediates fit int32.
_R2Y, _G2Y, _B2Y = 4899, 9617, 1868
_R2CR, _B2CB = 11682, 9241
_CR2R, _CR2G, _CB2G, _CB2B = 22987, -11698, -5636, 29049


def _descale(x):
    """cv2's CV_DESCALE(x, 14): round-half-up arithmetic shift."""
    return (x + (1 << 13)) >> 14


def _rgb2ycrcb_i32(rgb_i, xp=np):
    """Exact cv2 RGB->YCrCb on int32 channels (numpy or jax.numpy)."""
    r, g, b = rgb_i[..., 0], rgb_i[..., 1], rgb_i[..., 2]
    y = _descale(r * _R2Y + g * _G2Y + b * _B2Y)
    cr = _descale((r - y) * _R2CR) + 128
    cb = _descale((b - y) * _B2CB) + 128
    return xp.clip(xp.stack([y, cr, cb], -1), 0, 255)


def _ycrcb2rgb_i32(ycc_i, xp=np):
    """Exact cv2 YCrCb->RGB on int32 channels (numpy or jax.numpy)."""
    y, cr, cb = ycc_i[..., 0], ycc_i[..., 1], ycc_i[..., 2]
    r = y + _descale((cr - 128) * _CR2R)
    g = y + _descale((cr - 128) * _CR2G + (cb - 128) * _CB2G)
    b = y + _descale((cb - 128) * _CB2B)
    return xp.clip(xp.stack([r, g, b], -1), 0, 255)


def rgb_to_ycrcb(rgb_u8: np.ndarray) -> np.ndarray:
    """uint8 RGB -> uint8 YCrCb with cv2's fixed formulas."""
    if _HAS_CV2:
        return cv2.cvtColor(rgb_u8.reshape(1, -1, 3), cv2.COLOR_RGB2YCR_CB).reshape(
            rgb_u8.shape
        )
    return _rgb2ycrcb_i32(rgb_u8.astype(np.int32)).astype(np.uint8)


def ycrcb_to_rgb(ycc_u8: np.ndarray) -> np.ndarray:
    """uint8 YCrCb -> uint8 RGB with cv2's fixed formulas."""
    if _HAS_CV2:
        return cv2.cvtColor(ycc_u8.reshape(1, -1, 3), cv2.COLOR_YCR_CB2RGB).reshape(
            ycc_u8.shape
        )
    return _ycrcb2rgb_i32(ycc_u8.astype(np.int32)).astype(np.uint8)


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


class SharpenState(NamedTuple):
    """Room-static inputs of :func:`color_mod_device` (host numpy arrays).

    ``color_mod`` couples the image and the cloud through ONE joint Y
    histogram, so its cloud side cannot be finished offline the way
    :func:`cloud_color_cdf` finishes ``color_match``'s — but everything the
    cloud contributes IS static: its Y histogram (joins the per-frame image
    histogram) and its YCrCb integer channels (re-luminated through the
    per-frame LUT).  Rows past the true point count are zero one-hots with
    Cr = Cb = 128, which the device math maps to exact black — padded cloud
    rows stay inert without a mask.
    """

    y_hist: np.ndarray    # (256,) f32 — cloud Y-bin counts (unpadded rows)
    oh_hi: np.ndarray     # (M, 16) f32 — one-hot of Y>>4 per (padded) point
    oh_lo: np.ndarray     # (M, 16) f32 — one-hot of Y&15
    crcb: np.ndarray      # (M, 2) f32 — integer Cr/Cb channels (pads 128)


def cloud_sharpen_state(
    rgb: np.ndarray, pad_to: int | None = None, num_bins: int = 256
) -> SharpenState:
    """Precompute the cloud side of :func:`color_mod` for device sharpening.

    Args:
      rgb: (N, 3) float cloud colors in [0, 1] (the room's UNPADDED colors
        — the histogram must not count padding rows).
      pad_to: pad the per-point arrays to this row count (the room's cloud
        size bucket) so the device output matches the padded cloud shape.
      num_bins: must be 256 — the device LUT is factored into hi/lo
        16-digits (kernels/histogram_mxu.py); other values keep the host
        path (the reference default is 256, ``localize.py:27``).
    """
    if num_bins != 256:
        raise ValueError(
            f"color_mod_device supports num_bins=256 only (got {num_bins})"
        )
    cloud_i = rgb_to_ycrcb(
        (np.asarray(rgb) * 255).astype(np.uint8)
    ).astype(np.int32)
    y = cloud_i[:, 0]
    n = int(y.shape[0])
    m = n if pad_to is None else int(pad_to)
    if m < n:
        raise ValueError(f"pad_to={m} < cloud size {n}")
    # host bin index is trunc((y/255)*255) == y exactly for all uint8 y
    # (verified for the f64 host chain and the f32 device chain alike)
    hist = np.bincount(y, minlength=256).astype(np.float32)
    oh_hi = np.zeros((m, 16), np.float32)
    oh_lo = np.zeros((m, 16), np.float32)
    rows = np.arange(n)
    oh_hi[rows, y >> 4] = 1.0
    oh_lo[rows, y & 15] = 1.0
    crcb = np.full((m, 2), 128.0, np.float32)
    crcb[:n] = cloud_i[:, 1:3]
    return SharpenState(y_hist=hist, oh_hi=oh_hi, oh_lo=oh_lo, crcb=crcb)


def _lut_select(oh_hi, oh_lo, lut256):
    """lut256[bin] for every row, as two tiny MXU dots instead of a gather.

    Rows of ``oh_hi``/``oh_lo`` hold at most one 1 each (zero rows select
    0.0), so ``((oh_hi @ lut.reshape(16,16)) * oh_lo).sum(-1)`` is an exact
    f32 selection — the same trick as :func:`color_match_device`, shared
    here because sharpening applies the LUT to image AND cloud rows.
    """
    import jax

    return (
        jax.lax.dot_general(
            oh_hi, lut256.reshape(16, 16),
            (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )
        * oh_lo
    ).sum(-1)


def color_mod_device(img, state: SharpenState):
    """:func:`color_mod` as a jittable device program (tracking fast path).

    The host sharpen reduces EXACTLY to integer math: cv2's fixed-point
    YCrCb conversions (replicated bit-for-bit by ``_rgb2ycrcb_i32`` /
    ``_ycrcb2rgb_i32``), a joint 256-bin Y histogram, and a 256-entry
    luminance LUT ``lut[k] = trunc(cdf[k] * 255)``.  Here the image
    histogram runs as a factored one-hot MXU dot (scatter-free, docs/
    ROUND4.md §1), the LUT is computed with exact int32 arithmetic
    ``(255 * cumsum) // total``, and both LUT applications (2M image
    pixels + the cloud) are one-hot dot selections — no gathers, no
    scatters anywhere.

    Documented delta vs the host: the host computes the CDF in f64
    (normalize, cumsum, scale) whose rounding can cross a truncation
    boundary where ``255 * cumsum`` is an exact multiple of the total —
    the device's integer floor is the mathematically exact value there.
    At most one luminance level per affected bin; golden-tested
    (tests/test_color.py) to >=99.9% bit-equality and <=1 Y-level
    everywhere.

    Args:
      img: (H, W, 3) float array in [0, 1] (traced).
      state: the room's :func:`cloud_sharpen_state`.
    Returns:
      ``(img, rgb)`` — the sharpened image (H, W, 3) f32 and the
      re-luminated (padded) cloud colors (M, 3) f32, matching the host
      ``color_mod`` outputs.
    """
    import jax
    import jax.numpy as jnp

    H, W, _ = img.shape
    img_i = (img * 255).astype(jnp.int32)  # truncation = reference .long()
    nonblack = img_i.sum(-1) > 0
    ycc = _rgb2ycrcb_i32(img_i, xp=jnp)
    y = ycc[..., 0].reshape(-1)
    w = nonblack.reshape(-1).astype(jnp.float32)
    digits = jnp.arange(16, dtype=jnp.int32)
    oh_hi = ((y[:, None] >> 4) == digits).astype(jnp.float32)
    oh_lo = ((y[:, None] & 15) == digits).astype(jnp.float32)
    img_hist = jax.lax.dot_general(
        oh_hi * w[:, None], oh_lo,
        (((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(256)
    # joint counts are exact integers in f32 (< 2^24), so the LUT floor is
    # exact in int32: 255 * cumsum <= 255 * (pixels + points) < 2^31
    joint = (img_hist + jnp.asarray(state.y_hist)).astype(jnp.int32)
    csum = jnp.cumsum(joint)
    lut = ((255 * csum) // csum[-1]).astype(jnp.float32)

    y_img = _lut_select(oh_hi, oh_lo, lut).astype(jnp.int32)
    new_rgb_i = _ycrcb2rgb_i32(
        jnp.stack([y_img.reshape(H, W), ycc[..., 1], ycc[..., 2]], -1),
        xp=jnp,
    )
    img_out = jnp.where(
        nonblack[..., None], new_rgb_i.astype(jnp.float32) / 255.0, img
    )

    y_cloud = _lut_select(
        jnp.asarray(state.oh_hi), jnp.asarray(state.oh_lo), lut
    ).astype(jnp.int32)
    crcb = jnp.asarray(state.crcb).astype(jnp.int32)
    cloud_i = _ycrcb2rgb_i32(
        jnp.stack([y_cloud, crcb[:, 0], crcb[:, 1]], -1), xp=jnp
    )
    return img_out.astype(jnp.float32), cloud_i.astype(jnp.float32) / 255.0


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

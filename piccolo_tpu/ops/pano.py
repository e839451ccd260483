"""Point-cloud -> equirectangular panorama rendering (z-buffered splat).

TPU-native redesign of the reference's ``make_pano`` (reference:
``utils.py:134-205``).  The reference sorts points far-to-near and paints
nine 1-pixel-dilated taps with ``index_put_(accumulate=False)``, relying on
write order for occlusion; that is nondeterministic on parallel hardware and
doesn't map to XLA.  Here occlusion is resolved with explicit scatter-min
passes, which is deterministic and vmap-able (the per-candidate batched
renders in init become one batched scatter).

The reference paints the nine taps in the order idx8..idx1, centre last, each
layer far-to-near.  The winner of a pixel is therefore:
  1. the tap layer painted last that hits the pixel (centre beats idx1 beats
     idx2 ... beats idx8), then
  2. within that layer, the nearest point.
We reproduce exactly that priority with two scatter passes:
  pass 1: min packed (tap-priority, distance) key per pixel — positive-f32
          distance bits are monotonic as unsigned ints, so priority and
          distance pack into one int32 scatter-min
  pass 2: min point index among key winners (deterministic tie-break)
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .projection import spherical_project

__all__ = [
    "render_pano",
    "render_winner",
    "render_attr_min",
    "attr_min_keys",
    "attr_min_decode",
]

# (priority, dr, dc): centre has priority 0 (painted last in the reference),
# idx1..idx8 have priorities 1..8 (idx8 painted first).
# Reference tap offsets (utils.py:172-198): idx1=(+1,+1) idx2=(+1,0)
# idx3=(+1,-1) idx4=(-1,+1) idx5=(-1,0) idx6=(-1,-1) idx7=(0,+1) idx8=(0,-1).
_TAPS = (
    (0, 0, 0),
    (1, 1, 1),
    (2, 1, 0),
    (3, 1, -1),
    (4, -1, 1),
    (5, -1, 0),
    (6, -1, -1),
    (7, 0, 1),
    (8, 0, -1),
)


def _tap_expansion(xyz, resolution, point_mask):
    """Project points and expand the 9 splat taps.

    Returns flat (9N,) pixel ids, tap priorities, distances, validity.
    """
    H, W = resolution
    N = xyz.shape[0]

    dist = jnp.sqrt(jnp.sum(xyz * xyz, axis=-1))
    coords = spherical_project(xyz)  # (N, 2) in [-1, 1]
    px = (coords[..., 0] + 1.0) / 2.0 * (W - 1)
    py = (coords[..., 1] + 1.0) / 2.0 * (H - 1)
    # .long() in torch truncates toward zero; coords are non-negative here so
    # floor == trunc (reference utils.py:161-165).
    col0 = jnp.floor(px).astype(jnp.int32)
    row0 = jnp.floor(py).astype(jnp.int32)

    if point_mask is None:
        valid = jnp.ones((N,), dtype=bool)
    else:
        valid = point_mask

    rows = []
    cols = []
    prios = []
    for p, dr, dc in _TAPS:
        rows.append(jnp.clip(row0 + dr, 0, H - 1))
        cols.append(jnp.clip(col0 + dc, 0, W - 1))
        prios.append(jnp.full((N,), p, dtype=jnp.int32))
    pix = (jnp.stack(rows) * W + jnp.stack(cols)).reshape(-1)
    prio = jnp.stack(prios).reshape(-1)
    dist9 = jnp.broadcast_to(dist, (9, N)).reshape(-1)
    valid9 = jnp.broadcast_to(valid, (9, N)).reshape(-1)
    return pix, prio, dist9, valid9


def render_winner(
    xyz: jnp.ndarray,
    resolution: Tuple[int, int] = (200, 400),
    point_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Z-buffer resolve only: the winning point index per pixel.

    Returns (H*W,) int32 with N for background pixels.  This is the
    expensive half of :func:`render_pano` (its only in-tree consumer);
    exposed for callers that need per-pixel point attributes other than
    colour.  Note: a histogram-trim variant built on this was measured
    slower than rendering + re-binning — see docs/PERFORMANCE.md.
    """
    H, W = resolution
    N = xyz.shape[0]
    pix, prio, dist9, valid9 = _tap_expansion(xyz, resolution, point_mask)
    idx9 = jnp.broadcast_to(
        jnp.arange(N, dtype=jnp.int32), (9, N)
    ).reshape(-1)

    # pass 1: one scatter-min over a packed (priority, distance) key.
    # Positive-f32 bit patterns are monotonic as unsigned ints, so
    # (prio << 27) | (dist_bits >> 5) orders by priority then distance in a
    # single int32 (top 4 bits priority 0..9, next 27 bits the distance's
    # high bits — ties only for distances within ~4e-6 relative, where the
    # point-index tie-break below decides deterministically).
    big_prio = jnp.where(valid9, prio, 9)
    dist_bits = jax.lax.bitcast_convert_type(
        jnp.maximum(dist9, 0.0), jnp.uint32
    )
    key = ((big_prio.astype(jnp.uint32) << 27) | (dist_bits >> 5)).astype(
        jnp.int32
    )
    max_key = jnp.int32(10 << 27)
    key = jnp.where(valid9, key, max_key)
    min_key = jnp.full((H * W,), max_key, dtype=jnp.int32).at[pix].min(key)
    on_key = valid9 & (key == min_key[pix])

    # pass 2: deterministic tie-break by lowest point index
    i_eff = jnp.where(on_key, idx9, N).astype(jnp.int32)
    winner = jnp.full((H * W,), N, dtype=jnp.int32).at[pix].min(i_eff)
    return winner


def render_attr_min(
    xyz: jnp.ndarray,
    attr: jnp.ndarray,
    attr_bits: int,
    resolution: Tuple[int, int] = (200, 400),
    point_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Z-buffered splat of a small integer attribute in ONE scatter pass.

    For consumers that need only a per-pixel point attribute (e.g. the
    histogram trim needs the winner's colour BIN, not its index or RGB),
    the whole resolve packs into a single 32-bit scatter-min key:

        [ tap priority (4b) | distance (28-attr_bits msb of f32) | attr ]

    mapped through the sign-flip trick so unsigned key order survives the
    int32 scatter-min.  Winner selection matches :func:`render_winner`
    except that distances are compared at (28-attr_bits)-bit precision and
    exact truncated-distance ties resolve by smallest attribute instead of
    smallest point index — both tie classes are measure-zero for real
    float distances (the reference's own tie behaviour is write-order).

    Args:
      attr: (N,) int32 in [0, 2**attr_bits).
    Returns:
      (H*W,) int32 attribute per pixel, -1 where no point splats.
    """
    return attr_min_decode(
        attr_min_keys(xyz, attr, attr_bits, resolution, point_mask), attr_bits
    )


def _shift_min_rows(buf: jnp.ndarray, d: int, sentinel) -> jnp.ndarray:
    """S[r] = min over r0 with clip(r0+d, 0, H-1) == r of buf[r0] (|d| <= 1).

    The clipped tap write means a border row absorbs the rows that clamp
    onto it; everywhere else it is a plain shift with a sentinel fill.
    """
    if d == 0:
        return buf
    H = buf.shape[0]
    sent_row = jnp.full((1,) + buf.shape[1:], sentinel, buf.dtype)
    if d == 1:
        return jnp.concatenate(
            [sent_row, buf[: H - 2], jnp.minimum(buf[H - 2 : H - 1], buf[H - 1 :])]
        )
    return jnp.concatenate(
        [jnp.minimum(buf[:1], buf[1:2]), buf[2:], sent_row]
    )


def attr_min_keys(
    xyz: jnp.ndarray,
    attr: jnp.ndarray,
    attr_bits: int,
    resolution: Tuple[int, int] = (200, 400),
    point_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """The per-pixel packed min-key buffer behind :func:`render_attr_min`.

    The splat's tap dilation is NOT scattered: TPU scatter-min throughput is
    row-count-bound (~5x slower per row than gather, docs/PERFORMANCE.md),
    so only the N center taps scatter — one (dist | attr) key per point —
    and the 9-tap dilation becomes a dense stencil over the pixel grid:
    per tap, a clip-aware shifted copy of the center buffer with the tap's
    priority prepended, min-reduced elementwise (VPU work, fused by XLA).
    Winners are bit-identical to scattering all 9N taps: the priority
    prefix is monotone in the center key, so min-over-taps of
    min-over-points == min over (point, tap) pairs.

    Exposed separately because the result is ASSOCIATIVE under elementwise
    min: buffers of disjoint point subsets combine with ``jnp.minimum`` (or
    a ``jax.lax.pmin`` across a sharded point axis) into exactly the buffer
    of the union — min commutes with the monotone per-tap map, so this is
    how the multi-chip histogram trim renders a sharded cloud
    (parallel/fused.py).

    Returns (H*W,) int32 keys in sign-flipped unsigned order; pass through
    :func:`attr_min_decode` to recover the winning attribute.
    """
    H, W = resolution
    N = xyz.shape[0]

    dist = jnp.sqrt(jnp.sum(xyz * xyz, axis=-1))
    coords = spherical_project(xyz)  # (N, 2) in [-1, 1]
    px = (coords[..., 0] + 1.0) / 2.0 * (W - 1)
    py = (coords[..., 1] + 1.0) / 2.0 * (H - 1)
    col0 = jnp.floor(px).astype(jnp.int32)
    row0 = jnp.floor(py).astype(jnp.int32)

    # center key: truncated distance then attr (28 bits, positive int32)
    dist_bits_n = 28 - attr_bits
    dist_bits = jax.lax.bitcast_convert_type(
        jnp.maximum(dist, 0.0), jnp.uint32
    ) >> (32 - dist_bits_n)
    key28 = ((dist_bits << attr_bits) | attr.astype(jnp.uint32)).astype(
        jnp.int32
    )
    sent28 = jnp.int32((1 << 28) - 1)
    if point_mask is not None:
        key28 = jnp.where(point_mask, key28, sent28)
    buf = (
        jnp.full((H * W,), sent28, jnp.int32)
        .at[row0 * W + col0]
        .min(key28)
        .reshape(H, W)
    )

    # dense tap dilation: min over the 9 priorities of shifted center keys
    miss_u = jnp.uint32(0xFFFFFFFF)
    out_u = jnp.full((H, W), miss_u, jnp.uint32)
    for p, dr, dc in _TAPS:
        s = _shift_min_rows(buf, dr, sent28)
        s = _shift_min_rows(s.T, dc, sent28).T
        cand = (jnp.uint32(p) << 28) | s.astype(jnp.uint32)
        cand = jnp.where(s == sent28, miss_u, cand)
        out_u = jnp.minimum(out_u, cand)

    # unsigned order -> signed order (for scatter/pmin consumers downstream)
    return jax.lax.bitcast_convert_type(
        out_u ^ jnp.uint32(0x80000000), jnp.int32
    ).reshape(-1)


def attr_min_decode(min_keys: jnp.ndarray, attr_bits: int) -> jnp.ndarray:
    """Winning attribute per pixel from an :func:`attr_min_keys` buffer
    (-1 where no point splats)."""
    sentinel_u = jnp.uint32(0xFFFFFFFF)
    min_u = jax.lax.bitcast_convert_type(min_keys, jnp.uint32) ^ jnp.uint32(
        0x80000000
    )
    hit = min_u != sentinel_u
    out = (min_u & jnp.uint32((1 << attr_bits) - 1)).astype(jnp.int32)
    return jnp.where(hit, out, -1)


def render_pano(
    xyz: jnp.ndarray,
    rgb: jnp.ndarray,
    resolution: Tuple[int, int] = (200, 400),
    point_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Render a panorama from a coloured point cloud.

    Args:
      xyz: (N, 3) points in the camera frame.
      rgb: (N, 3) colours in [0, 1].
      resolution: (H, W) output size.
      point_mask: optional (N,) bool; False points are not splatted (used for
        padded clouds under jit's static-shape constraint).

    Returns:
      (H, W, 3) float image in [0, 255] (the reference returns image*255;
      ``utils.py:200``). Background pixels are 0.
    """
    H, W = resolution
    N = xyz.shape[0]
    winner = render_winner(xyz, resolution, point_mask)
    hit = winner < N
    safe_winner = jnp.where(hit, winner, 0)
    img = jnp.where(hit[:, None], jnp.take(rgb, safe_winner, axis=0), 0.0)
    return img.reshape(H, W, 3) * 255.0

"""Two-stage candidate trimming: brute-force loss table, then histogram match.

Re-design of the reference's ``trim_input_loss`` / ``trim_input_hist_secondary``
/ ``make_input`` (reference: ``utils.py:462-629``).  The reference's slowest
code path — an O(|trans|x|rot|) *Python loop* of full-cloud projections
(utils.py:484-499) — becomes one jitted, vmapped evaluation chunked with
``lax.map`` to bound memory; the per-candidate panorama renders + blockwise
histogram intersections of stage two (utils.py:546-581) are likewise one
batched program.

Deliberate behaviour deltas (documented; SURVEY §2 "latent bugs"):
  * empty-mask candidates score +inf (the reference produces NaN via a mean
    over an empty selection, relying on NaN-sorts-last);
  * stage two computes every block independently (the reference ``break``s
    out of a row on the first empty block and reuses *stale* per-block
    values from the previous candidate).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..loss import Pose, sampling_loss_packed
from ..ops.histogram import bin_ids, block_histograms
from ..ops.sampling import pack_bilinear_blocks
from ..ops.pano import attr_min_decode, attr_min_keys
from ..ops.rotation import rot_from_ypr
from .candidates import generate_rot_points, generate_trans_points

__all__ = ["score_pose_grid", "trim_by_loss", "hist_scores", "trim_by_hist", "make_input"]

_HIST_BINS = (8, 8, 8)  # reference utils.py:531


def _pad_rows(a: jnp.ndarray, multiple: int) -> Tuple[jnp.ndarray, int]:
    n = a.shape[0]
    pad = (-n) % multiple
    if pad:
        a = jnp.concatenate([a, jnp.broadcast_to(a[:1], (pad,) + a.shape[1:])])
    return a, n


@functools.partial(jax.jit, static_argnames=("chunk", "masked", "wrap"))
def _score_pairs(
    img, xyz, rgb, pair_t, pair_ypr, point_mask=None, *, chunk=16,
    masked=False, wrap=False,
):
    pm = point_mask if masked else None
    H, W, _ = img.shape
    blocks = pack_bilinear_blocks(img, wrap=wrap)  # one gather per sample

    def one(args):
        t, ypr = args
        pose = Pose(t=t, yaw=ypr[0], pitch=ypr[1], roll=ypr[2])
        return sampling_loss_packed(pose, xyz, rgb, blocks, H, W, pm,
                                    wrap=wrap)

    k = pair_t.shape[0]
    tc = pair_t.reshape(k // chunk, chunk, 3)
    yc = pair_ypr.reshape(k // chunk, chunk, 3)
    scores = jax.lax.map(lambda c: jax.vmap(lambda t, y: one((t, y)))(c[0], c[1]), (tc, yc))
    return scores.reshape(-1)


def score_pose_grid(
    img: jnp.ndarray,
    xyz: jnp.ndarray,
    rgb: jnp.ndarray,
    trans: jnp.ndarray,
    rot: jnp.ndarray,
    point_mask: Optional[jnp.ndarray] = None,
    chunk: int = 16,
    valid: Optional[jnp.ndarray] = None,
    wrap: bool = False,
) -> jnp.ndarray:
    """Loss table over the trans x rot grid, flattened trans-major.

    Equivalent to the reference's loss_table (utils.py:481-499) but computed
    as one on-device program: ~1.8k full-cloud projections collapse from a
    Python loop into chunked vmap.  ``valid`` optionally marks padding rows
    of ``trans`` whose scores are forced to +inf (static-shape reuse across
    rooms).
    """
    T, R = trans.shape[0], rot.shape[0]
    pair_t = jnp.repeat(trans, R, axis=0)
    pair_r = jnp.tile(rot, (T, 1))
    pair_t, n = _pad_rows(pair_t, chunk)
    pair_r, _ = _pad_rows(pair_r, chunk)
    scores = _score_pairs(
        img, xyz, rgb, pair_t, pair_r, point_mask,
        chunk=chunk, masked=point_mask is not None, wrap=wrap,
    )[:n]
    if valid is not None:
        scores = jnp.where(jnp.repeat(valid, R), scores, jnp.inf)
    return scores


# The one definition of which init criteria exist — imported by the fused
# (pipeline.py), sharded (parallel/fused.py), and harness (_use_fused)
# paths so validation and routing can never drift apart.  The reference
# only survives 'loss_histogram' (every other value falls into an
# UnboundLocalError, utils.py:625-627); 'loss' is this repo's working
# extension (top num_input by stage-1 loss, histogram stage skipped).
SUPPORTED_CRITERIA = ("loss_histogram", "loss")


def check_criterion(criterion: str) -> None:
    """Raise a clear ValueError for criteria outside SUPPORTED_CRITERIA."""
    if criterion not in SUPPORTED_CRITERIA:
        raise ValueError(
            f"criterion={criterion!r} not supported "
            "('loss_histogram' or 'loss')"
        )


def trim_by_loss(
    img, xyz, rgb, trans, rot, num_keep: int, point_mask=None, valid=None,
    wrap=False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Keep the num_keep (trans, rot) pairs with lowest sampling loss.

    Parity with reference trim_input_loss (utils.py:462-507): flat argsort of
    the table, pair recovered by divmod over len(rot).
    """
    R = rot.shape[0]
    scores = score_pose_grid(img, xyz, rgb, trans, rot, point_mask,
                             valid=valid, wrap=wrap)
    k = min(num_keep, scores.shape[0])
    idx = jnp.argsort(scores)[:k]
    return jnp.take(trans, idx // R, axis=0), jnp.take(rot, idx % R, axis=0)


@functools.partial(
    jax.jit, static_argnames=("num_split_h", "num_split_w", "chunk", "masked")
)
def hist_scores(
    img: jnp.ndarray,
    xyz: jnp.ndarray,
    rgb: jnp.ndarray,
    trans: jnp.ndarray,
    ypr: jnp.ndarray,
    point_mask=None,
    *,
    num_split_h: int,
    num_split_w: int,
    chunk: int = 8,
    masked: bool = False,
) -> jnp.ndarray:
    """Blockwise histogram-intersection score per candidate (higher=better).

    Parity with reference trim_input_hist_secondary (utils.py:510-588):
      * query-image block histograms over img_mask (nonzero pixels);
      * candidate pano rendered at the SAME resolution, block histograms
        over proj_mask & img_mask;
      * per-block normalized-histogram intersection, zeroed when either
        block selection is empty;
      * only middle block rows h in [1, num_split_h-2] contribute;
      * score = sum / (num_split_h * num_split_w).
    """
    return hist_scores_core(
        img, xyz, rgb, trans, ypr,
        point_mask if masked else None, num_split_h, num_split_w, chunk,
    )


def hist_scores_core(
    img, xyz, rgb, trans, ypr, pm, num_split_h, num_split_w, chunk,
    point_axis: Optional[str] = None,
    use_mxu_hist: Optional[bool] = None,
):
    """Jit-inlinable body of hist_scores (shared with pipeline.py).

    The histogram trim needs only the winning point's colour BIN per pixel,
    so the z-buffer resolves through ops.pano.render_attr_min: ONE packed
    scatter-min per candidate instead of a full RGB render plus re-binning
    (equivalent up to measure-zero distance ties; exactness-tested against
    the naive render-then-histogram formulation in tests/test_init.py).

    Points whose colour is exactly black count as background, matching the
    reference's proj==0 mask on the rendered image — encoded by binning
    them to a sentinel (bin 512) excluded from the histogram.

    ``point_axis`` names a shard_map mesh axis along which the cloud
    (xyz/rgb/pm) is sharded: each shard's local z-buffer key buffer is then
    combined with one ``pmin`` into the exact global z-buffer (scatter-min is
    associative), making the result bit-identical to the single-device path.

    ``use_mxu_hist`` routes the per-block winner-bin histograms through the
    batched one-hot MXU kernel (kernels/histogram_mxu.py) instead of XLA's
    scatter-add — bit-exact (both sum exact 0/1 integers in f32).  Default
    (None) auto-selects it on TPU for >=128k-pixel images (the Stanford
    512x256 init image included — measured 0.301 -> 0.274 s/pano end-to-
    end), where the scatter-add's row-count bound dominates the whole
    stage (docs/PERFORMANCE.md).
    """
    H, W, _ = img.shape
    sh, sw = num_split_h, num_split_w
    nb = _HIST_BINS[0] * _HIST_BINS[1] * _HIST_BINS[2]
    if use_mxu_hist is None:
        use_mxu_hist = (
            point_axis is None
            and H * W >= (1 << 17)
            and jax.default_backend() == "tpu"
        )

    img255 = img * 255.0
    img_mask = jnp.sum(img255 == 0.0, axis=-1) != 3
    img_h, img_c = block_histograms(img255, img_mask, _HIST_BINS, sh, sw)
    img_hn = img_h / jnp.maximum(img_c, 1e-12)[:, None]

    row_ids = jnp.arange(sh * sw) // sw
    middle = (row_ids >= 1) & (row_ids <= sh - 2)

    # per-point colour bins; pure-black points -> sentinel bin nb
    rgb255 = rgb * 255.0
    rgb_bins = bin_ids(rgb255, _HIST_BINS).astype(jnp.int32)
    rgb_black = jnp.sum(rgb255 == 0.0, axis=-1) == 3
    rgb_bins = jnp.where(rgb_black, nb, rgb_bins)

    bh, bw = H // sh, W // sw
    prow = jnp.arange(H)[:, None] // bh
    pcol = jnp.arange(W)[None, :] // bw
    in_grid = (prow < sh) & (pcol < sw)
    block_flat = (
        (jnp.clip(prow, 0, sh - 1) * sw + jnp.clip(pcol, 0, sw - 1))
        .reshape(-1)
        .astype(jnp.int32)
    )
    pix_ok = img_mask.reshape(-1) & in_grid.reshape(-1)

    bh_, bw_ = H // sh, W // sw

    def _block_layout(flat):
        """(H*W,) -> (sh*sw, bh*bw): pixels regrouped per block (remainder
        rows/cols outside the block grid are sliced off, same set the
        in_grid mask excludes)."""
        return (
            flat.reshape(H, W)[: sh * bh_, : sw * bw_]
            .reshape(sh, bh_, sw, bw_)
            .transpose(0, 2, 1, 3)
            .reshape(sh * sw, bh_ * bw_)
        )

    def one(t, y):
        R = rot_from_ypr(y)
        cam = jnp.einsum("nj,kj->nk", xyz - t, R, precision="highest")
        # 10 bits cover bins 0..512 (sentinel included)
        keys = attr_min_keys(cam, rgb_bins, 10, (H, W), pm)
        if point_axis is not None:
            keys = jax.lax.pmin(keys, point_axis)
        pbin = attr_min_decode(keys, 10)  # (H*W,)
        valid = (pbin >= 0) & (pbin < nb) & pix_ok
        if use_mxu_hist:
            from ..kernels import block_histogram_pallas

            ids = jnp.clip(_block_layout(pbin), 0, nb - 1)
            msk = _block_layout(valid).astype(jnp.float32)
            ph = block_histogram_pallas(ids, msk, nb)
        else:
            ph = (
                jnp.zeros((sh * sw * nb,), jnp.float32)
                .at[block_flat * nb + jnp.clip(pbin, 0, nb - 1)]
                .add(valid.astype(jnp.float32))
            ).reshape(sh * sw, nb)
        pc = ph.sum(-1)
        phn = ph / jnp.maximum(pc, 1e-12)[:, None]
        inter = jnp.minimum(phn, img_hn).sum(-1)  # (sh*sw,)
        ok = (pc > 0) & (img_c > 0) & middle
        return jnp.sum(inter * ok) / (sh * sw)

    k = trans.shape[0]
    tc = trans.reshape(k // chunk, chunk, 3)
    yc = ypr.reshape(k // chunk, chunk, 3)
    scores = jax.lax.map(lambda c: jax.vmap(one)(c[0], c[1]), (tc, yc))
    return scores.reshape(-1)


def trim_by_hist(
    img, xyz, rgb, trans, rot, num_input: int,
    num_split_h: int, num_split_w: int, point_mask=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Keep the num_input candidates with the highest histogram score."""
    trans_p, n = _pad_rows(trans, 8)
    rot_p, _ = _pad_rows(rot, 8)
    scores = hist_scores(
        img, xyz, rgb, trans_p, rot_p, point_mask,
        num_split_h=num_split_h, num_split_w=num_split_w,
        masked=point_mask is not None,
    )[:n]
    k = min(num_input, int(scores.shape[0]))
    idx = jnp.argsort(scores)[-k:][::-1]
    return jnp.take(trans, idx, axis=0), jnp.take(rot, idx, axis=0)


def make_input(
    img: jnp.ndarray,
    xyz: jnp.ndarray,
    rgb: jnp.ndarray,
    num_input: int,
    init_dict: Dict,
    criterion: str = "loss_histogram",
    num_intermediate: Optional[int] = None,
    point_mask: Optional[jnp.ndarray] = None,
    seed: int = 2,
    wrap: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """Full initialization: candidate grids -> loss trim -> histogram trim.

    Orchestration parity with reference make_input (utils.py:591-629).
    Returns numpy (num_input, 3) translation and rotation starting points.

    ``criterion='loss_histogram'`` (the default, and the only value that
    works in the reference — every other value falls through its branch
    ladder into an UnboundLocalError, utils.py:625-627) runs the loss trim
    then the histogram trim.  ``criterion='loss'`` is a WORKING EXTENSION:
    the top ``num_input`` pairs by sampling loss directly, skipping the
    per-candidate pano render + histogram stage entirely
    (``num_intermediate`` is unused) — a faster init at some robustness
    cost in texture-ambiguous rooms.  Anything else raises ValueError.
    """
    check_criterion(criterion)

    xyz_np_full = np.asarray(xyz)
    if point_mask is not None:
        # Candidate grids are quantile/extent statistics of the cloud —
        # padding rows (zeros) must not pollute them.
        mask_np = np.asarray(point_mask)
        xyz_np = xyz_np_full[mask_np]
    else:
        mask_np = None
        xyz_np = xyz_np_full
    rot = jnp.asarray(generate_rot_points(init_dict))
    trans = jnp.asarray(generate_trans_points(xyz_np, init_dict))

    in_xyz, in_rgb, in_mask = xyz, rgb, point_mask
    rate = init_dict.get("sample_rate_for_init")
    if rate is not None:
        # Bernoulli keep with p = 1/rate (reference utils.py:618-620) —
        # applied to xyz, rgb AND the validity mask together.  The draw is
        # over the VALID points (so the kept subset is independent of any
        # padding), then scattered back to the padded layout.
        rng = np.random.default_rng(seed)
        draw = rng.random(xyz_np.shape[0]) < (1.0 / rate)
        if mask_np is None:
            keep = draw
        else:
            keep = np.zeros(xyz_np_full.shape[0], bool)
            keep[mask_np] = draw
        keep_j = jnp.asarray(keep)
        # Keep shapes static: drop points via the mask instead of gathering
        # a dynamic subset.
        in_mask = keep_j if point_mask is None else (point_mask & keep_j)

    if criterion == "loss":
        t2, r2 = trim_by_loss(
            img, in_xyz, in_rgb, trans, rot, num_input, in_mask, wrap=wrap
        )
        return np.asarray(t2), np.asarray(r2)

    t1, r1 = trim_by_loss(
        img, in_xyz, in_rgb, trans, rot, num_intermediate, in_mask, wrap=wrap
    )
    t2, r2 = trim_by_hist(
        img, in_xyz, in_rgb, t1, r1, num_input,
        init_dict["num_split_h"], init_dict["num_split_w"], in_mask,
    )
    return np.asarray(t2), np.asarray(r2)

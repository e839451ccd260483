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

__all__ = [
    "score_pose_grid", "trim_by_loss", "hist_scores", "trim_by_hist",
    "make_input", "HistPlan", "build_hist_plan", "hist_scores_from_planes",
    "hist_plan_bytes",
]

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


def _resolve_mxu_hist(use_mxu_hist, H, W, point_axis=None):
    """The one auto-routing rule for the MXU block-histogram kernel."""
    if use_mxu_hist is not None:
        return use_mxu_hist
    return (
        point_axis is None
        and H * W >= (1 << 17)
        and jax.default_backend() == "tpu"
    )


def _hist_query_side(img):
    """Query-image-dependent inputs of the histogram trim (shared by the
    live-splat path and the precomputed-plane path): normalized per-block
    query histograms, per-block counts, and the valid-pixel selector
    (nonzero query pixels inside the block grid)."""
    H, W, _ = img.shape
    img255 = img * 255.0
    img_mask = jnp.sum(img255 == 0.0, axis=-1) != 3
    return img255, img_mask


def _point_bins(rgb, nb):
    """Per-point colour bins; pure-black points -> sentinel bin ``nb``
    (counted as background, matching the reference's proj==0 mask)."""
    rgb255 = rgb * 255.0
    rgb_bins = bin_ids(rgb255, _HIST_BINS).astype(jnp.int32)
    rgb_black = jnp.sum(rgb255 == 0.0, axis=-1) == 3
    return jnp.where(rgb_black, nb, rgb_bins)


def _block_grid(H, W, sh, sw, img_mask):
    """Pixel -> block bookkeeping shared by the trim paths.

    Returns ``(pix_ok, block_flat, block_layout)``: the valid-pixel
    selector (nonzero query pixels inside the block grid), the flat
    per-pixel block index, and the (H*W,) -> (sh*sw, bh*bw) regrouping
    function (remainder rows/cols outside the block grid are sliced off,
    the same set ``pix_ok`` excludes)."""
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

    def block_layout(flat):
        return (
            flat.reshape(H, W)[: sh * bh, : sw * bw]
            .reshape(sh, bh, sw, bw)
            .transpose(0, 2, 1, 3)
            .reshape(sh * sw, bh * bw)
        )

    return pix_ok, block_flat, block_layout


def _score_from_pbin(pbin, pix_ok, img_hn, img_c, middle, block_flat,
                     block_layout, nb, sh, sw, use_mxu_hist):
    """Blockwise histogram-intersection score of ONE candidate given its
    per-pixel winner colour bins ``pbin`` (the splat's decoded output, or a
    precomputed plane).  Bit-identical regardless of pbin's provenance:
    out-of-range bins (no splat / sentinel) are masked out of the histogram
    either way."""
    valid = (pbin >= 0) & (pbin < nb) & pix_ok
    if use_mxu_hist:
        from ..kernels import block_histogram_pallas

        ids = jnp.clip(block_layout(pbin), 0, nb - 1)
        msk = block_layout(valid).astype(jnp.float32)
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
    use_mxu_hist = _resolve_mxu_hist(use_mxu_hist, H, W, point_axis)

    img255, img_mask = _hist_query_side(img)
    img_h, img_c = block_histograms(img255, img_mask, _HIST_BINS, sh, sw)
    img_hn = img_h / jnp.maximum(img_c, 1e-12)[:, None]

    row_ids = jnp.arange(sh * sw) // sw
    middle = (row_ids >= 1) & (row_ids <= sh - 2)

    rgb_bins = _point_bins(rgb, nb)
    pix_ok, block_flat, _block_layout = _block_grid(H, W, sh, sw, img_mask)

    def one(t, y):
        R = rot_from_ypr(y)
        cam = jnp.einsum("nj,kj->nk", xyz - t, R, precision="highest")
        # 10 bits cover bins 0..512 (sentinel included)
        keys = attr_min_keys(cam, rgb_bins, 10, (H, W), pm)
        if point_axis is not None:
            keys = jax.lax.pmin(keys, point_axis)
        pbin = attr_min_decode(keys, 10)  # (H*W,)
        return _score_from_pbin(
            pbin, pix_ok, img_hn, img_c, middle, block_flat, _block_layout,
            nb, sh, sw, use_mxu_hist,
        )

    k = trans.shape[0]
    tc = trans.reshape(k // chunk, chunk, 3)
    yc = ypr.reshape(k // chunk, chunk, 3)
    scores = jax.lax.map(lambda c: jax.vmap(one)(c[0], c[1]), (tc, yc))
    return scores.reshape(-1)


class HistPlan:
    """Room-static stage-2 winner-bin planes (the splat, hoisted per room).

    The histogram trim's z-buffer splat depends only on room-static inputs —
    the cloud geometry, the candidate GRID poses, and the point colour bins
    (reference utils.py:510-588 renders the cloud at each candidate) — the
    query only enters through its own block histograms and its nonzero-pixel
    mask, both applied AFTER the splat.  So the per-pair winner bin per
    pixel can be precomputed once per (room, init-image size): per query,
    stage 2 gathers the selected candidates' planes and runs only the block
    histograms (the MXU kernel on TPU), skipping the scatter-min + stencil
    entirely.  Exact: the stored plane IS the live splat's decoded output.

    Invalid per-query colour rebinds (sharpen_color / match_color change the
    point bins) — the harness gates planes off there.  ``planes`` is
    (n_pairs, H*W) int16 in make_pairs order over the REAL (unpadded) grid
    rows; out-of-range/background pixels store the sentinel bin 512.
    """

    def __init__(self, planes, n_pairs: int, height: int, width: int):
        self.planes = planes
        self.n_pairs = int(n_pairs)
        self.height = int(height)
        self.width = int(width)

    def tree_flatten(self):
        return (self.planes,), (self.n_pairs, self.height, self.width)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], *aux)

    @property
    def nbytes(self) -> int:
        return self.planes.nbytes


jax.tree_util.register_pytree_node(
    HistPlan, HistPlan.tree_flatten, HistPlan.tree_unflatten
)


def hist_plan_bytes(n_pairs: int, height: int, width: int) -> int:
    """Exact HBM footprint of a HistPlan (int16 bin per pixel per pair)."""
    return n_pairs * height * width * 2


@functools.partial(
    jax.jit, static_argnames=("height", "width", "chunk", "masked")
)
def _build_hist_planes(
    xyz, rgb, pair_t, pair_r, point_mask, *, height, width, chunk, masked
):
    pm = point_mask if masked else None
    nb = _HIST_BINS[0] * _HIST_BINS[1] * _HIST_BINS[2]
    rgb_bins = _point_bins(rgb, nb)

    def one(t, y):
        R = rot_from_ypr(y)
        cam = jnp.einsum("nj,kj->nk", xyz - t, R, precision="highest")
        keys = attr_min_keys(cam, rgb_bins, 10, (height, width), pm)
        pbin = attr_min_decode(keys, 10)
        ok = (pbin >= 0) & (pbin < nb)
        return jnp.where(ok, pbin, nb).astype(jnp.int16)

    k = pair_t.shape[0]
    tc = pair_t.reshape(k // chunk, chunk, 3)
    yc = pair_r.reshape(k // chunk, chunk, 3)
    planes = jax.lax.map(lambda c: jax.vmap(one)(c[0], c[1]), (tc, yc))
    return planes.reshape(k, height * width)


def build_hist_plan(
    xyz, rgb, trans, rot, height: int, width: int, point_mask=None,
    chunk: int = 8,
) -> HistPlan:
    """Precompute stage-2 winner-bin planes for every (trans, rot) grid pair.

    ``trans`` must be the REAL (unpadded) grid rows — the plan covers the
    leading ``len(trans) * len(rot)`` pairs of the padded pair list, the
    same contract as the slab plan.  Build cost is one splat per pair
    (~the cost of num_pairs / num_intermediate live stage-2 evaluations);
    the planes stay on device (never fetched to host).
    """
    trans = jnp.asarray(trans, jnp.float32)
    rot = jnp.asarray(rot, jnp.float32)
    T, R = trans.shape[0], rot.shape[0]
    pair_t = jnp.repeat(trans, R, axis=0)
    pair_r = jnp.tile(rot, (T, 1))
    pad = (-(T * R)) % chunk
    if pad:
        pair_t = jnp.concatenate([pair_t, jnp.broadcast_to(pair_t[:1], (pad, 3))])
        pair_r = jnp.concatenate([pair_r, jnp.broadcast_to(pair_r[:1], (pad, 3))])
    planes = _build_hist_planes(
        jnp.asarray(xyz, jnp.float32), jnp.asarray(rgb, jnp.float32),
        pair_t, pair_r, point_mask,
        height=height, width=width, chunk=chunk,
        masked=point_mask is not None,
    )[: T * R]
    return HistPlan(planes, T * R, height, width)


def hist_scores_from_planes(
    img, planes_sel, num_split_h, num_split_w, chunk,
    use_mxu_hist: Optional[bool] = None,
):
    """hist_scores_core from precomputed winner-bin planes (jit-inlinable).

    ``planes_sel`` is (k, H*W) int16 — the selected candidates' rows of a
    HistPlan, already padded to a ``chunk`` multiple.  Bit-identical to the
    live-splat path: the planes store the splat's decoded bins, and the
    query-side mask / block histograms / intersection are the same code
    (_score_from_pbin)."""
    H, W, _ = img.shape
    sh, sw = num_split_h, num_split_w
    nb = _HIST_BINS[0] * _HIST_BINS[1] * _HIST_BINS[2]
    use_mxu_hist = _resolve_mxu_hist(use_mxu_hist, H, W)

    img255, img_mask = _hist_query_side(img)
    img_h, img_c = block_histograms(img255, img_mask, _HIST_BINS, sh, sw)
    img_hn = img_h / jnp.maximum(img_c, 1e-12)[:, None]
    row_ids = jnp.arange(sh * sw) // sw
    middle = (row_ids >= 1) & (row_ids <= sh - 2)
    pix_ok, block_flat, block_layout = _block_grid(H, W, sh, sw, img_mask)

    def one(plane):
        return _score_from_pbin(
            plane.astype(jnp.int32), pix_ok, img_hn, img_c, middle,
            block_flat, block_layout, nb, sh, sw, use_mxu_hist,
        )

    k = planes_sel.shape[0]
    pc = planes_sel.reshape(k // chunk, chunk, -1)
    scores = jax.lax.map(lambda c: jax.vmap(one)(c), pc)
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

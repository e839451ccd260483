"""Video-rate sequential localization (tracking) — production extension.

The reference treats every OmniScenes video frame as an independent
from-scratch localization (reference ``localize.py:300-536`` loops frames
of ``handheld_*_scene_*`` videos through the full init + 6x100-iteration
descent).  Consecutive video frames are centimetres apart, so a descent
warm-started from the previous frame's pose needs no candidate search and
a fraction of the iterations — this module adds that mode as an OPT-IN
extension (no reference counterpart; batch-harness and serving behavior
are unchanged unless a previous pose is supplied).

Design:
  * :func:`track_step` — one warm-started descent (solver.descend with a
    single candidate), pure and stateless.
  * :class:`Tracker` — per-sequence state: previous pose, a rolling
    window of accepted losses, and divergence recovery.  When a frame's
    final loss exceeds ``recover_ratio`` x the rolling median (tracking
    lost: occlusion, teleport, motion blur), the tracker calls the
    injected ``recover`` callable (typically a full
    ``pipeline.localize_query``) and re-seeds from its answer.

The descent program is the same jitted scan/vmap the batch path uses, so
the first tracked frame per (image shape, budget) pays one compile and
every later frame is pure device time.
"""

from __future__ import annotations

import functools
import os
from collections import deque
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .color import color_match_device, color_mod_device
from .solver import SolveResult, descend

__all__ = [
    "TrackResult",
    "track_step",
    "track_step_fetched",
    "track_step_prepped_fetched",
    "track_steps_batched",
    "track_kwargs",
    "DivergenceGate",
    "Tracker",
    "ypr_from_rot",
]


def ypr_from_rot(rot: np.ndarray) -> np.ndarray:
    """Euler angles (yaw, pitch, roll) of R = RZ(yaw) @ RY(pitch) @ RX(roll).

    Inverse of :func:`piccolo_tpu.ops.rotation.rot_from_ypr` (the
    framework-wide convention, loss.py) — used to continue tracking from a
    full-pipeline recovery, which reports only the rotation matrix.
    Gimbal-degenerate poses (|pitch| = pi/2) resolve with roll = 0.
    """
    R = np.asarray(rot, np.float64)
    pitch = -np.arcsin(np.clip(R[2, 0], -1.0, 1.0))
    if abs(R[2, 0]) < 1.0 - 1e-9:
        yaw = np.arctan2(R[1, 0], R[0, 0])
        roll = np.arctan2(R[2, 1], R[2, 2])
    else:  # cos(pitch) = 0: yaw and roll are coupled; put it all in yaw
        yaw = np.arctan2(-R[0, 1], R[1, 1])
        roll = 0.0
    return np.array([yaw, pitch, roll], np.float32)


class TrackResult(NamedTuple):
    t: np.ndarray          # (3,) translation
    ypr: np.ndarray        # (3,) yaw/pitch/roll
    rot: np.ndarray        # (3, 3)
    loss: float            # final sampling loss
    recovered: bool        # True when this frame re-ran the full pipeline
    lost: bool             # True when divergence was detected but no
                           # recovery callable was available


def track_step(
    img: jnp.ndarray,
    xyz: jnp.ndarray,
    rgb: jnp.ndarray,
    prev_t: jnp.ndarray,
    prev_ypr: jnp.ndarray,
    lo: jnp.ndarray,
    hi: jnp.ndarray,
    point_mask: Optional[jnp.ndarray] = None,
    *,
    num_iter: int = 30,
    lr: float = 0.03,
    patience: int = 3,
    factor: float = 0.5,
    table_dtype: str = "auto",
    wrap: bool = False,
    exec_cache_dir=None,
) -> SolveResult:
    """One warm-started descent from the previous frame's pose.

    Same semantics as :func:`piccolo_tpu.solver.descend` with a single
    candidate; the tracking defaults (30 iterations, lr 0.03 with a fast
    0.5x plateau) are tuned for centimetre-scale inter-frame motion and
    were gated on a measured synthetic trajectory (docs/ROUND3.md
    "Tracking").  Use the full reference budget (100, 0.1, 5, 0.8/0.9)
    when frames may be far apart.  ``exec_cache_dir`` routes the descent
    through the serialized-executable cache (utils.exec_cache) so a
    fresh process loads the compiled program instead of recompiling.
    """
    call = descend
    if exec_cache_dir:
        from .solver import DESCEND_STATICS
        from .utils.exec_cache import aot_call

        call = functools.partial(
            aot_call, descend, DESCEND_STATICS,
            os.path.expanduser(str(exec_cache_dir)),
        )
    return call(
        img, xyz, rgb,
        jnp.asarray(prev_t, jnp.float32).reshape(1, 3),
        jnp.asarray(prev_ypr, jnp.float32).reshape(1, 3),
        lo, hi, point_mask,
        num_iter=num_iter, lr=lr, patience=patience, factor=factor,
        masked=point_mask is not None,
        table_dtype=table_dtype, wrap=wrap,
    )


def _unpack_fetched(res: SolveResult):
    """Marshal a single-candidate SolveResult through ONE device fetch.

    Each fetch costs ~25 ms on a remote-tunnel frontend, so fetching the
    four result arrays separately would dominate the 30-iteration descent
    (measured 126 -> 38 ms/frame).  Returns ``(t (3,), ypr (3,),
    rot (3, 3), loss)`` as host arrays.
    """
    flat = np.asarray(jnp.concatenate([
        res.t[0], res.ypr[0], res.rot[0].ravel(), res.loss[0:1]
    ]))
    return flat[0:3], flat[3:6], flat[6:15].reshape(3, 3), float(flat[15])


def track_step_fetched(
    img, xyz, rgb, prev_t, prev_ypr, lo, hi, point_mask=None, **kw
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, float]:
    """:func:`track_step` + the one-fetch result marshalling — shared by
    Tracker, the serving track path, and the CLI loop."""
    res = track_step(img, xyz, rgb, prev_t, prev_ypr, lo, hi, point_mask,
                     **kw)
    return _unpack_fetched(res)


# exported so utils.exec_cache.aot_call can split static from dynamic
# kwargs (same pattern as pipeline.LOCALIZE_QUERY_STATICS)
_TRACK_PREPPED_STATICS = (
    "masked", "num_iter", "lr", "patience", "factor", "table_dtype",
    "wrap",
)


@functools.partial(jax.jit, static_argnames=_TRACK_PREPPED_STATICS)
def _track_prepped(
    img_u8, cdf, sharpen, xyz, rgb, prev_t, prev_ypr, lo, hi, point_mask,
    *, masked, num_iter, lr, patience, factor, table_dtype, wrap,
):
    """uint8 frame -> normalize (+ device color match/sharpen) -> descend,
    fused in one program.  ``sharpen`` (a ``color.SharpenState`` of device
    arrays, or None) mirrors the host prep's ``color_mod`` AFTER the
    optional match (harness finish_omniscenes_images order; reference
    localize.py:396-410) and rebinds the CLOUD colors for this frame's
    descent, exactly as the host path rebinds ``rgb_used``."""
    img = img_u8.astype(jnp.float32) / 255.0
    if cdf is not None:
        img = color_match_device(img, cdf[0], cdf[1])
        # mirror the batch path's uint8 requantization of the matched
        # image (harness finish_omniscenes_images; reference
        # localize.py:403-405) so tracked and seed frames see the same
        # quantization regime
        img = jnp.floor(img * 255.0) / 255.0
    if sharpen is not None:
        # the host applies color_mod to the float matched image — its
        # internal trunc-to-uint8 sees the same integers as the
        # requantized image above, so the chain is order-exact
        img, rgb = color_mod_device(img, sharpen)
    res = descend(
        img, xyz, rgb,
        jnp.asarray(prev_t, jnp.float32).reshape(1, 3),
        jnp.asarray(prev_ypr, jnp.float32).reshape(1, 3),
        lo, hi, point_mask,
        num_iter=num_iter, lr=lr, patience=patience, factor=factor,
        masked=masked, table_dtype=table_dtype, wrap=wrap,
    )
    return jnp.concatenate([
        res.t[0], res.ypr[0], res.rot[0].ravel(), res.loss[0:1]
    ])


def track_step_prepped_fetched(
    img_u8, xyz, rgb, prev_t, prev_ypr, lo, hi, point_mask=None,
    *, cdf=None, sharpen=None, num_iter: int = 30, lr: float = 0.03,
    patience: int = 3, factor: float = 0.5, table_dtype: str = "auto",
    wrap: bool = False, exec_cache_dir=None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, float]:
    """Tracked-frame fast path: the uint8 panorama goes in, the per-frame
    image prep runs ON THE DEVICE fused with the descent, one fetch out.

    The batch path's host prep is per-pixel numpy (normalize + optional
    ``color_match``) — ~0.5 s/frame at 2048x1024, an order of magnitude
    more than the tracked descent itself.  Here the host only decodes the
    frame: the uint8 image (4x smaller transfer than float32) is
    normalized on-device, optionally CDF-matched against the room's
    precomputed :func:`piccolo_tpu.color.cloud_color_cdf` arrays, and fed
    to the same descent program, all in ONE jit.

    Args:
      img_u8: (H, W, 3) uint8 frame (host array or already device-put).
      cdf: None, or the room's ``(values, quant)`` pair from
        ``cloud_color_cdf`` — enables the ``match_color`` semantics.
      sharpen: None, or the room's ``color.cloud_sharpen_state`` — enables
        the ``sharpen_color`` semantics (joint Y-histogram equalization,
        rebinding BOTH the frame and the cloud colors on-device).  Applied
        after the match, in host-prep order.
      exec_cache_dir: None, or the serialized-executable cache directory
        (``utils.exec_cache``): a process restart loads the tracked
        program in ~4 s instead of recompiling (~13 s measured on the
        axon frontend, paid at frame 1 of the first video —
        docs/ROUND4.md §1/§3).
      Everything else: as :func:`track_step`.
    """
    call = _track_prepped
    if exec_cache_dir:
        from .utils.exec_cache import aot_call

        call = functools.partial(
            aot_call, _track_prepped, _TRACK_PREPPED_STATICS,
            os.path.expanduser(str(exec_cache_dir)),
        )
    flat = np.asarray(call(
        img_u8, cdf, sharpen, xyz, rgb, prev_t, prev_ypr, lo, hi,
        point_mask,
        masked=point_mask is not None, num_iter=num_iter, lr=lr,
        patience=patience, factor=factor, table_dtype=table_dtype,
        wrap=wrap,
    ))
    return flat[0:3], flat[3:6], flat[6:15].reshape(3, 3), float(flat[15])


@functools.partial(jax.jit, static_argnames=_TRACK_PREPPED_STATICS)
def _track_batch(
    imgs, xyz, rgb, prev_t, prev_ypr, lo, hi, point_mask,
    *, masked, num_iter, lr, patience, factor, table_dtype, wrap,
):
    """K tracked steps as ONE program: vmap of the scalar tracked descent
    over per-stream (image, warm-start pose), room state shared."""

    def one(img, t, y):
        res = descend(
            img, xyz, rgb, t.reshape(1, 3), y.reshape(1, 3), lo, hi,
            point_mask, num_iter=num_iter, lr=lr, patience=patience,
            factor=factor, masked=masked, table_dtype=table_dtype,
            wrap=wrap,
        )
        return jnp.concatenate([
            res.t[0], res.ypr[0], res.rot[0].ravel(), res.loss[0:1]
        ])

    return jax.vmap(one)(imgs, prev_t, prev_ypr)


def track_steps_batched(
    imgs, xyz, rgb, prev_ts, prev_yprs, lo, hi, point_mask=None,
    *, num_iter: int = 30, lr: float = 0.03, patience: int = 3,
    factor: float = 0.5, table_dtype: str = "auto", wrap: bool = False,
    exec_cache_dir=None,
):
    """Multi-stream tracking: K streams' tracked frames in ONE device
    program with ONE fetch (no reference counterpart — the reference has
    no tracking at all; multi-camera serving is a production extension).

    Serving N cameras means N concurrent tracked sequences against the
    same room; stepping them one at a time serializes K dispatches + K
    ~25 ms fetches per frame round on a remote-tunnel frontend.  This is
    the house-style batch (CLAUDE.md: batched = vmap of the scalar
    program): ``jax.vmap`` over per-stream (frame, warm-start pose) with
    the room cloud/box shared, so K streams cost ~one frame's device
    time plus one fetch.  Results match per-stream :func:`track_step` to
    f32 batching noise (guarded in tests/test_tracking.py).

    Args:
      imgs: (K, H, W, 3) float frames in [0, 1] — one per stream, same
        shape (streams of one room share the camera profile; serving
        groups by room + shape before batching).
      prev_ts / prev_yprs: (K, 3) warm-start poses.
      Everything else: as :func:`track_step` (shared across streams).

    Returns:
      list of K ``(t (3,), ypr (3,), rot (3, 3), loss)`` host tuples, in
      stream order.
    """
    call = _track_batch
    if exec_cache_dir:
        from .utils.exec_cache import aot_call

        call = functools.partial(
            aot_call, _track_batch, _TRACK_PREPPED_STATICS,
            os.path.expanduser(str(exec_cache_dir)),
        )
    flat = np.asarray(call(
        jnp.asarray(imgs), xyz, rgb,
        jnp.asarray(prev_ts, jnp.float32).reshape(-1, 3),
        jnp.asarray(prev_yprs, jnp.float32).reshape(-1, 3),
        lo, hi, point_mask,
        masked=point_mask is not None, num_iter=num_iter, lr=lr,
        patience=patience, factor=factor, table_dtype=table_dtype,
        wrap=wrap,
    ))
    return [
        (flat[k, 0:3], flat[k, 3:6], flat[k, 6:15].reshape(3, 3),
         float(flat[k, 15]))
        for k in range(flat.shape[0])
    ]


def track_kwargs(cfg) -> dict:
    """The per-frame descent budget from config keys (one resolution point
    for the CLI loop and serving: track_num_iter/lr/patience/factor +
    descent_table/seam_wrap)."""
    from .config import cfg_get

    return dict(
        num_iter=cfg_get(cfg, "track_num_iter", 30),
        lr=cfg_get(cfg, "track_lr", 0.03),
        patience=cfg_get(cfg, "track_patience", 3),
        factor=cfg_get(cfg, "track_factor", 0.5),
        table_dtype=cfg_get(cfg, "descent_table", "auto"),
        wrap=cfg_get(cfg, "seam_wrap", False),
    )


class DivergenceGate:
    """Rolling-median divergence policy, shared by Tracker and the CLI loop.

    A frame diverges when its loss is non-finite, or when ``window``
    losses have been accepted and the new loss exceeds ``ratio`` x their
    rolling median.  The sampling loss is scene-scaled, so the threshold
    is relative, never absolute.  Non-finite losses are never accepted
    into the window (one NaN would poison every later median — NaN
    comparisons are False, silently disabling recovery forever).
    """

    def __init__(self, window: int = 8, ratio: float = 3.0):
        self._losses: deque = deque(maxlen=int(window))
        self._ratio = float(ratio)

    def diverged(self, loss: float) -> bool:
        return not np.isfinite(loss) or (
            len(self._losses) == self._losses.maxlen
            and loss > self._ratio * float(np.median(self._losses))
        )

    def accept(self, loss: float) -> None:
        if np.isfinite(loss):
            self._losses.append(float(loss))

    def reset(self) -> None:
        self._losses.clear()


class Tracker:
    """Sequential localizer over one room: warm descent + recovery.

    Args:
      xyz/rgb/point_mask: the room cloud (padded, with validity mask).
      lo/hi: the translation clamp box (ops.quantile.cloud_bounds).
      init_t/init_ypr: the first frame's pose — typically from one full
        ``pipeline.localize_query`` on frame 0.
      recover: optional callable ``(img) -> (t, ypr)`` running the full
        init+descent pipeline; invoked when divergence is detected.
      recover_ratio: a frame diverges when its final loss exceeds this
        multiple of the rolling-median accepted loss (and ``window``
        frames have been accepted).  The sampling loss is scene-scaled,
        so the threshold is relative, never absolute.
      window: rolling-median window length.
      num_iter/lr/patience/factor/table_dtype/wrap: per-frame descent
        budget (see :func:`track_step`).
      exec_cache_dir: optional serialized-executable cache directory
        (see :func:`track_step`).
    """

    def __init__(
        self,
        xyz: jnp.ndarray,
        rgb: jnp.ndarray,
        lo: jnp.ndarray,
        hi: jnp.ndarray,
        init_t: np.ndarray,
        init_ypr: np.ndarray,
        point_mask: Optional[jnp.ndarray] = None,
        *,
        recover: Optional[Callable[[jnp.ndarray], Tuple[np.ndarray, np.ndarray]]] = None,
        recover_ratio: float = 3.0,
        window: int = 8,
        num_iter: int = 30,
        lr: float = 0.03,
        patience: int = 3,
        factor: float = 0.5,
        table_dtype: str = "auto",
        wrap: bool = False,
        exec_cache_dir=None,
    ):
        self._cloud = (xyz, rgb, point_mask)
        self._box = (lo, hi)
        self._pose = (
            np.asarray(init_t, np.float32).reshape(3),
            np.asarray(init_ypr, np.float32).reshape(3),
        )
        self._recover = recover
        self._gate = DivergenceGate(window=window, ratio=recover_ratio)
        self._kw = dict(
            num_iter=num_iter, lr=lr, patience=patience, factor=factor,
            table_dtype=table_dtype, wrap=wrap,
            exec_cache_dir=exec_cache_dir,
        )

    @property
    def pose(self) -> Tuple[np.ndarray, np.ndarray]:
        """The current (t, ypr) estimate."""
        return self._pose

    def _descend(self, img) -> Tuple[np.ndarray, np.ndarray, np.ndarray, float]:
        xyz, rgb, mask = self._cloud
        return track_step_fetched(
            img, xyz, rgb, self._pose[0], self._pose[1],
            self._box[0], self._box[1], mask, **self._kw,
        )

    def update(self, img: jnp.ndarray) -> TrackResult:
        """Track one frame; returns the accepted pose for it."""
        t, ypr, rot, loss = self._descend(img)
        recovered = lost = False
        if self._gate.diverged(loss):
            if self._recover is None:
                lost = True
                if not np.isfinite(loss):
                    # a NaN/inf pose is unusable even as a "suspect" result
                    # — hold the previous pose instead of poisoning the
                    # next frame's warm start
                    t, ypr = self._pose
                    from .ops.rotation import rot_from_ypr

                    rot = np.asarray(rot_from_ypr(jnp.asarray(ypr)))
            else:
                rt, rypr = self._recover(img)
                self._pose = (
                    np.asarray(rt, np.float32).reshape(3),
                    np.asarray(rypr, np.float32).reshape(3),
                )
                t, ypr, rot, loss = self._descend(img)
                if not np.isfinite(loss):
                    # refinement from the fresh seed blew up: answer with
                    # the recovery pose itself
                    t, ypr = self._pose
                    from .ops.rotation import rot_from_ypr

                    rot = np.asarray(rot_from_ypr(jnp.asarray(ypr)))
                self._gate.reset()  # the loss regime may have shifted
                recovered = True
        self._pose = (t, ypr)
        if not lost:
            self._gate.accept(loss)
        return TrackResult(
            t=t, ypr=ypr, rot=rot, loss=loss, recovered=recovered, lost=lost
        )

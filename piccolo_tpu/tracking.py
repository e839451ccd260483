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

from collections import deque
from typing import Callable, NamedTuple, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from .solver import SolveResult, descend

__all__ = ["TrackResult", "track_step", "Tracker", "ypr_from_rot"]


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
) -> SolveResult:
    """One warm-started descent from the previous frame's pose.

    Same semantics as :func:`piccolo_tpu.solver.descend` with a single
    candidate; the tracking defaults (30 iterations, lr 0.03 with a fast
    0.5x plateau) are tuned for centimetre-scale inter-frame motion and
    were gated on a measured synthetic trajectory (docs/ROUND3.md
    "Tracking").  Use the full reference budget (100, 0.1, 5, 0.8/0.9)
    when frames may be far apart.
    """
    return descend(
        img, xyz, rgb,
        jnp.asarray(prev_t, jnp.float32).reshape(1, 3),
        jnp.asarray(prev_ypr, jnp.float32).reshape(1, 3),
        lo, hi, point_mask,
        num_iter=num_iter, lr=lr, patience=patience, factor=factor,
        masked=point_mask is not None,
        table_dtype=table_dtype, wrap=wrap,
    )


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
    ):
        self._cloud = (xyz, rgb, point_mask)
        self._box = (lo, hi)
        self._pose = (
            np.asarray(init_t, np.float32).reshape(3),
            np.asarray(init_ypr, np.float32).reshape(3),
        )
        self._recover = recover
        self._ratio = float(recover_ratio)
        self._losses: deque = deque(maxlen=window)
        self._kw = dict(
            num_iter=num_iter, lr=lr, patience=patience, factor=factor,
            table_dtype=table_dtype, wrap=wrap,
        )

    @property
    def pose(self) -> Tuple[np.ndarray, np.ndarray]:
        """The current (t, ypr) estimate."""
        return self._pose

    def _descend(self, img) -> Tuple[np.ndarray, np.ndarray, np.ndarray, float]:
        xyz, rgb, mask = self._cloud
        res = track_step(
            img, xyz, rgb, self._pose[0], self._pose[1],
            self._box[0], self._box[1], mask, **self._kw,
        )
        # ONE device->host fetch: each fetch costs ~25 ms on a remote-tunnel
        # frontend (serve.py uses the same marshalling), and per-frame fetch
        # overhead would otherwise dominate the 30-iteration descent
        flat = np.asarray(jnp.concatenate([
            res.t[0], res.ypr[0], res.rot[0].ravel(), res.loss[0:1]
        ]))
        return flat[0:3], flat[3:6], flat[6:15].reshape(3, 3), float(flat[15])

    def update(self, img: jnp.ndarray) -> TrackResult:
        """Track one frame; returns the accepted pose for it."""
        t, ypr, rot, loss = self._descend(img)
        diverged = (
            len(self._losses) == self._losses.maxlen
            and loss > self._ratio * float(np.median(self._losses))
        )
        recovered = lost = False
        if diverged:
            if self._recover is None:
                lost = True  # keep the (suspect) warm result, flag it
            else:
                rt, rypr = self._recover(img)
                self._pose = (
                    np.asarray(rt, np.float32).reshape(3),
                    np.asarray(rypr, np.float32).reshape(3),
                )
                t, ypr, rot, loss = self._descend(img)
                self._losses.clear()  # the loss regime may have shifted
                recovered = True
        self._pose = (t, ypr)
        if not lost:
            self._losses.append(loss)
        return TrackResult(
            t=t, ypr=ypr, rot=rot, loss=loss, recovered=recovered, lost=lost
        )

"""Synthetic scene factory for tests, benchmarks, and demo datasets.

The strongest oracle this problem offers is self-consistency: render a
panorama from a synthetic colored cloud at a known pose, then require the
pipeline to recover that pose (SURVEY §4).  No dataset download needed.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from .ops.pano import render_pano
from .ops.rotation import rot_from_ypr

__all__ = [
    "make_room",
    "make_cluttered_room",
    "render_at",
    "random_pose_inside",
    "pose_outside_occluders",
]


def make_room(
    rng: np.random.Generator,
    n_per_wall: int = 4000,
    size: Tuple[float, float, float] = (6.0, 4.0, 3.0),
    texture: str = "gradient",
) -> Tuple[np.ndarray, np.ndarray]:
    """A colored box room: six walls with distinct color patterns.

    Returns (xyz (N,3) f32, rgb (N,3) f32 in [0,1]) with N = 6*n_per_wall.
    ``texture='checker'`` overlays a checkerboard for sharper photometric
    gradients (helps init discrimination on tiny scenes).
    """
    pts, cols = [], []
    for axis, sign in [(0, 1), (0, -1), (1, 1), (1, -1), (2, 1), (2, -1)]:
        uv = rng.random((n_per_wall, 2)).astype(np.float32)
        p = np.empty((n_per_wall, 3), np.float32)
        dims = [d for d in range(3) if d != axis]
        p[:, dims[0]] = (uv[:, 0] - 0.5) * size[dims[0]]
        p[:, dims[1]] = (uv[:, 1] - 0.5) * size[dims[1]]
        p[:, axis] = sign * size[axis] / 2
        base = np.zeros(3, np.float32)
        base[axis] = 0.75 if sign > 0 else 0.25
        c = base[None, :] + 0.5 * np.stack(
            [uv[:, 0], uv[:, 1], uv[:, 0] * uv[:, 1]], 1
        )
        if texture == "checker":
            checker = ((uv[:, 0] * 6).astype(int) + (uv[:, 1] * 6).astype(int)) % 2
            c = c * (0.6 + 0.4 * checker[:, None])
        pts.append(p)
        cols.append(np.clip(c, 0.05, 1.0).astype(np.float32))
    return np.concatenate(pts), np.concatenate(cols)


def make_cluttered_room(
    rng: np.random.Generator,
    n_per_wall: int = 4000,
    size: Tuple[float, float, float] = (6.0, 4.0, 3.0),
    n_occluders: int = 3,
    n_per_occluder: int = 2000,
    texture: str = "checker",
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """A box room with colored box occluders standing inside it.

    Occluders introduce real occlusion and parallax — a harder init/descent
    oracle than the bare walls of :func:`make_room` (points behind an
    occluder must lose the z-buffer and must not poison the sampling loss).

    Returns (xyz, rgb, occluders) with occluders an (K, 2, 3) array of
    axis-aligned (lo, hi) corners, for pose-sampling rejection.
    """
    xyz, rgb = make_room(rng, n_per_wall=n_per_wall, size=size, texture=texture)
    pts, cols, boxes = [xyz], [rgb], []
    half = np.array(size, np.float32) / 2
    for k in range(n_occluders):
        dims = (0.3 + rng.random(3) * np.array([0.7, 0.7, 1.2])).astype(
            np.float32
        )
        # stand on the floor somewhere not hugging a wall
        center_xy = (rng.random(2).astype(np.float32) - 0.5) * (
            np.array(size[:2], np.float32) - dims[:2] - 0.6
        )
        lo = np.array(
            [center_xy[0] - dims[0] / 2, center_xy[1] - dims[1] / 2, -half[2]],
            np.float32,
        )
        hi = lo + dims
        boxes.append(np.stack([lo, hi]))
        hue = np.zeros(3, np.float32)
        hue[k % 3] = 0.8
        hue[(k + 1) % 3] = 0.3 + 0.4 * rng.random()
        for axis in range(3):
            for sign in (0, 1):
                m = n_per_occluder // 6
                p = (lo + rng.random((m, 3)).astype(np.float32) * dims)
                p[:, axis] = hi[axis] if sign else lo[axis]
                uv = p[:, [d for d in range(3) if d != axis]]
                c = np.clip(
                    hue[None, :]
                    + 0.25 * np.sin(12.0 * uv[:, :1])
                    + 0.15 * uv[:, 1:2],
                    0.05,
                    1.0,
                ).astype(np.float32)
                pts.append(p)
                cols.append(np.broadcast_to(c, (m, 3)).copy())
    return (
        np.concatenate(pts),
        np.concatenate(cols),
        np.stack(boxes) if boxes else np.zeros((0, 2, 3), np.float32),
    )


def pose_outside_occluders(
    rng: np.random.Generator,
    occluders: np.ndarray,
    size: Tuple[float, float, float] = (6.0, 4.0, 3.0),
    margin: float = 0.35,
    clearance: float = 0.25,
    yaw_only: bool = True,
) -> Tuple[np.ndarray, np.ndarray]:
    """random_pose_inside, rejecting poses inside (or hugging) an occluder."""
    grown = occluders.copy()
    if grown.size:
        grown[:, 0] -= clearance
        grown[:, 1] += clearance
    for _ in range(200):
        t, ypr = random_pose_inside(rng, size, margin, yaw_only)
        if not grown.size or not bool(
            np.any(np.all((t >= grown[:, 0]) & (t <= grown[:, 1]), axis=1))
        ):
            return t, ypr
    raise RuntimeError("no free pose found among occluders")


def render_at(
    xyz: np.ndarray,
    rgb: np.ndarray,
    t: np.ndarray,
    ypr: np.ndarray,
    resolution: Tuple[int, int] = (256, 512),
) -> jnp.ndarray:
    """Render the GT panorama at pose (t, ypr). Returns (H,W,3) in [0,1]."""
    R = rot_from_ypr(jnp.asarray(ypr, jnp.float32))
    cam = jnp.einsum(
        "nj,kj->nk",
        jnp.asarray(xyz, jnp.float32) - jnp.asarray(t, jnp.float32),
        R,
        precision="highest",
    )
    return render_pano(cam, jnp.asarray(rgb, jnp.float32), resolution) / 255.0


def random_pose_inside(
    rng: np.random.Generator,
    size: Tuple[float, float, float] = (6.0, 4.0, 3.0),
    margin: float = 0.35,
    yaw_only: bool = True,
) -> Tuple[np.ndarray, np.ndarray]:
    """A random pose well inside the room's quantile box."""
    half = np.array(size, np.float32) / 2
    lo = -half * (1 - margin)
    hi = half * (1 - margin)
    t = (rng.random(3).astype(np.float32) * (hi - lo) + lo).astype(np.float32)
    yaw = rng.random() * 2 * np.pi
    if yaw_only:
        ypr = np.array([yaw, 0.0, 0.0], np.float32)
    else:
        ypr = np.array(
            [yaw, (rng.random() - 0.5) * 0.3, (rng.random() - 0.5) * 0.3],
            np.float32,
        )
    return t, ypr

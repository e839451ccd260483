"""Synthetic scene factory for tests, benchmarks, and demo datasets.

The strongest oracle this problem offers is self-consistency: render a
panorama from a synthetic colored cloud at a known pose, then require the
pipeline to recover that pose (SURVEY §4).  No dataset download needed.
"""

from __future__ import annotations

import dataclasses
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
    "RoomScene",
    "make_scene",
    "scene_cloud",
    "scene_pose",
    "raycast_pano",
    "IMAGE_REALISM_ARMS",
    "CLOUD_REALISM_ARMS",
    "apply_image_realism",
    "apply_cloud_realism",
]


# The six axis-aligned faces of a box, as (axis, sign) pairs.
_WALL_FACES = ((0, 1), (0, -1), (1, 1), (1, -1), (2, 1), (2, -1))


def _other_dims(axis: int) -> Tuple[int, int]:
    d = [i for i in range(3) if i != axis]
    return d[0], d[1]


def _wall_color(u, v, axis: int, sign: int, texture: str) -> np.ndarray:
    """Wall texture as a pure function of normalized surface coords.

    ``u``/``v`` in [0, 1] parameterize the wall; the same function colors
    both sampled cloud points (:func:`make_room`) and ray-cast panorama
    pixels (:func:`raycast_pano`), which is what makes the dense oracle's
    photometry consistent with its cloud.
    """
    u = np.asarray(u, np.float32)
    v = np.asarray(v, np.float32)
    base = np.zeros(3, np.float32)
    base[axis] = 0.75 if sign > 0 else 0.25
    c = base + 0.5 * np.stack([u, v, u * v], -1)
    if texture == "checker":
        checker = ((u * 6).astype(int) + (v * 6).astype(int)) % 2
        c = c * (0.6 + 0.4 * checker[..., None])
    return np.clip(c, 0.05, 1.0).astype(np.float32)


def _occluder_color(p: np.ndarray, axis: int, hue: np.ndarray) -> np.ndarray:
    """Occluder-face texture as a pure function of world position.

    Same functional form as :func:`make_cluttered_room`'s face colors
    (striped sinusoid over the two in-face world coords).
    """
    d0, d1 = _other_dims(axis)
    c = (
        hue.astype(np.float32)
        + 0.25 * np.sin(12.0 * np.asarray(p[..., d0], np.float32))[..., None]
        + 0.15 * np.asarray(p[..., d1], np.float32)[..., None]
    )
    return np.clip(c, 0.05, 1.0).astype(np.float32)


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
    for axis, sign in _WALL_FACES:
        uv = rng.random((n_per_wall, 2)).astype(np.float32)
        p = np.empty((n_per_wall, 3), np.float32)
        dims = [d for d in range(3) if d != axis]
        p[:, dims[0]] = (uv[:, 0] - 0.5) * size[dims[0]]
        p[:, dims[1]] = (uv[:, 1] - 0.5) * size[dims[1]]
        p[:, axis] = sign * size[axis] / 2
        pts.append(p)
        cols.append(_wall_color(uv[:, 0], uv[:, 1], axis, sign, texture))
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


# ---------------------------------------------------------------------------
# Dense ray-cast oracle
# ---------------------------------------------------------------------------
#
# The splat oracle above renders the CLOUD as the GT panorama, so pixel
# coverage scales with point count (docs/PERFORMANCE.md "Synthetic-oracle
# density"): at 2048x1024 a 60k-point cloud lights ~25% of the pixels and the
# sampling loss sees mostly invalid black samples — an oracle artifact, not a
# property of real data (camera captures are dense everywhere).  The ray-cast
# oracle removes the artifact at the source: panoramas are rendered by
# closed-form ray -> axis-aligned-box intersection against the SAME textured
# surfaces the cloud samples (shared `_wall_color`/`_occluder_color`), so
# every pixel is a true camera sample regardless of cloud size, occlusion is
# geometric (not z-buffer splatting), and color-processing paths
# (match_color / sharpen_color / synth_* ablations) behave as they do on real
# captures instead of on mostly-black splats.


@dataclasses.dataclass(frozen=True)
class RoomScene:
    """A box room with axis-aligned box occluders and procedural textures.

    ``occluders`` is (K, 2, 3) of (lo, hi) corners; ``occluder_hues`` (K, 3)
    base colors.  The scene is the single source of truth for geometry AND
    photometry: :func:`scene_cloud` and :func:`raycast_pano` both evaluate
    the same texture functions.

    ``center`` translates the whole scene in world coordinates: occluder
    corners are stored in WORLD coords (already offset), wall geometry is
    ``center ± size/2``.  A floor-referenced scene (``make_scene(...,
    floor_at_zero=True)``) puts the floor at z=0 like real capture datasets,
    so the reference's ``z_prior = 1.5`` camera-height prior applies
    unmodified (reference configs/omniscenes.ini:14, utils.py:393-399).
    """

    size: Tuple[float, float, float]
    texture: str = "checker"
    occluders: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros((0, 2, 3), np.float32)
    )
    occluder_hues: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros((0, 3), np.float32)
    )
    center: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(3, np.float32)
    )


def make_scene(
    rng: np.random.Generator,
    size: Tuple[float, float, float] = (6.0, 4.0, 3.0),
    n_occluders: int = 0,
    texture: str = "checker",
    floor_at_zero: bool = False,
) -> RoomScene:
    """Random scene: floor-standing box occluders away from the walls."""
    half = np.array(size, np.float32) / 2
    center = np.array(
        [0.0, 0.0, half[2] if floor_at_zero else 0.0], np.float32
    )
    boxes, hues = [], []
    for k in range(n_occluders):
        dims = (0.3 + rng.random(3) * np.array([0.7, 0.7, 1.2])).astype(
            np.float32
        )
        center_xy = (rng.random(2).astype(np.float32) - 0.5) * (
            np.array(size[:2], np.float32) - dims[:2] - 0.6
        )
        lo = center + np.array(
            [center_xy[0] - dims[0] / 2, center_xy[1] - dims[1] / 2, -half[2]],
            np.float32,
        )
        boxes.append(np.stack([lo, lo + dims]))
        hue = np.zeros(3, np.float32)
        hue[k % 3] = 0.8
        hue[(k + 1) % 3] = 0.3 + 0.4 * rng.random()
        hues.append(hue)
    return RoomScene(
        size=tuple(float(s) for s in size),
        texture=texture,
        occluders=np.stack(boxes) if boxes else np.zeros((0, 2, 3), np.float32),
        occluder_hues=np.stack(hues) if hues else np.zeros((0, 3), np.float32),
        center=center,
    )


def scene_pose(
    scene: RoomScene,
    rng: np.random.Generator,
    margin: float = 0.35,
    yaw_only: bool = True,
    z_range: Tuple[float, float] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Random camera pose inside the scene, outside every occluder.

    ``z_range`` optionally pins the camera height band in WORLD z (e.g.
    (1.3, 1.7) for a handheld capture in a floor-referenced scene).
    """
    for _ in range(200):
        t, ypr = random_pose_inside(rng, scene.size, margin, yaw_only)
        t = t + np.asarray(scene.center, np.float32)
        if z_range is not None:
            t[2] = np.float32(
                z_range[0] + rng.random() * (z_range[1] - z_range[0])
            )
        occ = scene.occluders
        if not occ.size or not bool(
            np.any(np.all((t >= occ[:, 0] - 0.25) & (t <= occ[:, 1] + 0.25),
                          axis=1))
        ):
            return t, ypr
    raise RuntimeError("no free pose found among occluders")


def _scene_faces(scene: RoomScene):
    """All textured faces: 6 walls + 6 per occluder, with areas."""
    size = np.array(scene.size, np.float32)
    faces = []
    for axis, sign in _WALL_FACES:
        d0, d1 = _other_dims(axis)
        faces.append(("wall", axis, sign, None, float(size[d0] * size[d1])))
    for k in range(scene.occluders.shape[0]):
        lo, hi = scene.occluders[k]
        ext = hi - lo
        for axis, sign in _WALL_FACES:
            d0, d1 = _other_dims(axis)
            faces.append(("occ", axis, sign, k, float(ext[d0] * ext[d1])))
    return faces


def scene_cloud(
    scene: RoomScene, rng: np.random.Generator, n_points: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Sample an area-weighted surface point cloud with scene textures.

    Like a real scan, occluded wall points are still present (a scanner sees
    behind furniture from other viewpoints even when the query camera can't).
    """
    faces = _scene_faces(scene)
    areas = np.array([f[4] for f in faces], np.float64)
    counts = rng.multinomial(n_points, areas / areas.sum())
    size = np.array(scene.size, np.float32)
    half = size / 2
    pts, cols = [], []
    for (kind, axis, sign, k, _area), m in zip(faces, counts):
        if m == 0:
            continue
        uv = rng.random((m, 2)).astype(np.float32)
        d0, d1 = _other_dims(axis)
        p = np.empty((m, 3), np.float32)
        ctr = np.asarray(scene.center, np.float32)
        if kind == "wall":
            p[:, d0] = (uv[:, 0] - 0.5) * size[d0] + ctr[d0]
            p[:, d1] = (uv[:, 1] - 0.5) * size[d1] + ctr[d1]
            p[:, axis] = sign * half[axis] + ctr[axis]
            c = _wall_color(uv[:, 0], uv[:, 1], axis, sign, scene.texture)
        else:
            lo, hi = scene.occluders[k]
            p[:, d0] = lo[d0] + uv[:, 0] * (hi[d0] - lo[d0])
            p[:, d1] = lo[d1] + uv[:, 1] * (hi[d1] - lo[d1])
            p[:, axis] = hi[axis] if sign > 0 else lo[axis]
            c = _occluder_color(p, axis, scene.occluder_hues[k])
        pts.append(p)
        cols.append(c)
    return np.concatenate(pts), np.concatenate(cols)


def raycast_pano(
    scene: RoomScene,
    t: np.ndarray,
    ypr: np.ndarray,
    resolution: Tuple[int, int] = (256, 512),
) -> np.ndarray:
    """Render a DENSE equirectangular panorama by ray casting the scene.

    Every pixel center is inverse-projected to a camera ray using the exact
    conventions of :func:`piccolo_tpu.ops.projection.spherical_project` and
    grid_sample's align_corners=False pixel transform (pixel (r, c) center
    <=> normalized coords ((2c+1)/W - 1, (2r+1)/H - 1)), so a cloud point
    visible at pose (t, ypr) bilinearly samples its own surface color.
    The camera pose convention matches the reference (X_cam = R(X - t),
    reference omniloc.py:141-142).

    Returns (H, W, 3) float32 in [0, 1]; every pixel is lit (no black
    border/background — colors clip to >= 0.05 like the cloud's).
    """
    H, W = resolution
    # pixel centers -> normalized coords -> (theta, phi) -> camera-frame ray
    x_n = (2.0 * np.arange(W, dtype=np.float64) + 1.0) / W - 1.0
    y_n = (2.0 * np.arange(H, dtype=np.float64) + 1.0) / H - 1.0
    phi = np.pi * (1.0 - x_n)          # azimuth in [0, 2pi)
    theta = np.pi * (y_n + 1.0) / 2.0  # polar from +z in (0, pi)
    st, ct = np.sin(theta), np.cos(theta)
    az = phi - np.pi
    d_cam = np.empty((H, W, 3), np.float64)
    d_cam[..., 0] = st[:, None] * np.cos(az)[None, :]
    d_cam[..., 1] = st[:, None] * np.sin(az)[None, :]
    d_cam[..., 2] = ct[:, None]
    R = np.asarray(rot_from_ypr(jnp.asarray(ypr, jnp.float32))).astype(
        np.float64
    )
    d = d_cam @ R  # d_world = R^T d_cam
    o = np.asarray(t, np.float64).reshape(3)
    ctr = np.asarray(scene.center, np.float64)

    # room walls: exit intersection of the AABB interior (scene-local coords)
    half = np.asarray(scene.size, np.float64) / 2
    with np.errstate(divide="ignore", invalid="ignore"):
        bound = np.where(d > 0, half, -half)
        t_ax = (bound - (o - ctr)) / d
    t_ax = np.where(np.isfinite(t_ax) & (t_ax > 0), t_ax, np.inf)
    wall_axis = np.argmin(t_ax, axis=-1)
    best_t = np.take_along_axis(t_ax, wall_axis[..., None], -1)[..., 0]
    occ_id = np.full((H, W), -1, np.int32)
    occ_axis = np.zeros((H, W), np.int32)

    # occluders: nearest entry intersection (camera is outside every box)
    for k in range(scene.occluders.shape[0]):
        lo = scene.occluders[k, 0].astype(np.float64)
        hi = scene.occluders[k, 1].astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            t1 = (lo - o) / d
            t2 = (hi - o) / d
        tn_ax = np.minimum(t1, t2)
        tf_ax = np.maximum(t1, t2)
        tn = np.max(tn_ax, axis=-1)
        tf = np.min(tf_ax, axis=-1)
        hit = (tn < tf) & (tn > 1e-9) & (tn < best_t)
        best_t = np.where(hit, tn, best_t)
        occ_id = np.where(hit, k, occ_id)
        occ_axis = np.where(hit, np.argmax(tn_ax, axis=-1), occ_axis)

    p = o + best_t[..., None] * d
    img = np.zeros((H, W, 3), np.float32)
    size = np.asarray(scene.size, np.float64)
    for axis, sign in _WALL_FACES:
        m = (occ_id < 0) & (wall_axis == axis) & (
            (d[..., axis] > 0) if sign > 0 else (d[..., axis] <= 0)
        )
        if not m.any():
            continue
        d0, d1 = _other_dims(axis)
        u = (p[..., d0][m] - ctr[d0]) / size[d0] + 0.5
        v = (p[..., d1][m] - ctr[d1]) / size[d1] + 0.5
        img[m] = _wall_color(u, v, axis, sign, scene.texture)
    for k in range(scene.occluders.shape[0]):
        for axis in range(3):
            m = (occ_id == k) & (occ_axis == axis)
            if not m.any():
                continue
            img[m] = _occluder_color(p[m], axis, scene.occluder_hues[k])
    return img


# -- capture-realism degradations (round 5) ---------------------------------
#
# The raycast oracle renders IDEAL captures; real Stanford2D-3D-S /
# OmniScenes data carries sensor noise, JPEG blocking, motion blur,
# vignetting, and Matterport-style cloud defects (depth noise, scan
# holes) — the reference consumes such captures directly
# (/root/reference/localize.py:167-171, 380-410).  These helpers degrade a
# rendered query image / sampled cloud so eval_synth and
# make_synth_dataset can run adversarial-realism arms, with the SAME
# degradation feedable to the unmodified reference for matched pairs.

IMAGE_REALISM_ARMS = ("noise", "jpeg", "blur", "vignette")
CLOUD_REALISM_ARMS = ("depth-noise", "holes")


def apply_image_realism(u8: np.ndarray, arm: str, val: float,
                        rng: np.random.Generator) -> np.ndarray:
    """Degrade a uint8 capture like a real camera/codec would.

    Arms (val = strength):
      noise:    per-pixel Gaussian sensor noise, sigma = val in [0, 1]
                units (default 0.02 ~ a mid-ISO handheld capture).
      jpeg:     encode/decode at quality = int(val) (default 60).
      blur:     horizontal motion blur, kernel length = int(val) px
                (default 9) — panning blur in panorama azimuth.
      vignette: elevation falloff, gain 1 - val * (2*row/H - 1)^2
                (default 0.4) — the equirect analog of lens vignetting.
    """
    img = np.asarray(u8)
    if img.dtype != np.uint8:
        raise ValueError("apply_image_realism expects a uint8 capture")
    if arm == "noise":
        f = img.astype(np.float32) / 255.0
        f = f + rng.normal(0.0, float(val), f.shape).astype(np.float32)
        return np.clip(np.round(f * 255.0), 0, 255).astype(np.uint8)
    if arm == "jpeg":
        import cv2

        ok, enc = cv2.imencode(
            ".jpg", cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
            [int(cv2.IMWRITE_JPEG_QUALITY), int(val)],
        )
        assert ok
        return cv2.cvtColor(cv2.imdecode(enc, cv2.IMREAD_COLOR),
                            cv2.COLOR_BGR2RGB)
    if arm == "blur":
        # horizontal box blur with PERIODIC wrap (panorama azimuth is
        # periodic; cv2.filter2D cannot wrap columns)
        k = max(3, int(val) | 1)
        f = img.astype(np.float32)
        acc = np.zeros_like(f)
        for off in range(-(k // 2), k // 2 + 1):
            acc += np.roll(f, off, axis=1)
        return np.clip(np.round(acc / k), 0, 255).astype(np.uint8)
    if arm == "vignette":
        H = img.shape[0]
        y = (2.0 * np.arange(H, dtype=np.float32) / max(H - 1, 1)) - 1.0
        gain = 1.0 - float(val) * y * y
        f = img.astype(np.float32) * gain[:, None, None]
        return np.clip(np.round(f), 0, 255).astype(np.uint8)
    raise ValueError(f"unknown image realism arm {arm!r} "
                     f"(have {IMAGE_REALISM_ARMS})")


def apply_cloud_realism(xyz: np.ndarray, rgb: np.ndarray, arm: str,
                        val: float, rng: np.random.Generator):
    """Degrade a sampled cloud like a real scanner would.

    Arms (val = strength):
      depth-noise: Gaussian positional noise, sigma = val metres
                   (default 0.01) — depth-sensor jitter.
      holes:       remove val (default 0.10) of the points as 8 random
                   spherical caps — Matterport-style scan holes (glass,
                   occlusion shadows, registration gaps).
    """
    xyz = np.asarray(xyz, np.float32)
    rgb = np.asarray(rgb, np.float32)
    if arm == "depth-noise":
        return (
            xyz + rng.normal(0.0, float(val), xyz.shape).astype(np.float32),
            rgb,
        )
    if arm == "holes":
        n = xyz.shape[0]
        target = int(n * float(val))
        keep = np.ones(n, bool)
        per = max(1, target // 8)
        for _ in range(8):
            c = xyz[rng.integers(0, n)]
            d = np.linalg.norm(xyz - c, axis=1)
            d[~keep] = np.inf  # already removed: never recount
            keep[np.argsort(d)[:per]] = False
        return xyz[keep], rgb[keep]
    raise ValueError(f"unknown cloud realism arm {arm!r} "
                     f"(have {CLOUD_REALISM_ARMS})")

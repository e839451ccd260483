#!/usr/bin/env python
"""Generate a synthetic dataset in the Stanford2D-3D-S / OmniScenes layouts.

Builds textured box rooms, renders ground-truth panoramas with the
framework's own renderer, and writes clouds/poses/panos in the exact
directory conventions the harnesses expect — so the full CLI can be driven
end-to-end (and benchmarked) with zero dataset downloads.

Pose encoding inverts each dataset's GT convention so that the harness
decodes back to the rendered pose:
  * Stanford (< area 10): R = FLIP_Z @ inv(permute(euler_xyz(rot)))
    (reference data_utils.py:59-90) — we solve for the euler angles.
  * OmniScenes: the pose txt holds [R | t] directly (data_utils.py:166-182).

Usage:
  python scripts/make_synth_dataset.py --root /tmp/synth_data \
      --rooms 2 --queries 3 --points 30000 --height 512
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from scipy.spatial.transform import Rotation  # noqa: E402

from piccolo_tpu.harness.imaging import imwrite_rgb  # noqa: E402
from piccolo_tpu.ops.rotation import rot_from_ypr  # noqa: E402
from piccolo_tpu.testing import (  # noqa: E402
    make_room,
    make_scene,
    random_pose_inside,
    raycast_pano,
    render_at,
    scene_cloud,
    scene_pose,
)

_FLIP_Z = np.array([[-1.0, 0, 0], [0, -1.0, 0], [0, 0, 1.0]])

_ROOM_SIZES = [
    (6.0, 4.0, 3.0),
    (5.0, 5.0, 2.8),
    (8.0, 3.5, 3.2),
    (4.5, 6.5, 3.0),
]


def _stanford_euler_for(R: np.ndarray) -> list:
    """Solve final_camera_rotation st. the harness decodes back to R."""
    M = (_FLIP_Z @ R).T  # = permute(euler_matrix)
    r = np.zeros((3, 3))
    r[:, 2] = M[:, 0]
    r[:, 0] = M[:, 1]
    r[:, 1] = M[:, 2]
    return Rotation.from_matrix(r).as_euler("xyz").tolist()


def _write_cloud(path: str, xyz: np.ndarray, rgb: np.ndarray) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    cols = np.hstack([xyz, np.round(rgb * 255)])
    np.savetxt(path, cols, fmt="%.6f %.6f %.6f %d %d %d")


def _make_room_data(rng, size, points, oracle, floor_at_zero=False,
                    realism=None, realism_val=None):
    """Cloud + a renderer closure, for either oracle.

    splat: z-buffer the cloud itself (render_at).  raycast: dense
    camera-like panoramas ray-cast against the same textured surfaces
    (testing.raycast_pano) — lets the CLI and the reference run with their
    color machinery (match_color/sharpen_color) behaving as on real
    captures.
    """
    if oracle == "raycast":
        scene = make_scene(rng, size=size, n_occluders=2, texture="checker",
                           floor_at_zero=floor_at_zero)
        xyz, rgb = scene_cloud(scene, rng, points)
        if realism in ("depth-noise", "holes"):
            from piccolo_tpu.testing import apply_cloud_realism

            xyz, rgb = apply_cloud_realism(xyz, rgb, realism, realism_val,
                                           rng)

        def render(t, ypr, resolution):
            img = raycast_pano(scene, t, ypr, resolution)
            if realism in ("noise", "jpeg", "blur", "vignette"):
                from piccolo_tpu.testing import apply_image_realism

                u8 = (img * 255).astype(np.uint8)
                img = apply_image_realism(u8, realism, realism_val,
                                          rng).astype(np.float32) / 255.0
            return img

        def pose(yaw_only=True, z_range=None):
            return scene_pose(scene, rng, yaw_only=yaw_only, z_range=z_range)

        return xyz, rgb, render, pose, scene.occluders
    xyz, rgb = make_room(rng, n_per_wall=points // 6, size=size,
                         texture="checker")

    def render(t, ypr, resolution):
        return np.asarray(render_at(xyz, rgb, t, ypr, resolution))

    def pose(yaw_only=True, z_range=None):
        return random_pose_inside(rng, size, yaw_only=yaw_only)

    return xyz, rgb, render, pose, np.zeros((0, 2, 3), np.float32)


def _inside_any(t, occluders, clearance=0.15):
    if not occluders.size:
        return False
    return bool(np.any(np.all(
        (t >= occluders[:, 0] - clearance) & (t <= occluders[:, 1] + clearance),
        axis=1,
    )))


def make_stanford(root, rooms, queries, points, height, rng, oracle="splat",
                  realism=None, realism_val=None):
    area = 1
    for ri in range(rooms):
        size = _ROOM_SIZES[ri % len(_ROOM_SIZES)]
        xyz, rgb, render, sample_pose, _occ = _make_room_data(
            rng, size, points, oracle, realism=realism,
            realism_val=realism_val,
        )
        room_type, room_no = "office", str(ri + 1)
        _write_cloud(
            os.path.join(root, "stanford", "pcd_not_aligned", f"area_{area}",
                         f"{room_type}_{room_no}.txt"),
            xyz, rgb,
        )
        for qi in range(queries):
            t, ypr = sample_pose()
            img = render(t, ypr, (height, 2 * height))
            cam_id = f"{ri:02d}{qi:02d}synth"
            img_name = (
                f"camera_{cam_id}_{room_type}_{room_no}"
                "_frame_equirectangular_domain_rgb.png"
            )
            pano = os.path.join(root, "stanford", "pano", f"area_{area}", img_name)
            os.makedirs(os.path.dirname(pano), exist_ok=True)
            imwrite_rgb(pano, (img * 255).astype(np.uint8))

            R = np.asarray(rot_from_ypr(ypr.astype(np.float64)))
            pose = {
                "camera_location": t.astype(float).tolist(),
                "final_camera_rotation": _stanford_euler_for(R),
            }
            pose_path = os.path.join(
                root, "stanford", "pose", f"area_{area}",
                f"camera_{cam_id}_{room_type}_{room_no}"
                "_frame_equirectangular_domain_pose.json",
            )
            os.makedirs(os.path.dirname(pose_path), exist_ok=True)
            with open(pose_path, "w") as f:
                json.dump(pose, f)


def make_omniscenes(root, rooms, queries, points, height, rng,
                    split="extreme", oracle="splat",
                    realism=None, realism_val=None):
    for ri in range(rooms):
        size = _ROOM_SIZES[ri % len(_ROOM_SIZES)]
        # raycast omniscenes rooms are floor-referenced (floor at z=0) so
        # the shipped z_prior = 1.5 camera-height prior applies unmodified
        xyz, rgb, render, sample_pose, occluders = _make_room_data(
            rng, size, points, oracle, floor_at_zero=True,
            realism=realism, realism_val=realism_val,
        )
        room_type, room_no = "pyebang", str(ri + 1)
        _write_cloud(
            os.path.join(root, "omniscenes", "pcd", f"{room_type}_{room_no}.txt"),
            xyz, rgb,
        )
        video = f"handheld_{room_type}_{room_no}_scene_1"
        t = ypr = None
        for qi in range(queries):
            if oracle == "raycast" and t is not None:
                # a VIDEO is a smooth handheld walk, not independent
                # teleports: ~3 cm + ~1.2 deg per frame, height band kept,
                # steps into an occluder box resampled (the renderer
                # assumes the camera is outside every box)
                half_xy = np.array(size[:2], np.float32) / 2 - 0.4
                for _ in range(50):
                    cand = t + rng.normal(0, 0.02, 3).astype(np.float32)
                    cand[2] = np.clip(cand[2], 1.3, 1.7)
                    cand[:2] = np.clip(cand[:2], -half_xy, half_xy)
                    if not _inside_any(cand, occluders):
                        t = cand
                        break
                ypr = ypr + np.float32([rng.normal(0.015, 0.01), 0, 0])
            else:
                t, ypr = sample_pose(
                    z_range=(1.3, 1.7) if oracle == "raycast" else None
                )
            img = render(t, ypr, (height, 2 * height))
            pano = os.path.join(root, "omniscenes", f"{split}_pano", video,
                                f"{qi:06d}.jpg")
            os.makedirs(os.path.dirname(pano), exist_ok=True)
            imwrite_rgb(pano, (img * 255).astype(np.uint8))

            R = np.asarray(rot_from_ypr(ypr.astype(np.float64)))
            pose_path = os.path.join(root, "omniscenes", f"{split}_pose", video,
                                     f"{qi:06d}.txt")
            os.makedirs(os.path.dirname(pose_path), exist_ok=True)
            np.savetxt(pose_path, np.hstack([R, t.reshape(3, 1)]))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--rooms", type=int, default=2)
    ap.add_argument("--queries", type=int, default=3)
    ap.add_argument("--points", type=int, default=30000)
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--datasets", default="stanford,omniscenes")
    ap.add_argument("--oracle", default="splat", choices=["splat", "raycast"],
                    help="'raycast' writes DENSE camera-like panoramas "
                         "(cluttered rooms, geometric occlusion) instead "
                         "of cloud splats — color preprocessing paths "
                         "behave as on real captures")
    ap.add_argument("--realism", default=None,
                    choices=["noise", "jpeg", "blur", "vignette",
                             "depth-noise", "holes"],
                    help="capture-realism degradation (raycast only; "
                         "piccolo_tpu.testing.apply_*_realism) — the SAME "
                         "degraded data feeds the unmodified reference for "
                         "matched-pair runs")
    ap.add_argument("--realism-val", type=float, default=None,
                    help="arm strength (defaults: noise 0.02, jpeg 60, "
                         "blur 9 px, vignette 0.4, depth-noise 0.01 m, "
                         "holes 0.10)")
    args = ap.parse_args(argv)
    if args.realism:
        if args.oracle != "raycast":
            raise SystemExit("--realism needs --oracle raycast")
        if args.realism_val is None:
            args.realism_val = {
                "noise": 0.02, "jpeg": 60, "blur": 9, "vignette": 0.4,
                "depth-noise": 0.01, "holes": 0.10,
            }[args.realism]

    rng = np.random.default_rng(args.seed)
    if "stanford" in args.datasets:
        make_stanford(args.root, args.rooms, args.queries, args.points,
                      args.height, rng, oracle=args.oracle,
                      realism=args.realism, realism_val=args.realism_val)
    if "omniscenes" in args.datasets:
        make_omniscenes(args.root, args.rooms, args.queries, args.points,
                        args.height, rng, oracle=args.oracle,
                        realism=args.realism, realism_val=args.realism_val)
    print(f"synthetic dataset written to {args.root}")


if __name__ == "__main__":
    main()

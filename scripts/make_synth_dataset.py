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
from piccolo_tpu.testing import make_room, random_pose_inside, render_at  # noqa: E402

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


def make_stanford(root, rooms, queries, points, height, rng):
    area = 1
    for ri in range(rooms):
        size = _ROOM_SIZES[ri % len(_ROOM_SIZES)]
        xyz, rgb = make_room(rng, n_per_wall=points // 6, size=size,
                             texture="checker")
        room_type, room_no = "office", str(ri + 1)
        _write_cloud(
            os.path.join(root, "stanford", "pcd_not_aligned", f"area_{area}",
                         f"{room_type}_{room_no}.txt"),
            xyz, rgb,
        )
        for qi in range(queries):
            t, ypr = random_pose_inside(rng, size)
            img = np.asarray(render_at(xyz, rgb, t, ypr, (height, 2 * height)))
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
                    split="extreme"):
    for ri in range(rooms):
        size = _ROOM_SIZES[ri % len(_ROOM_SIZES)]
        xyz, rgb = make_room(rng, n_per_wall=points // 6, size=size,
                             texture="checker")
        room_type, room_no = "pyebang", str(ri + 1)
        _write_cloud(
            os.path.join(root, "omniscenes", "pcd", f"{room_type}_{room_no}.txt"),
            xyz, rgb,
        )
        video = f"handheld_{room_type}_{room_no}_scene_1"
        for qi in range(queries):
            t, ypr = random_pose_inside(rng, size)
            img = np.asarray(render_at(xyz, rgb, t, ypr, (height, 2 * height)))
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
    args = ap.parse_args(argv)

    rng = np.random.default_rng(args.seed)
    if "stanford" in args.datasets:
        make_stanford(args.root, args.rooms, args.queries, args.points,
                      args.height, rng)
    if "omniscenes" in args.datasets:
        make_omniscenes(args.root, args.rooms, args.queries, args.points,
                        args.height, rng)
    print(f"synthetic dataset written to {args.root}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""60-second demo: build a synthetic room, localize a panorama, save images.

No dataset needed. Writes the query pano, the best-pose projected pano, and
a side-by-side comparison to --out.

  python scripts/demo.py --out /tmp/piccolo_demo
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp  # noqa: E402

from piccolo_tpu.harness.imaging import imwrite_rgb, vconcat  # noqa: E402
from piccolo_tpu.harness.localize import _order_bounds, _pad_cloud  # noqa: E402
from piccolo_tpu.harness.metrics import (  # noqa: E402
    rotation_error_deg,
    translation_error,
)
from piccolo_tpu.init import default_init_dict  # noqa: E402
from piccolo_tpu.init.candidates import (  # noqa: E402
    generate_rot_points,
    generate_trans_points,
)
from piccolo_tpu.ops.pano import render_pano  # noqa: E402
from piccolo_tpu.ops.rotation import rot_from_ypr  # noqa: E402
from piccolo_tpu.pipeline import localize_query  # noqa: E402
from piccolo_tpu.testing import make_room, random_pose_inside, render_at  # noqa: E402
from piccolo_tpu.utils import enable_compilation_cache  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/piccolo_demo")
    ap.add_argument("--points", type=int, default=60000)
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    enable_compilation_cache()

    rng = np.random.default_rng(args.seed)
    size = (6.0, 4.0, 3.0)
    print("building synthetic room...")
    xyz, rgb = make_room(rng, n_per_wall=args.points // 6, size=size,
                         texture="checker")
    xyz_d, rgb_d, mask_d = _pad_cloud(xyz, rgb)
    lo, hi = _order_bounds(xyz, 0.05)

    gt_t, gt_ypr = random_pose_inside(rng, size)
    print(f"ground-truth pose: t={gt_t.round(3)} yaw={gt_ypr[0]:.3f}")
    H, W = args.height, 2 * args.height
    img = render_at(xyz, rgb, gt_t, gt_ypr, (H, W))
    img_init = img[::2, ::2]

    d = default_init_dict(xy_only=True, num_trans=50, yaw_only=True,
                          num_yaw=8, z_prior=None)
    trans = generate_trans_points(xyz, d)
    rot = generate_rot_points(d)
    pad = (-trans.shape[0]) % 8
    valid = np.ones(trans.shape[0] + pad, bool)
    if pad:
        valid[-pad:] = False
        trans = np.concatenate([trans, np.zeros((pad, 3), np.float32)])

    print("localizing (first call compiles; reruns are fast)...")
    t0 = time.time()
    res = localize_query(
        img_init, img, xyz_d, rgb_d,
        jnp.asarray(trans), jnp.asarray(rot), jnp.asarray(valid),
        jnp.asarray(lo), jnp.asarray(hi), mask_d,
        num_intermediate=20, num_input=6, num_iter=100, masked=True,
    )
    t = np.asarray(res.t)
    R = np.asarray(res.rot)
    print(f"done in {time.time() - t0:.1f}s")

    gt_R = np.asarray(rot_from_ypr(jnp.asarray(gt_ypr)))
    print(f"estimated pose:    t={t.round(3)}")
    print(f"t_error = {translation_error(gt_t, t)*100:.2f} cm, "
          f"r_error = {rotation_error_deg(gt_R, R):.3f} deg, "
          f"loss = {float(res.loss):.4f}")

    cam = jnp.einsum("nj,kj->nk", xyz_d - jnp.asarray(t), jnp.asarray(R),
                     precision="highest")
    est = np.asarray(
        render_pano(cam, rgb_d, (H // 2, W // 2), mask_d)
    ).astype(np.uint8)
    query_u8 = (np.asarray(img) * 255).astype(np.uint8)[::2, ::2]
    imwrite_rgb(os.path.join(args.out, "query.png"), query_u8)
    imwrite_rgb(os.path.join(args.out, "estimated.png"), est)
    imwrite_rgb(os.path.join(args.out, "side_by_side.png"),
                vconcat(query_u8, est))
    print(f"images written to {args.out}/")


if __name__ == "__main__":
    main()

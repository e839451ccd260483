#!/usr/bin/env python
"""Synthetic accuracy evaluation: many rooms x queries, with occluders.

The real Stanford2D-3D-S / OmniScenes datasets are not downloadable in this
environment, so accuracy evidence comes from the render-then-recover oracle
(SURVEY.md par.4) — strengthened here beyond the bench's bare box rooms:
several room geometries, texture variants, and cluttered rooms with box
occluders (real occlusion + parallax). Every query runs the production
fused pipeline at the Stanford benchmark budget and is scored against BOTH
success criteria.

Usage:
  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/eval_synth.py \
      [--rooms 6] [--queries 4] [--points 60000] [--seed 11]

Prints a per-room table and one JSON summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp  # noqa: E402

from piccolo_tpu.harness.localize import _order_bounds, _pad_cloud  # noqa: E402
from piccolo_tpu.harness.metrics import (  # noqa: E402
    OMNISCENES_R_THRESH_DEG,
    OMNISCENES_T_THRESH,
    STANFORD_R_THRESH_DEG,
    STANFORD_T_THRESH,
    rotation_error_deg,
    translation_error,
)
from piccolo_tpu.init import default_init_dict  # noqa: E402
from piccolo_tpu.init.candidates import (  # noqa: E402
    generate_rot_points,
    generate_trans_points,
)
from piccolo_tpu.ops.rotation import rot_from_ypr  # noqa: E402
from piccolo_tpu.pipeline import localize_query  # noqa: E402
from piccolo_tpu.testing import (  # noqa: E402
    make_cluttered_room,
    make_room,
    make_scene,
    pose_outside_occluders,
    raycast_pano,
    render_at,
    scene_cloud,
)
from piccolo_tpu.utils import enable_compilation_cache  # noqa: E402

_ROOM_SIZES = [
    (6.0, 4.0, 3.0),
    (5.0, 5.0, 2.8),
    (8.0, 3.5, 3.2),
    (4.5, 6.5, 3.0),
    (7.0, 5.0, 2.6),
    (4.0, 4.0, 3.4),
]


def main(argv=None) -> dict:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rooms", type=int, default=6)
    ap.add_argument("--queries", type=int, default=4)
    ap.add_argument("--points", type=int, default=None,
                    help="cloud size (default 60k; 240k for the omniscenes "
                         "profile so GT-render density per pixel matches — "
                         "real panoramas are dense, the synthetic oracle "
                         "renders the cloud)")
    ap.add_argument("--height", type=int, default=None,
                    help="pano height (default 512; 1024 for the "
                         "omniscenes profile)")
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--profile", default="stanford",
                    choices=["stanford", "omniscenes"],
                    help="omniscenes = 2048x1024 panos, 150-trans init at "
                         "full resolution, top-50 (reference "
                         "configs/omniscenes.ini budget)")
    ap.add_argument("--descent-table", default="float32",
                    choices=["auto", "float32", "bfloat16", "uint8"])
    ap.add_argument("--criterion", default="loss_histogram",
                    choices=["loss_histogram", "loss"],
                    help="init trim criterion ('loss' = working extension: "
                         "top num_input by stage-1 loss, no histogram trim)")
    ap.add_argument("--full-rot", action="store_true",
                    help="the reference stanford.ini rotation budget: a "
                         "FULL 4x4x4 yaw/pitch/roll grid (deduped, "
                         "reference utils.py:321-360) with GT poses drawn "
                         "with nonzero pitch/roll — exercises the "
                         "rotation-dedup init path end-to-end (the "
                         "default arm is yaw-only like the bench)")
    ap.add_argument("--sharpen", action="store_true",
                    help="apply the harness's sharpen_color prep per query "
                         "(color_mod on the init image + cloud-color "
                         "rebind with slab-plan target refresh) — widens "
                         "the eval to the color-processed path")
    ap.add_argument("--prune", default=None, metavar="K,M",
                    help="descent-prune speed mode: all starts run K "
                         "iterations, the M best finish the budget "
                         "(e.g. 30,2; default off = full descent)")
    ap.add_argument("--slab-cap", type=float, default=None,
                    help="HBM budget for slab-plan sorted streams "
                         "(default: the harness slab_bytes_cap default)")
    ap.add_argument("--no-slab", action="store_true",
                    help="score stage 1 with the XLA gather path instead "
                         "of the sorted-slab kernel")
    ap.add_argument("--no-hist-planes", action="store_true",
                    help="stage 2 re-splats per query instead of gathering "
                         "room-static winner-bin planes (the harness "
                         "hist_planes=auto default; auto-off under "
                         "--sharpen / criterion=loss)")
    ap.add_argument("--oracle", default="splat",
                    choices=["splat", "raycast"],
                    help="GT renderer: 'splat' z-buffers the cloud itself "
                         "(pixel coverage scales with point count); "
                         "'raycast' renders DENSE camera-like panoramas by "
                         "ray casting the same textured surfaces the cloud "
                         "samples — no coverage artifact, and the color "
                         "paths (match_color/sharpen/synth_*) behave as on "
                         "real captures. Raycast images are uint8-quantized "
                         "like real captures.")
    ap.add_argument("--perturb", default=None,
                    choices=["const", "gamma", "wb"],
                    help="apply the harness's synthetic illumination "
                         "ablation to the query image (reference "
                         "localize.py:384-393) — pair with --match-color "
                         "to test recovery (raycast oracle recommended)")
    ap.add_argument("--perturb-val", type=float, default=2.0,
                    help="ablation strength: divisor for const, exponent "
                         "for gamma (wb uses fixed 0.7/1.0/1.3 gains)")
    ap.add_argument("--match-color", action="store_true",
                    help="apply the harness's match_color prep (CDF "
                         "matching of the image to the cloud colors, "
                         "reference color_utils.py:146) per query")
    ap.add_argument("--realism", default=None,
                    choices=["noise", "jpeg", "blur", "vignette",
                             "depth-noise", "holes"],
                    help="capture-realism degradation arm (raycast oracle "
                         "only): sensor noise / JPEG / motion blur / "
                         "vignetting on the query image, or depth noise / "
                         "scan holes on the cloud "
                         "(piccolo_tpu.testing.apply_*_realism)")
    ap.add_argument("--realism-val", type=float, default=None,
                    help="arm strength (defaults: noise 0.02, jpeg 60, "
                         "blur 9 px, vignette 0.4, depth-noise 0.01 m, "
                         "holes 0.10)")
    ap.add_argument("--seam-gt", action="store_true",
                    help="adversarial seam poses (raycast + yaw-only GT "
                         "only): after drawing each GT pose, set its yaw so "
                         "the nearest salient object (occluder center, else "
                         "nearest wall corner) lands exactly at azimuth "
                         "phi=+-pi — the panorama seam the reference's "
                         "+-0.99 grid clip truncates (utils.py:85,97)")
    ap.add_argument("--seam-wrap", action="store_true",
                    help="sample across the seam with the opt-in periodic "
                         "horizontal wrap (ops/sampling.py seam_wrap=True) "
                         "instead of the reference-parity clip")
    ap.add_argument("--floor-ref", action="store_true",
                    help="floor-referenced scenes (floor at z=0, camera "
                         "height 1.3-1.7 m) with the reference's shipped "
                         "z_prior = 1.5 candidate prior — the realistic "
                         "capture-dataset frame (raycast oracle only)")
    args = ap.parse_args(argv)
    _REALISM_DEFAULTS = {
        "noise": 0.02, "jpeg": 60, "blur": 9, "vignette": 0.4,
        "depth-noise": 0.01, "holes": 0.10,
    }
    if args.realism:
        if args.oracle != "raycast":
            raise SystemExit("--realism needs --oracle raycast (the arms "
                             "model real-capture defects)")
        if args.realism_val is None:
            args.realism_val = _REALISM_DEFAULTS[args.realism]
    if args.floor_ref and args.oracle != "raycast":
        raise SystemExit("--floor-ref needs --oracle raycast")
    if args.seam_gt and (args.oracle != "raycast" or args.full_rot):
        raise SystemExit("--seam-gt needs --oracle raycast and yaw-only GT")
    prune = None
    if args.prune:
        k, m = (int(v) for v in args.prune.split(","))
        prune = (k, m)
    if args.profile == "omniscenes":
        args.height = args.height or 1024
        num_trans, num_intermediate, init_step = 150, 50, 1
        args.points = args.points or 240000
    else:
        args.height = args.height or 512
        num_trans, num_intermediate, init_step = 50, 20, 2
        args.points = args.points or 60000

    enable_compilation_cache()
    rng = np.random.default_rng(args.seed)

    results = []
    for ri in range(args.rooms):
        size = _ROOM_SIZES[ri % len(_ROOM_SIZES)]
        kind = ("plain", "checker", "cluttered")[ri % 3]
        scene = None
        if args.oracle == "raycast":
            scene = make_scene(
                rng, size=size,
                n_occluders=2 + ri % 3 if kind == "cluttered" else 0,
                texture="gradient" if kind == "plain" else "checker",
                floor_at_zero=args.floor_ref,
            )
            xyz, rgb = scene_cloud(scene, rng, args.points)
            occ = scene.occluders
            if args.realism in ("depth-noise", "holes"):
                # Matterport-style cloud defects: the capture (raycast)
                # stays ideal, the MAP degrades — the mismatch real
                # deployments live with
                from piccolo_tpu.testing import apply_cloud_realism

                xyz, rgb = apply_cloud_realism(
                    xyz, rgb, args.realism, args.realism_val, rng
                )
        elif kind == "cluttered":
            xyz, rgb, occ = make_cluttered_room(
                rng, n_per_wall=args.points // 8, size=size,
                n_occluders=2 + ri % 3, n_per_occluder=args.points // 12,
            )
        else:
            xyz, rgb = make_room(
                rng, n_per_wall=args.points // 6, size=size, texture=kind
            )
            occ = np.zeros((0, 2, 3), np.float32)

        xyz_d, rgb_d, mask_d = _pad_cloud(
            xyz.astype(np.float32), rgb.astype(np.float32)
        )
        lo, hi = _order_bounds(xyz, 0.05)
        if args.full_rot:
            # the FULL reference configs/stanford.ini init budget:
            # 3-D translation grid (xy_only=False), 4x4x4 ypr rotations
            # (deduped), top-50 intermediate
            num_intermediate = 50
            init_dict = default_init_dict(
                xy_only=False, num_trans=num_trans, yaw_only=False,
                num_yaw=4, num_pitch=4, num_roll=4,
                z_prior=None, num_split_h=4, num_split_w=4,
            )
        else:
            init_dict = default_init_dict(
                xy_only=True, num_trans=num_trans, yaw_only=True, num_yaw=8,
                z_prior=1.5 if args.floor_ref else None,
                num_split_h=4, num_split_w=4,
            )
        trans_grid = generate_trans_points(xyz, init_dict)
        rot_grid = generate_rot_points(init_dict)
        pad = (-trans_grid.shape[0]) % 64
        trans_valid = np.ones(trans_grid.shape[0] + pad, bool)
        if pad:
            trans_valid[-pad:] = False
            trans_grid = np.concatenate(
                [trans_grid, np.zeros((pad, 3), np.float32)]
            )

        plan = None
        if not args.no_slab:
            from piccolo_tpu.kernels.slab_sampling import (
                build_grid_plan,
                default_plan_bytes_cap,
                plan_bytes_estimate,
            )

            n_trans = trans_grid.shape[0] - pad
            n_pairs = n_trans * rot_grid.shape[0]
            cap = args.slab_cap or default_plan_bytes_cap()
            # sharpen's per-query re-bake copies the plan streams in-program
            mult = 2 if args.sharpen else 1
            compact = (
                plan_bytes_estimate(n_pairs, int(mask_d.shape[0])) * mult
                > cap
            )
            if plan_bytes_estimate(n_pairs, int(mask_d.shape[0]),
                                   compact=True) * mult > cap:
                if ri == 0:
                    print("slab plan skipped: sorted streams would crowd "
                          "HBM even compact (XLA stage 1 instead)",
                          flush=True)
            else:
                if compact and ri == 0:
                    print("using COMPACT slab plan (16 B/sample)", flush=True)
                plan = build_grid_plan(
                    xyz_d, rgb_d, mask_d,
                    jnp.asarray(trans_grid[:n_trans]), jnp.asarray(rot_grid),
                    # ceil: img_init = img_main[::init_step] has
                    # ceil(H/step) rows (odd --height with init_step=2)
                    -(-args.height // init_step),
                    -(-2 * args.height // init_step),
                    compact=compact,
                    # sharpen rebinds cloud colors per query: compact plans
                    # must store point ids so targets can be re-baked
                    tp_is_pid=compact and args.sharpen,
                    # plan table rows bake the seam mode (pipeline.py
                    # rejects a mode mismatch loudly)
                    wrap=args.seam_wrap,
                )

        hist_plan = None
        if (not args.no_hist_planes and not args.sharpen
                and args.criterion == "loss_histogram"):
            # harness hist_planes=auto analog: room-static stage-2 planes
            # (bit-identical scores; gated off when per-query colour
            # rebinds re-bake point bins), budgeted TOGETHER with the
            # admitted slab plan against the one HBM cap
            from piccolo_tpu.init.refine import build_hist_plan, hist_plan_bytes
            from piccolo_tpu.kernels.slab_sampling import (
                default_plan_bytes_cap,
            )

            n_trans = trans_grid.shape[0] - pad
            n_pairs = n_trans * rot_grid.shape[0]
            # ceil to match img_init = img_main[::init_step]'s true shape
            hp_h = -(-args.height // init_step)
            hp_w = -(-2 * args.height // init_step)
            cap = args.slab_cap or default_plan_bytes_cap()
            slab_bytes = plan.nbytes if plan is not None else 0
            if hist_plan_bytes(n_pairs, hp_h, hp_w) + slab_bytes > cap:
                if ri == 0:
                    print("hist planes skipped: planes + slab plan would "
                          "crowd HBM (live splat instead)", flush=True)
            else:
                hist_plan = build_hist_plan(
                    xyz_d, rgb_d, jnp.asarray(trans_grid[:n_trans]),
                    jnp.asarray(rot_grid), hp_h, hp_w, point_mask=mask_d,
                )

        for qi in range(args.queries):
            if args.floor_ref:
                from piccolo_tpu.testing import scene_pose

                gt_t, gt_ypr = scene_pose(
                    scene, rng, yaw_only=not args.full_rot,
                    z_range=(1.3, 1.7),
                )
            else:
                gt_t, gt_ypr = pose_outside_occluders(
                    rng, occ, size, yaw_only=not args.full_rot
                )
            if args.seam_gt:
                # point the camera so the nearest salient object straddles
                # the panorama seam: camera azimuth of a world direction at
                # azimuth a under R = RZ(yaw) is a + yaw, so yaw = pi - a
                # puts it at phi = +-pi (verified against rot_from_ypr)
                if occ is not None and occ.size:
                    centers = occ.mean(axis=1)
                else:
                    sx, sy = size[0] / 2.0, size[1] / 2.0
                    centers = np.array(
                        [[sx, sy, gt_t[2]], [sx, -sy, gt_t[2]],
                         [-sx, sy, gt_t[2]], [-sx, -sy, gt_t[2]]],
                        np.float32,
                    )
                d = centers[:, :2] - gt_t[:2]
                tgt = d[int(np.argmin(np.linalg.norm(d, axis=1)))]
                yaw = np.pi - np.arctan2(tgt[1], tgt[0])
                gt_ypr = np.array(
                    [(yaw + np.pi) % (2 * np.pi) - np.pi, 0.0, 0.0],
                    np.float32,
                )
            if scene is not None:
                # dense camera-like capture: ray-cast + uint8 quantization
                from piccolo_tpu.harness.localize import synth_ablate

                u8 = (
                    raycast_pano(
                        scene, gt_t, gt_ypr, (args.height, 2 * args.height)
                    ) * 255
                ).astype(np.uint8)
                u8 = synth_ablate(
                    u8,
                    const=(args.perturb_val if args.perturb == "const"
                           else None),
                    gamma=(args.perturb_val if args.perturb == "gamma"
                           else None),
                    wb=(0.7, 1.0, 1.3) if args.perturb == "wb" else None,
                )
                if args.realism in ("noise", "jpeg", "blur", "vignette"):
                    from piccolo_tpu.testing import apply_image_realism

                    u8 = apply_image_realism(
                        u8, args.realism, args.realism_val, rng
                    )
                img_f = u8.astype(np.float32) / 255.0
                if args.match_color:
                    from piccolo_tpu.color import color_match

                    img_f = color_match(img_f, rgb.astype(np.float32))
                img_main = jnp.asarray(img_f)
            else:
                if args.perturb or args.match_color:
                    raise SystemExit(
                        "--perturb/--match-color need --oracle raycast "
                        "(splat panos are mostly black at capture scales)"
                    )
                img_main = render_at(
                    xyz, rgb, gt_t, gt_ypr, (args.height, 2 * args.height)
                )
            img_init = img_main[::init_step, ::init_step]
            rgb_used, refresh = rgb_d, False
            if args.sharpen:
                # the harness's per-query sharpen prep (localize.py
                # prepare_*_images): joint image+cloud histogram
                # equalization, cloud-color rebind, plan target refresh
                from piccolo_tpu.color import color_mod
                from piccolo_tpu.harness.localize import _pad_rgb

                img_init_np, rgb_mod = color_mod(
                    np.asarray(img_init, np.float32),
                    rgb.astype(np.float32), 256,
                )
                img_init = jnp.asarray(img_init_np)
                rgb_used = _pad_rgb(rgb_mod, int(mask_d.shape[0]))
                refresh = plan is not None
            np.asarray(img_init[0, 0])
            t0 = time.time()
            res = localize_query(
                img_init, img_main, xyz_d, rgb_used,
                jnp.asarray(trans_grid), jnp.asarray(rot_grid),
                jnp.asarray(trans_valid), jnp.asarray(lo), jnp.asarray(hi),
                mask_d, num_intermediate=num_intermediate, num_input=6,
                num_iter=100,
                lr=0.1, patience=5, factor=0.8, masked=True, plan=plan,
                plan_refresh_rgb=refresh, hist_plan=hist_plan,
                descent_table=args.descent_table,
                seam_wrap=args.seam_wrap,
                criterion=args.criterion,
                descent_prune=prune,
            )
            t = np.asarray(res.t)
            elapsed = time.time() - t0
            R = np.asarray(res.rot)
            Rgt = np.asarray(rot_from_ypr(jnp.asarray(gt_ypr, jnp.float64)))
            t_err = translation_error(gt_t, t)
            r_err = rotation_error_deg(Rgt, R)
            results.append(
                dict(room=ri, kind=kind, query=qi, t_err=t_err, r_err=r_err,
                     sec=elapsed)
            )
            print(
                f"room {ri} ({kind}) q{qi}: t_err={t_err:.4f} m "
                f"r_err={r_err:.3f} deg  {elapsed:.2f}s",
                flush=True,
            )

    t_errs = np.array([r["t_err"] for r in results])
    r_errs = np.array([r["r_err"] for r in results])
    stanford_ok = np.sum(
        (t_errs < STANFORD_T_THRESH) & (r_errs < STANFORD_R_THRESH_DEG)
    )
    omni_ok = np.sum(
        (t_errs < OMNISCENES_T_THRESH) & (r_errs < OMNISCENES_R_THRESH_DEG)
    )
    n = len(results)
    by_kind = {}
    for kind in ("plain", "checker", "cluttered"):
        sel = [r for r in results if r["kind"] == kind]
        if sel:
            ke = np.array([r["t_err"] for r in sel])
            kr = np.array([r["r_err"] for r in sel])
            by_kind[kind] = dict(
                n=len(sel),
                stanford_acc=float(
                    np.mean((ke < STANFORD_T_THRESH) & (kr < STANFORD_R_THRESH_DEG))
                ),
                median_t_err=float(np.median(ke)),
            )
    summary = dict(
        profile=args.profile,
        oracle=args.oracle,
        realism=args.realism,
        realism_val=args.realism_val,
        perturb=args.perturb,
        match_color=bool(args.match_color),
        floor_ref=bool(args.floor_ref),
        full_rot=bool(args.full_rot),
        descent_table=args.descent_table,
        sharpen=bool(args.sharpen),
        seam_gt=bool(args.seam_gt),
        seam_wrap=bool(args.seam_wrap),
        prune=prune,
        queries=n,
        stanford_accuracy=float(stanford_ok / n),
        omniscenes_accuracy=float(omni_ok / n),
        median_t_err_m=float(np.median(t_errs)),
        median_r_err_deg=float(np.median(r_errs)),
        median_sec_per_pano=float(np.median([r["sec"] for r in results])),
        by_kind=by_kind,
    )
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main()

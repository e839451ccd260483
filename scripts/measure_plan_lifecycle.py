#!/usr/bin/env python
"""Measure the slab-plan lifecycle: first-query-per-room latency.

Round-2 rebuilt every room's slab plan from scratch per process — ~10 s
paid synchronously on the room's first query at dense OmniScenes scale.
Round 3 adds background builds + a content-addressed disk cache
(kernels/plan_cache.py, harness._maybe_slab_plan).  This script measures
per-query latency for one dense room exactly as the batch harness runs it:

  --sync       round-2 behavior: q0 blocks on the synchronous plan build.
  (default)    q0/q1 run the XLA stage 1 while the plan builds on a
               background thread; later queries use the kernel.  The disk
               cache follows its 'auto' default (off on remote-tunnel
               frontends, where loading GBs is slower than rebuilding —
               docs/PERFORMANCE.md round 3).
  --disk       force the disk cache on; run TWICE with the same
               --cache-dir to see the cross-restart hit (plans above
               slab_plan_persist_max_bytes are never written).

Prints one JSON line with per-query seconds and the plan's source.
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

from piccolo_tpu.config import make_config  # noqa: E402
from piccolo_tpu.harness.localize import (  # noqa: E402
    _FusedGrids,
    _order_bounds,
    _pad_cloud,
    _run_fused,
    get_init_dict,
)
from piccolo_tpu.testing import make_room, random_pose_inside, render_at  # noqa: E402
from piccolo_tpu.utils import enable_compilation_cache  # noqa: E402


def main(argv=None) -> dict:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cache-dir", required=True)
    ap.add_argument("--points", type=int, default=240000)
    ap.add_argument("--height", type=int, default=1024)
    ap.add_argument("--queries", type=int, default=4)
    ap.add_argument("--sync", action="store_true",
                    help="round-2 behavior: synchronous plan build")
    ap.add_argument("--no-cache", action="store_true",
                    help="disable the disk cache (isolate background build)")
    ap.add_argument("--disk", action="store_true",
                    help="force the disk cache ON (the 'auto' default "
                         "disables it on remote-tunnel frontends where "
                         "loads are slower than rebuilds)")
    args = ap.parse_args(argv)

    enable_compilation_cache()
    rng = np.random.default_rng(13)
    size = (6.0, 4.0, 3.0)
    xyz, rgb = make_room(rng, n_per_wall=args.points // 6, size=size,
                         texture="checker")
    xyz_d, rgb_d, mask_d = _pad_cloud(
        xyz.astype(np.float32), rgb.astype(np.float32)
    )
    lo, hi = _order_bounds(xyz, 0.05)

    cfg = make_config(
        dataset="OmniScenes",
        num_trans=150, xy_only=True, yaw_only=True, num_yaw=8, z_prior=None,
        num_intermediate=50, num_input=6, num_iter=100, factor=0.8,
        num_split_h=4, num_split_w=4,
        slab_plan_cache=(
            False if args.no_cache else (True if args.disk else "auto")
        ),
        slab_plan_cache_dir=args.cache_dir,
        slab_background_build=not args.sync,
    )
    init_dict = get_init_dict(cfg)
    grids = _FusedGrids(xyz.astype(np.float32), init_dict)
    cache = dict(xyz=xyz_d, rgb=rgb_d, mask=mask_d, lo=lo, hi=hi,
                 grids=grids)

    H, W = args.height, 2 * args.height
    # pre-render all queries so GT rendering never pollutes the timings
    queries = []
    for qi in range(args.queries):
        gt_t, gt_ypr = random_pose_inside(
            np.random.default_rng(100 + qi), size
        )
        img = np.asarray(render_at(xyz, rgb, gt_t, gt_ypr, (H, W)))
        queries.append((img, gt_t))
    np.asarray(jnp.zeros(1))  # pay the first-fetch tunnel cost up front

    times, errs, plan_used = [], [], []
    for qi, (img, gt_t) in enumerate(queries):
        t0 = time.time()
        res = _run_fused(
            img, img, cache, rgb_d, cfg, init_dict, grids,
            sync_plans=args.sync,
        )
        t = np.asarray(res.t)
        times.append(round(time.time() - t0, 3))
        errs.append(float(np.linalg.norm(t - gt_t)))
        plan_used.append(any(
            isinstance(k, tuple) and k and k[0] == "slab_plan"
            for k in cache
        ))

    # drain: let an in-flight background build finish + persist so the next
    # process (run 2) sees the disk entry — in the real batch loop later
    # queries of the room do this naturally
    if not args.sync:
        from piccolo_tpu.harness.localize import _maybe_slab_plan

        deadline = time.time() + 180
        while time.time() < deadline:
            if _maybe_slab_plan(cfg, cache, grids, queries[0][0]) is not None:
                break
            time.sleep(0.5)
    if args.disk:
        deadline = time.time() + 180
        while time.time() < deadline:
            if any(n.endswith(".npz") for n in
                   (os.listdir(args.cache_dir)
                    if os.path.isdir(args.cache_dir) else [])):
                break
            time.sleep(0.5)

    out = dict(
        mode=("sync" if args.sync else "background")
        + ("+disk" if args.disk else ("" if args.no_cache else "+disk_auto")),
        sec_per_query=times,
        plan_resident_after_query=plan_used,
        median_t_err_m=round(float(np.median(errs)), 4),
        cache_entries=len([
            n for n in (os.listdir(args.cache_dir)
                        if os.path.isdir(args.cache_dir) else [])
            if n.endswith(".npz")
        ]),
    )
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()

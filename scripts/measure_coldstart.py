#!/usr/bin/env python
"""Decompose the dense-scale serving cold start (round-3 fact: ~40 s per
program VARIANT per process even with a persistent-XLA-cache HIT).

Splits the first dense fused query of a fresh process into its parts with
the AOT stages of the ONE top-level jit (`pipeline.localize_query`):

  trace     jit.lower(...)            — Python tracing + StableHLO lowering
  compile   lowered.compile()         — XLA compile, or persistent-cache
                                        deserialize + device program load
  execute   first call + fetch        — run + device->host marshal

Run TWICE with the same --cache-dir: run 1 is the cold compile, run 2 is
the persistent-cache HIT — whatever `compile` still costs on run 2 is the
floor that no cache can remove (executable deserialization + program load
through the frontend), and the actionable target for mitigation
(jax.export-style executable serialization would land in the same place).

Setup mirrors scripts/measure_plan_lifecycle.py (dense OmniScenes scale:
240k-pt room, 2048x1024 panorama, synchronous slab-plan build NOT timed).
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from piccolo_tpu.config import make_config  # noqa: E402
from piccolo_tpu.harness.localize import (  # noqa: E402
    _FusedGrids,
    _maybe_hist_plan,
    _maybe_slab_plan,
    _order_bounds,
    _pad_cloud,
    get_init_dict,
)
from piccolo_tpu.pipeline import localize_query  # noqa: E402
from piccolo_tpu.testing import make_room, random_pose_inside, render_at  # noqa: E402
from piccolo_tpu.utils import enable_compilation_cache  # noqa: E402


def main(argv=None) -> dict:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cache-dir", required=True,
                    help="persistent XLA compilation cache dir (share it "
                         "across runs to measure the HIT path)")
    ap.add_argument("--points", type=int, default=240000)
    ap.add_argument("--height", type=int, default=1024)
    ap.add_argument("--no-slab", action="store_true",
                    help="measure the XLA-stage-1 program variant instead")
    args = ap.parse_args(argv)

    enable_compilation_cache(args.cache_dir)
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
        slab_plan_cache=False, slab_background_build=False,
        slab_init=(False if args.no_slab else "auto"),
    )
    init_dict = get_init_dict(cfg)
    grids = _FusedGrids(xyz.astype(np.float32), init_dict)
    cache = dict(xyz=xyz_d, rgb=rgb_d, mask=mask_d, lo=lo, hi=hi,
                 grids=grids)

    H, W = args.height, 2 * args.height
    gt_t, gt_ypr = random_pose_inside(np.random.default_rng(100), size)
    img = np.asarray(render_at(xyz, rgb, gt_t, gt_ypr, (H, W)))
    np.asarray(jnp.zeros(1))  # pay the first-fetch tunnel cost up front

    # plan builds are a separately-measured lifecycle
    # (scripts/measure_plan_lifecycle.py) — exclude them here
    t0 = time.time()
    plan = _maybe_slab_plan(cfg, cache, grids, img, sync=True)
    hist_plan = _maybe_hist_plan(cfg, cache, grids, img, sync=True)
    t_plan = time.time() - t0

    kw = dict(
        num_intermediate=50, num_input=6, num_split_h=4, num_split_w=4,
        num_iter=100, lr=0.1, patience=5, factor=0.8,
        criterion="loss_histogram", masked=True,
        descent_table="auto", seam_wrap=False, trajectory=False,
        descent_prune=None, plan_refresh_rgb=False,
    )
    call_args = (
        jnp.asarray(img), jnp.asarray(img), cache["xyz"], cache["rgb"],
        grids.trans, grids.rot, grids.valid,
        jnp.asarray(lo), jnp.asarray(hi), cache["mask"],
    )

    t0 = time.time()
    lowered = localize_query.lower(
        *call_args, plan=plan, hist_plan=hist_plan, **kw
    )
    t_trace = time.time() - t0

    t0 = time.time()
    compiled = lowered.compile()
    t_compile = time.time() - t0

    t0 = time.time()
    res = compiled(*call_args, plan=plan, hist_plan=hist_plan)
    t = np.asarray(res.t)
    t_exec = time.time() - t0

    t0 = time.time()
    res = compiled(*call_args, plan=plan, hist_plan=hist_plan)
    t = np.asarray(res.t)
    t_steady = time.time() - t0

    out = dict(
        variant="slab" if plan is not None else "xla",
        plan_build_s=round(t_plan, 2),
        trace_s=round(t_trace, 2),
        compile_s=round(t_compile, 2),
        first_exec_s=round(t_exec, 2),
        steady_s=round(t_steady, 3),
        t_err_m=round(float(np.linalg.norm(t - gt_t)), 4),
        cache_entries=len(os.listdir(args.cache_dir))
        if os.path.isdir(args.cache_dir) else 0,
    )
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Stretch-scale stress measurement: 1.02M-point cloud + 4096x2048 pano.

Reproduces docs/PERFORMANCE.md "Scale stress" on the real chip, routing
stage 1 through the SAME admission logic the harness uses — so the
round-4 PARTIAL plan path (full sorted streams exceed ``slab_bytes_cap``
=> cover the leading candidate groups, XLA-score the tail with
``plan_tail='xla'``) is exercised end-to-end, not hand-assembled.

  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/measure_stretch.py
    --no-slab      keep the fused program on the XLA gather stage 1
                   (the pre-round-4 stretch configuration)
    --prune        descent_prune (30, 2) speed mode on top

Prints one JSON line with steady-state s/pano, the stage-1 plan coverage,
and median t_err.
"""

from __future__ import annotations

import json
import sys
import time
import types

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from piccolo_tpu.config import make_config
    from piccolo_tpu.harness.localize import (
        _maybe_slab_plan,
        _order_bounds,
        _pad_cloud,
    )
    from piccolo_tpu.init import default_init_dict
    from piccolo_tpu.init.candidates import (
        generate_rot_points,
        generate_trans_points,
    )
    from piccolo_tpu.pipeline import localize_query
    from piccolo_tpu.testing import make_room, random_pose_inside, render_at
    from piccolo_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    pano_hw = (2048, 4096)
    init_step = 4  # init at 512x1024, the round-2/3 stretch configuration
    rng = np.random.default_rng(7)
    size = (6.0, 4.0, 3.0)
    xyz, rgb = make_room(rng, n_per_wall=170000, size=size, texture="checker")
    xyz_d, rgb_d, mask_d = _pad_cloud(xyz, rgb)
    lo, hi = _order_bounds(xyz, 0.05)

    init_dict = default_init_dict(
        xy_only=True, yaw_only=True, num_yaw=8, num_trans=50, z_prior=None,
        num_split_h=4, num_split_w=4,
    )
    trans_grid = generate_trans_points(xyz, init_dict)
    rot_grid = generate_rot_points(init_dict)
    n_trans = trans_grid.shape[0]
    pad = (-n_trans) % 64
    trans_valid = np.ones(n_trans + pad, bool)
    if pad:
        trans_valid[-pad:] = False
        trans_grid = np.concatenate(
            [trans_grid, np.zeros((pad, 3), np.float32)]
        )
    trans_grid = jnp.asarray(trans_grid)
    rot_grid = jnp.asarray(rot_grid)
    trans_valid = jnp.asarray(trans_valid)
    lo_d, hi_d = jnp.asarray(lo), jnp.asarray(hi)

    # -- stage-1 plan via the harness admission (partial plans included) --
    plan = None
    if "--no-slab" not in sys.argv:
        cfg = make_config(
            dataset="Stanford2D-3D-S", slab_init="auto",
            slab_plan_cache=False, slab_background_build=False,
        )
        cache = dict(xyz=xyz_d, rgb=rgb_d, mask=mask_d)
        grids = types.SimpleNamespace(
            trans=trans_grid, rot=rot_grid, n_trans=n_trans,
        )
        img_probe = np.zeros(
            (pano_hw[0] // init_step, pano_hw[1] // init_step, 3), np.float32
        )
        t0 = time.time()
        plan = _maybe_slab_plan(cfg, cache, grids, img_probe, sync=True)
        build_s = time.time() - t0
        if plan is not None:
            print(
                f"plan: {plan.n_pairs}/{n_trans * rot_grid.shape[0]} pairs, "
                f"{plan.nbytes / 1e9:.2f} GB, built in {build_s:.1f} s",
                file=sys.stderr, flush=True,
            )
        else:
            print("plan: admission declined (XLA stage 1)", file=sys.stderr,
                  flush=True)
    n_real_pairs = n_trans * int(rot_grid.shape[0])
    plan_tail = (
        "xla" if plan is not None and plan.n_pairs < n_real_pairs else "pad"
    )
    prune = (30, 2) if "--prune" in sys.argv else None
    # --multires: the multi-resolution descent mode at the scale where the
    # full-res table (4096x2048, ~200 MB bf16) gathers at the collapsed
    # rate — 70 iterations on the stride-2 table, 30 full-res
    multires = (70, 2) if "--multires" in sys.argv else None
    if multires is not None and prune is not None:
        raise SystemExit("--multires and --prune cannot combine")

    def one_query(seed: int):
        q = np.random.default_rng(seed)
        gt_t, gt_ypr = random_pose_inside(q, size)
        img_main = render_at(xyz, rgb, gt_t, gt_ypr, pano_hw)
        img_init = img_main[::init_step, ::init_step]
        np.asarray(img_init[0, 0])
        t0 = time.time()
        res = localize_query(
            img_init, img_main, xyz_d, rgb_d, trans_grid, rot_grid,
            trans_valid, lo_d, hi_d, mask_d,
            num_intermediate=20, num_input=6, num_iter=100,
            lr=0.1, patience=5, factor=0.8, masked=True,
            plan=plan, plan_tail=plan_tail, descent_prune=prune,
            descent_multires=multires,
        )
        t = np.asarray(res.t)
        return time.time() - t0, float(np.linalg.norm(t - gt_t))

    one_query(100)  # compile
    rows = [one_query(200 + i) for i in range(3)]
    out = {
        "metric": "sec_per_pano_stretch (1.02M pts, 4096x2048, 50x8 grid)",
        "value": round(float(np.median([r[0] for r in rows])), 3),
        "unit": "s/pano",
        "stage1": (
            "xla" if plan is None
            else f"slab[{'q8' if plan.quant else 'compact' if plan.compact else 'f32'}] "
                 f"{plan.n_pairs}/{n_real_pairs} + {plan_tail} tail"
        ),
        "plan_gb": round(plan.nbytes / 1e9, 2) if plan is not None else 0.0,
        "median_t_err_m": round(float(np.median([r[1] for r in rows])), 4),
        "prune": bool(prune),
        "multires": multires,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

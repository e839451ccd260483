#!/usr/bin/env python
"""Official benchmark: end-to-end panorama localization throughput.

Runs the complete pipeline (two-stage init + multi-start descent) on a
synthetic room at reference-benchmark scale (Stanford-style: 60k-point
cloud, 1024x512 panorama, 50-translation x 8-yaw init budget, 6 starts x
100 Adam iterations) and prints ONE JSON line:

  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

``vs_baseline`` compares against the PyTorch reference running the SAME
workload (same synthetic scene generator, same budgets) measured on this
machine's CPU — the only hardware both frameworks can share here; see
BASELINE.md for the measurement and for the reference's GPU-era context.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

# Reference wall time for this exact workload (sec/pano, steady-state), from
# running /root/reference main.py (unmodified, env-compat shims only) on the
# same synthetic dataset on this machine's CPU — measurement recorded in
# BASELINE.md ("Measured baseline" table, 2026-08-16): per-query times
# 43.83/38.83/45.97 s, median 43.83, at t_err 3-9 mm (accuracy 3/3).
BASELINE_SEC_PER_PANO_CPU = 43.83


def main() -> None:
    import jax
    import jax.numpy as jnp

    # The TPU claim can fail transiently if another process briefly holds
    # the chip. Backend discovery caches the failure inside the process, so
    # the retry is a clean re-exec of this script (once), not an in-process
    # poke at private jax internals.
    try:
        jax.devices()
    except RuntimeError:
        import os

        if os.environ.get("PICCOLO_BENCH_RETRIED"):
            raise
        time.sleep(20)
        os.environ["PICCOLO_BENCH_RETRIED"] = "1"
        os.execv(sys.executable, [sys.executable] + sys.argv)

    from piccolo_tpu.init import default_init_dict
    from piccolo_tpu.init.candidates import generate_rot_points, generate_trans_points
    from piccolo_tpu.init.refine import trim_by_hist, trim_by_loss
    from piccolo_tpu.pipeline import localize_query
    from piccolo_tpu.solver import descend
    from piccolo_tpu.testing import make_room, random_pose_inside, render_at
    from piccolo_tpu.utils import enable_compilation_cache
    from piccolo_tpu.harness.localize import _order_bounds, _pad_cloud

    enable_compilation_cache()

    rng = np.random.default_rng(7)
    size = (6.0, 4.0, 3.0)
    xyz, rgb = make_room(rng, n_per_wall=10000, size=size, texture="checker")
    xyz_d, rgb_d, mask_d = _pad_cloud(xyz, rgb)
    lo, hi = _order_bounds(xyz, 0.05)

    init_dict = default_init_dict(
        xy_only=True, num_trans=50, yaw_only=True, num_yaw=8,
        z_prior=None, num_split_h=4, num_split_w=4,
    )
    # once-per-room work: candidate grids (host) shipped to device
    trans_grid = generate_trans_points(xyz, init_dict)
    rot_grid = generate_rot_points(init_dict)
    pad = (-trans_grid.shape[0]) % 64  # match the harness's shape bucket
    trans_valid = np.ones(trans_grid.shape[0] + pad, bool)
    if pad:
        trans_valid[-pad:] = False
        trans_grid = np.concatenate([trans_grid, np.zeros((pad, 3), np.float32)])
    trans_grid = jnp.asarray(trans_grid)
    rot_grid = jnp.asarray(rot_grid)
    trans_valid = jnp.asarray(trans_valid)
    lo_d, hi_d = jnp.asarray(lo), jnp.asarray(hi)

    # The fused whole-query program is the fast path (one dispatch, packed
    # one-gather sampling); --staged runs the three-stage path instead.
    use_fused = "--staged" not in sys.argv

    def one_query(seed: int):
        q = np.random.default_rng(seed)
        gt_t, gt_ypr = random_pose_inside(q, size)
        img_main = render_at(xyz, rgb, gt_t, gt_ypr, (512, 1024))
        img_init = img_main[::2, ::2]  # init downsample 2 (reference default)
        np.asarray(img_init[0, 0])  # force the GT render to finish pre-timer
        t0 = time.time()
        if use_fused:
            res = localize_query(
                img_init, img_main, xyz_d, rgb_d, trans_grid, rot_grid,
                trans_valid, lo_d, hi_d, mask_d,
                num_intermediate=20, num_input=6, num_iter=100,
                lr=0.1, patience=5, factor=0.8, masked=True,
            )
            t = np.asarray(res.t)
        else:
            t1, r1 = trim_by_loss(
                img_init, xyz_d, rgb_d,
                trans_grid, rot_grid, 20, mask_d, valid=trans_valid,
            )
            t2, r2 = trim_by_hist(
                img_init, xyz_d, rgb_d, t1, r1, 6, 4, 4, mask_d
            )
            res = descend(
                img_main, xyz_d, rgb_d, t2, r2, lo_d, hi_d, mask_d,
                num_iter=100, lr=0.1, patience=5, factor=0.8, masked=True,
            )
            k = int(jnp.argmin(res.loss))
            t = np.asarray(res.t[k])
        elapsed = time.time() - t0
        t_err = float(np.linalg.norm(t - gt_t))
        return elapsed, t_err

    # warm-up query compiles everything
    one_query(100)

    times, errs = [], []
    for i in range(5):
        elapsed, t_err = one_query(200 + i)
        times.append(elapsed)
        errs.append(t_err)

    sec_per_pano = float(np.median(times))
    out = {
        "metric": "sec_per_pano_end_to_end (init+descent, 60k pts, 1024x512)",
        "value": round(sec_per_pano, 4),
        "unit": "s/pano",
        "vs_baseline": (
            round(BASELINE_SEC_PER_PANO_CPU / sec_per_pano, 2)
            if BASELINE_SEC_PER_PANO_CPU
            else None
        ),
        "panos_per_sec": round(1.0 / sec_per_pano, 3),
        "median_t_err_m": round(float(np.median(errs)), 4),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

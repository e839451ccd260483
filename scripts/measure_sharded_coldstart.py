#!/usr/bin/env python
"""Measure the SHARDED path's exec-cache restart (round-5 verdict #3).

Round 4 proved the per-process warm-up is server-side XLA compilation
(~26 s/variant on the axon frontend) and shipped the serialized-executable
cache for the single-device pipeline (docs/ROUND4.md §3,
scripts/measure_coldstart.py).  The multi-chip program
(parallel.localize_query_sharded) was left uncovered: a mesh deployment
restarted into the full compile.  This script measures the round-5 routing
on the real chip with a 1x1 mesh — the only mesh the hardware allows; the
shard_map program structure (psum/pmin collectives, NamedSharding args) is
identical at any factorization, so 1x1 exercises exactly the
serialize/deserialize machinery a real pod would use.

Run it TWICE with the same --exec-cache DIR:
  run 1: lower + compile + serialize (writes the .jaxexec entry)
  run 2 (the restart): lower + disk load — no compile

Prints one JSON line per run.  Dense OmniScenes-scale workload (240k pts,
2048x1024) matching measure_coldstart.py so the numbers are comparable.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None) -> dict:
    ap = argparse.ArgumentParser()
    ap.add_argument("--exec-cache", required=True, metavar="DIR")
    ap.add_argument("--points", type=int, default=240000)
    ap.add_argument("--height", type=int, default=1024)
    ap.add_argument("--num-iter", type=int, default=100)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from piccolo_tpu.harness.localize import _order_bounds
    from piccolo_tpu.init import default_init_dict
    from piccolo_tpu.init.candidates import (
        generate_rot_points,
        generate_trans_points,
    )
    from piccolo_tpu.parallel import localize_query_sharded, make_mesh
    from piccolo_tpu.testing import make_room, random_pose_inside, render_at
    from piccolo_tpu.utils import exec_cache

    out: dict = {
        "mode": "sharded-coldstart",
        "device": str(jax.devices()[0]),
        "n_devices": len(jax.devices()),
    }
    entry_existed = any(
        n.endswith(".jaxexec")
        for n in (os.listdir(args.exec_cache)
                  if os.path.isdir(args.exec_cache) else [])
    )
    out["restart"] = entry_existed

    # pay the one-time per-process fetch-path init (axon ~150 s) outside
    # the timings below
    t0 = time.time()
    np.asarray(jnp.zeros((1,), jnp.float32))
    out["fetch_init_s"] = round(time.time() - t0, 2)

    rng = np.random.default_rng(13)
    size = (6.0, 4.0, 3.0)
    xyz, rgb = make_room(rng, n_per_wall=args.points // 6, size=size,
                         texture="checker")
    pano_hw = (args.height, 2 * args.height)
    init_dict = default_init_dict(
        xy_only=True, yaw_only=True, num_yaw=8, num_trans=150, z_prior=None,
        num_split_h=4, num_split_w=4,
    )
    trans_np = generate_trans_points(xyz, init_dict)
    rot_np = generate_rot_points(init_dict)
    n_trans = trans_np.shape[0]
    pad = (-n_trans) % 64
    trans_valid_np = np.ones(n_trans + pad, bool)
    if pad:
        trans_valid_np[-pad:] = False
        trans_np = np.concatenate([trans_np, np.zeros((pad, 3), np.float32)])
    lo_np, hi_np = _order_bounds(xyz, 0.05)
    q = np.random.default_rng(99)
    gt_t, gt_ypr = random_pose_inside(q, size)
    img_main_np = np.asarray(render_at(xyz, rgb, gt_t, gt_ypr, pano_hw))
    img_init_np = img_main_np[::4, ::4]

    mesh = make_mesh(1, len(jax.devices())) if len(jax.devices()) > 1 \
        else make_mesh(1, 1)
    out["mesh"] = dict(mesh.shape)

    # instrument the cache's phases: lower / disk-load / compile
    phases: dict = {}
    real_load, real_store = exec_cache._load, exec_cache._store

    def timed_load(path):
        t0 = time.time()
        r = real_load(path)
        phases["load_s"] = round(time.time() - t0, 2)
        phases["loaded"] = r is not None
        return r

    def timed_store(path, compiled, max_bytes):
        t0 = time.time()
        real_store(path, compiled, max_bytes)
        phases["serialize_store_s"] = round(time.time() - t0, 2)
        try:
            phases["bytes"] = os.path.getsize(path)
        except OSError:
            pass

    exec_cache._load = timed_load
    exec_cache._store = timed_store
    try:
        t0 = time.time()
        res = localize_query_sharded(
            mesh, img_init_np, img_main_np, xyz.astype(np.float32),
            rgb.astype(np.float32), trans_np, rot_np, trans_valid_np,
            lo_np, hi_np,
            num_intermediate=50, num_input=6, num_iter=args.num_iter,
            lr=0.1, patience=5, factor=0.8,
            exec_cache_dir=args.exec_cache,
        )
        t = np.asarray(res.t)
        out["first_query_s"] = round(time.time() - t0, 2)
        out["t_err_m"] = round(float(np.linalg.norm(t - gt_t)), 4)
        out.update(phases)

        t0 = time.time()
        res = localize_query_sharded(
            mesh, img_init_np, img_main_np, xyz.astype(np.float32),
            rgb.astype(np.float32), trans_np, rot_np, trans_valid_np,
            lo_np, hi_np,
            num_intermediate=50, num_input=6, num_iter=args.num_iter,
            lr=0.1, patience=5, factor=0.8,
            exec_cache_dir=args.exec_cache,
        )
        np.asarray(res.t)
        out["steady_s"] = round(time.time() - t0, 2)
    finally:
        exec_cache._load, exec_cache._store = real_load, real_store

    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Decompose the per-process first-dense-query warm-up (verdict r3 #3).

Round 3 measured ~40 s for the first dense query per program VARIANT per
process even with a persistent-XLA-cache HIT (docs/ROUND3.md §2 fact 2)
but never separated the phases.  This script runs the dense OmniScenes-
scale fused program (240k pts, 2048x1024 pano — the measure_plan_lifecycle
workload) through the jit AOT API so each phase is timed on its own:

  trace_s        jax.jit(...).lower(...)      - host-side tracing + StableHLO
  compile_s      lowered.compile()            - XLA compile (persistent-cache
                                                hit on the 2nd process run)
  input_put_s    device_put of the room cloud + images
  first_exec_s   first compiled(...) call, enqueue only
  fetch_s        np.asarray of the result (axon: includes the one-time
                 per-process fetch-path init, ~150 s — measured separately
                 by fetching a 1-element array first)

Run it TWICE with the same --cache-dir: run 1 = compile-cache miss,
run 2 = the steady restart cost the verdict asks about.

  --serialize    additionally time jax.experimental.serialize_executable
                 (serialize + deserialize_and_load) and report the
                 executable size: the candidate "ship the executable, skip
                 compile()" mitigation.
  --variants N   pre-warm N distinct program variants (num_iter 100/99/...)
                 in N threads and report wall vs the serial sum: does
                 variant warm-up overlap, or does the platform serialize it?

Prints one JSON line.  Reference has no counterpart (single research
script, no serving); this bounds OUR serving cold start.
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
    ap.add_argument("--cache-dir", default=None,
                    help="persistent XLA compile cache dir (run twice: "
                         "miss, then hit)")
    ap.add_argument("--points", type=int, default=240000)
    ap.add_argument("--height", type=int, default=1024)
    ap.add_argument("--serialize", action="store_true")
    ap.add_argument("--exec-cache", default=None, metavar="DIR",
                    help="cross-process executable cache: if DIR holds a "
                         "serialized executable from a previous run, time "
                         "deserialize_and_load + first exec INSTEAD of "
                         "trace+compile; else serialize this run's "
                         "executable into DIR")
    ap.add_argument("--variants", type=int, default=0,
                    help="N>1: time N program variants warmed in N threads "
                         "vs serially")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    if args.cache_dir:
        jax.config.update("jax_compilation_cache_dir", args.cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    else:
        from piccolo_tpu.utils import enable_compilation_cache
        enable_compilation_cache()

    from piccolo_tpu.harness.localize import _order_bounds, _pad_cloud
    from piccolo_tpu.init import default_init_dict
    from piccolo_tpu.init.candidates import (
        generate_rot_points,
        generate_trans_points,
    )
    from piccolo_tpu.pipeline import localize_query
    from piccolo_tpu.testing import make_room, random_pose_inside, render_at

    out: dict = {"mode": "coldstart", "device": str(jax.devices()[0])}

    # one-time per-process fetch-path init (axon ~150 s): pay it on a
    # 1-element array so it does not pollute the phase timings below
    t0 = time.time()
    np.asarray(jnp.zeros((1,), jnp.float32))
    out["fetch_init_s"] = round(time.time() - t0, 2)

    rng = np.random.default_rng(13)
    size = (6.0, 4.0, 3.0)
    xyz, rgb = make_room(rng, n_per_wall=args.points // 6, size=size,
                         texture="checker")
    pano_hw = (args.height, 2 * args.height)
    init_hw = (args.height // 4, args.height // 2)
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
    xyz_p, rgb_p, mask_p = _pad_cloud(
        xyz.astype(np.float32), rgb.astype(np.float32)
    )
    lo_np, hi_np = _order_bounds(xyz, 0.05)
    q = np.random.default_rng(99)
    gt_t, gt_ypr = random_pose_inside(q, size)
    img_main_np = render_at(xyz, rgb, gt_t, gt_ypr, pano_hw)
    img_init_np = img_main_np[::4, ::4]

    t0 = time.time()
    arrs = [
        jax.device_put(a)
        for a in (img_init_np, img_main_np, xyz_p, rgb_p, trans_np, rot_np,
                  trans_valid_np, lo_np, hi_np, mask_p)
    ]
    jax.block_until_ready(arrs)
    out["input_put_s"] = round(time.time() - t0, 2)
    (img_init, img_main, xyz_d, rgb_d, trans_g, rot_g, trans_v, lo_d,
     hi_d, mask_d) = arrs

    static = dict(
        num_intermediate=50, num_input=6, num_iter=100, lr=0.1,
        patience=5, factor=0.8, masked=True,
    )

    def phases(num_iter: int, tag: str) -> dict:
        kw = dict(static, num_iter=num_iter)
        r: dict = {}
        t0 = time.time()
        lowered = localize_query.lower(
            img_init, img_main, xyz_d, rgb_d, trans_g, rot_g, trans_v,
            lo_d, hi_d, mask_d, **kw,
        )
        r["trace_s"] = round(time.time() - t0, 2)
        t0 = time.time()
        compiled = lowered.compile()
        r["compile_s"] = round(time.time() - t0, 2)
        t0 = time.time()
        res = compiled(
            img_init, img_main, xyz_d, rgb_d, trans_g, rot_g, trans_v,
            lo_d, hi_d, mask_d,
        )
        jax.block_until_ready(res.t)
        r["first_exec_s"] = round(time.time() - t0, 2)
        t0 = time.time()
        t = np.asarray(res.t)
        r["fetch_s"] = round(time.time() - t0, 2)
        r["t_err_m"] = round(float(np.linalg.norm(t - gt_t)), 4)
        t0 = time.time()
        res = compiled(
            img_init, img_main, xyz_d, rgb_d, trans_g, rot_g, trans_v,
            lo_d, hi_d, mask_d,
        )
        np.asarray(res.t)
        r["steady_s"] = round(time.time() - t0, 2)
        r["tag"] = tag
        r["_compiled"] = compiled
        return r

    exec_path = None
    if args.exec_cache:
        os.makedirs(args.exec_cache, exist_ok=True)
        exec_path = os.path.join(args.exec_cache, "dense-xla-100iter.jaxexec")

    if exec_path and os.path.exists(exec_path):
        # restart path: load the serialized executable, no trace/compile
        import pickle

        from jax.experimental.serialize_executable import (
            deserialize_and_load,
        )

        r: dict = {}
        t0 = time.time()
        with open(exec_path, "rb") as f:
            payload, in_tree, out_tree = pickle.load(f)
        r["disk_read_s"] = round(time.time() - t0, 2)
        r["bytes"] = len(payload)
        t0 = time.time()
        compiled = deserialize_and_load(payload, in_tree, out_tree)
        r["deserialize_s"] = round(time.time() - t0, 2)
        t0 = time.time()
        res = compiled(
            img_init, img_main, xyz_d, rgb_d, trans_g, rot_g, trans_v,
            lo_d, hi_d, mask_d,
        )
        jax.block_until_ready(res.t)
        r["first_exec_s"] = round(time.time() - t0, 2)
        t0 = time.time()
        t = np.asarray(res.t)
        r["fetch_s"] = round(time.time() - t0, 2)
        r["t_err_m"] = round(float(np.linalg.norm(t - gt_t)), 4)
        out["exec_cache_load"] = r
        out["total_first_query_s"] = round(
            out["input_put_s"] + r["disk_read_s"] + r["deserialize_s"]
            + r["first_exec_s"] + r["fetch_s"], 2,
        )
    else:
        main_r = phases(100, "dense-xla-100iter")
        compiled = main_r.pop("_compiled")
        out["phases"] = main_r
        out["total_first_query_s"] = round(
            out["input_put_s"]
            + sum(main_r[k] for k in
                  ("trace_s", "compile_s", "first_exec_s", "fetch_s")), 2,
        )
        if exec_path:
            import pickle

            from jax.experimental.serialize_executable import serialize

            t0 = time.time()
            payload, in_tree, out_tree = serialize(compiled)
            with open(exec_path, "wb") as f:
                pickle.dump((payload, in_tree, out_tree), f)
            out["exec_cache_write"] = {
                "write_s": round(time.time() - t0, 2),
                "bytes": len(payload),
            }

    if args.serialize:
        from jax.experimental.serialize_executable import (
            deserialize_and_load,
            serialize,
        )
        t0 = time.time()
        payload, in_tree, out_tree = serialize(compiled)
        ser = {"serialize_s": round(time.time() - t0, 2),
               "bytes": len(payload)}
        t0 = time.time()
        reloaded = deserialize_and_load(payload, in_tree, out_tree)
        ser["deserialize_s"] = round(time.time() - t0, 2)
        t0 = time.time()
        res = reloaded(
            img_init, img_main, xyz_d, rgb_d, trans_g, rot_g, trans_v,
            lo_d, hi_d, mask_d,
        )
        t = np.asarray(res.t)
        ser["reloaded_exec_s"] = round(time.time() - t0, 2)
        ser["t_equal"] = bool(
            np.allclose(t, np.asarray(compiled(
                img_init, img_main, xyz_d, rgb_d, trans_g, rot_g, trans_v,
                lo_d, hi_d, mask_d,
            ).t))
        )
        out["serialize"] = ser

    if args.variants > 1:
        import threading

        iters = [99 - i for i in range(args.variants)]
        t0 = time.time()
        results = [None] * len(iters)

        def warm(i: int) -> None:
            results[i] = phases(iters[i], f"variant-{iters[i]}")

        threads = [
            threading.Thread(target=warm, args=(i,))
            for i in range(len(iters))
        ]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        wall = time.time() - t0
        for r in results:
            r.pop("_compiled", None)
        out["parallel_variants"] = {
            "n": len(iters),
            "wall_s": round(wall, 2),
            "serial_sum_s": round(
                sum(sum(r[k] for k in
                        ("trace_s", "compile_s", "first_exec_s", "fetch_s"))
                    for r in results), 2,
            ),
            "per_variant": results,
        }

    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()

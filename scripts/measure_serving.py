#!/usr/bin/env python
"""Reproduce the serving measurements recorded in docs/DEPLOY.md.

Three measurement modes (run on the real TPU for the recorded numbers;
everything also runs on CPU for a functional smoke):

  --mode http       paired HTTP request-latency measurement, default vs
                    descent-prune config (the DEPLOY "0.88 -> 0.59 s"
                    row): starts the real server twice on synthetic
                    Stanford-layout data and times sequential POSTs.
  --mode sustained  30 sequential library-level queries against a warm
                    room — the no-drift/no-leak check (flat medians).
  --mode room-auto  room='auto' selection accuracy over 4 resident rooms
                    (plain, two same-generator checker rooms — the hard
                    pair — and a cluttered room), 3 queries each (the
                    DEPLOY "12/12 correct" row).

Requires no dataset: rooms and query panoramas are synthesized with
piccolo_tpu.testing (the render-then-recover oracle).
"""
from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import tempfile
import time
import urllib.request

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SIZE = (6.0, 4.0, 3.0)
_CFG = dict(
    xy_only=True, num_trans=50, yaw_only=True, num_yaw=8, z_prior=None,
    num_split_h=4, num_split_w=4, num_intermediate=20, num_input=6,
    num_iter=100, lr=0.1, patience=5, factor=0.8,
    # Production guidance (docs/DEPLOY.md) is exec_cache_dir ON; it also
    # makes these measurements survivable on degraded axon days where the
    # server-side remote compile can drop a large program ("Broken
    # pipe") — once any process compiles a variant, later runs disk-load
    # it.  PICCOLO_EXEC_CACHE='' disables.
    exec_cache_dir=os.environ.get(
        "PICCOLO_EXEC_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "piccolo_tpu",
                     "bench_exec"),
    ) or None,
)


def _make_scene(seed=3, n_per_wall=10000, texture="checker"):
    from piccolo_tpu.testing import make_room

    rng = np.random.default_rng(seed)
    return make_room(rng, n_per_wall=n_per_wall, size=SIZE, texture=texture)


def _query_images(xyz, rgb, n, hw=(512, 1024), seed=9):
    from piccolo_tpu.testing import random_pose_inside, render_at

    rng = np.random.default_rng(seed)
    imgs = []
    for _ in range(n):
        gt_t, gt_ypr = random_pose_inside(rng, SIZE)
        imgs.append((
            np.asarray(render_at(xyz, rgb, gt_t, gt_ypr, hw) * 255)
            .astype(np.uint8),
            gt_t,
        ))
    return imgs


def mode_sustained(n_queries: int):
    from piccolo_tpu.serve import LocalizeService

    xyz, rgb = _make_scene()
    svc = LocalizeService(**_CFG)
    svc.load_room(xyz, rgb, name="box", warm_shape=(512, 1024))
    imgs = _query_images(xyz, rgb, 3)
    times = []
    for i in range(n_queries):
        t0 = time.time()
        svc.localize(imgs[i % 3][0])
        times.append(time.time() - t0)
    first = sorted(times[:5])[2]
    last = sorted(times[-5:])[2]
    print(json.dumps({
        "mode": "sustained", "queries": n_queries,
        "first5_median_s": round(first, 4), "last5_median_s": round(last, 4),
        "all_s": [round(t, 3) for t in times],
    }))


def mode_room_auto(probe=True, points: int = 60000,
                   height: int = 512, margin=None, pairs=None):
    """The DEPLOY '12/12 correct' eval, timed: 4 resident rooms (incl. the
    hard same-generator checker pair), 3 auto queries each, plus an
    explicit-room baseline so the auto overhead is a measured ratio.
    ``--probe off`` restores the round-3 full-query-per-room selection;
    ``--points 240000 --height 2048`` runs it at dense OmniScenes scale
    (where descent dominates each query and the probe's truncated descent
    should actually pay — docs/ROUND4.md §4)."""
    from piccolo_tpu.serve import LocalizeService
    from piccolo_tpu.testing import make_cluttered_room

    npw, hw = points // 6, (height, 2 * height)
    extra = {}
    if margin is not None:
        extra["room_auto_margin"] = float(margin)
    if pairs is not None:
        extra["room_auto_probe_pairs"] = int(pairs)
    svc = LocalizeService(max_rooms=4, room_auto_probe=probe, **extra,
                          **_CFG)
    rooms = {}
    for name, (seed, texture, cluttered) in {
        "plain": (1, "plain", False),
        "checker_a": (2, "checker", False),
        "checker_b": (3, "checker", False),
        "cluttered": (4, "checker", True),
    }.items():
        rng = np.random.default_rng(seed)
        if cluttered:
            xyz, rgb, _ = make_cluttered_room(
                rng, n_per_wall=npw, size=SIZE, texture=texture
            )
        else:
            xyz, rgb = _make_scene(seed=seed, n_per_wall=npw,
                                   texture=texture)
        rooms[name] = (xyz, rgb)
        svc.load_room(xyz, rgb, name=name)
    correct, total, errs, times = 0, 0, [], []
    for name, (xyz, rgb) in rooms.items():
        for img, gt_t in _query_images(xyz, rgb, 3, hw=hw, seed=99 + total):
            t0 = time.time()
            out = svc.localize(img, room="auto")
            times.append(time.time() - t0)
            right = out["room"] == name
            correct += right
            total += 1
            if right:
                errs.append(float(np.linalg.norm(out["t"] - gt_t)))
    # explicit-room steady-state baseline on the same service (programs
    # are warm by now): 3 queries against one known room
    base = []
    for img, _ in _query_images(*rooms["checker_a"], 3, hw=hw, seed=7):
        t0 = time.time()
        svc.localize(img, room="checker_a")
        base.append(time.time() - t0)
    med_auto = float(np.median(times))
    med_base = float(np.median(base))
    print(json.dumps({
        "mode": "room-auto", "probe": str(probe),
        "margin": margin, "probe_pairs": pairs,
        "points": points, "pano": [height, 2 * height],
        "correct": correct, "total": total,
        "median_t_err_m": round(float(np.median(errs)), 4) if errs else None,
        "median_auto_s": round(med_auto, 3),
        "steady_auto_s": round(float(np.median(times[4:])), 3),
        "median_single_room_s": round(med_base, 3),
        "x_single_room": round(med_auto / med_base, 2),
        "auto_s": [round(t, 3) for t in times],
    }))


def _wait_healthy(port, timeout=600):
    t0 = time.time()
    while time.time() - t0 < timeout:
        try:
            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=5
            ) as r:
                json.load(r)
                return True
        except Exception:
            time.sleep(2)
    return False


def mode_http(port: int):
    import cv2

    xyz, rgb = _make_scene()
    tmp = tempfile.mkdtemp(prefix="piccolo_serve_bench_")
    pcd = os.path.join(tmp, "room.txt")
    np.savetxt(pcd, np.concatenate(
        [xyz, np.round(rgb * 255)], axis=1
    ), fmt="%.6f %.6f %.6f %d %d %d")
    img_paths = []
    for i, (img, _) in enumerate(_query_images(xyz, rgb, 3)):
        p = os.path.join(tmp, f"q{i}.png")
        cv2.imwrite(p, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        img_paths.append(p)

    cfg = os.path.join(tmp, "cfg.ini")
    with open(cfg, "w") as f:
        f.write("[Default]\ndataset = Stanford2D-3D-S\nsample_rate = 1\n")
        f.write("".join(f"{k} = {v}\n" for k, v in _CFG.items()))

    def run_arm(label, override):
        env = dict(os.environ)
        env["PYTHONPATH"] = (
            os.path.join(os.path.dirname(__file__), "..") + ":"
            + env.get("PYTHONPATH", "")
        )
        cmd = [
            sys.executable, "-u", "-m", "piccolo_tpu.serve",
            "--config", cfg, "--pcd", pcd, "--warm", "512x1024",
            "--port", str(port),
        ]
        if override:
            cmd += ["--override", override]
        log = open(os.path.join(tmp, f"serve_{label}.log"), "w")
        proc = subprocess.Popen(cmd, env=env, stdout=log, stderr=log)
        try:
            if not _wait_healthy(port):
                raise RuntimeError(f"server never became healthy ({label})")
            times = []
            for i in range(9):
                body = json.dumps(
                    {"image_path": img_paths[i % 3]}
                ).encode()
                t0 = time.time()
                with urllib.request.urlopen(
                    urllib.request.Request(
                        f"http://127.0.0.1:{port}/localize", data=body,
                        headers={"Content-Type": "application/json"},
                    ),
                    timeout=300,
                ) as r:
                    json.load(r)
                if i > 0:  # first request per arm decodes cold
                    times.append(time.time() - t0)
            times.sort()
            return times[len(times) // 2]
        finally:
            proc.send_signal(signal.SIGINT)
            try:
                proc.wait(timeout=30)
            except subprocess.TimeoutExpired:
                proc.kill()
            log.close()

    default_s = run_arm("default", None)
    time.sleep(5)
    prune_s = run_arm(
        "prune", "descent_prune_iter=30,descent_prune_keep=2"
    )
    print(json.dumps({
        "mode": "http", "default_median_s": round(default_s, 4),
        "prune_median_s": round(prune_s, 4),
        "speedup": round(default_s / prune_s, 2),
    }))


def mode_coldstart(exec_cache: str, points: int, height: int):
    """Serve-level restart cost (docs/ROUND4.md §3): time-to-ready
    (load_room incl. sync plan build + program warm) and the first real
    query, in ONE fresh process.  Run three times for the paired numbers:
    --exec-cache '' (off), --exec-cache DIR on an empty DIR (write), and
    again on the populated DIR (the restart that matters)."""
    import jax.numpy as jnp

    from piccolo_tpu.serve import LocalizeService

    # pay the one-time per-process fetch-path init on a 1-element array so
    # it is reported separately, not inside ready/first-query
    t0 = time.time()
    np.asarray(jnp.zeros((1,), jnp.float32))
    fetch_init_s = time.time() - t0

    xyz, rgb = _make_scene(seed=3, n_per_wall=points // 6)
    cfg = dict(_CFG)
    if exec_cache:
        cfg["exec_cache_dir"] = exec_cache
    svc = LocalizeService(slab_background_build=False, **cfg)
    t0 = time.time()
    svc.load_room(xyz, rgb, name="dense", warm_shape=(height, 2 * height))
    ready_s = time.time() - t0
    img, gt_t = _query_images(xyz, rgb, 1, hw=(height, 2 * height),
                              seed=21)[0]
    t0 = time.time()
    out = svc.localize(img)
    first_s = time.time() - t0
    print(json.dumps({
        "mode": "coldstart", "exec_cache": bool(exec_cache),
        "points": points, "pano": [height, 2 * height],
        "fetch_init_s": round(fetch_init_s, 1),
        "ready_s": round(ready_s, 2),
        "first_query_s": round(first_s, 2),
        "t_err_m": round(float(np.linalg.norm(out["t"] - gt_t)), 4),
    }))


def mode_track_streams(k: int, frames: int, batch: bool, points: int,
                       height: int):
    """Multi-stream tracking drive (round 5, verdict #8): K camera streams
    track smooth trajectories through ONE room on one chip, each stream a
    free-running thread of serving requests.  With ``track_batch`` on,
    requests that pile up behind the chip drain as one vmapped program
    (serve._track_room_maybe_batched); ``--batch off`` is the strict
    per-request baseline.  Reports per-request latency percentiles, the
    aggregate frame rate, the realized batch-size histogram, and accuracy
    vs the streams' GT poses."""
    import threading

    from piccolo_tpu.serve import LocalizeService
    from piccolo_tpu.testing import render_at
    from piccolo_tpu.tracking import ypr_from_rot

    hw = (height, 2 * height)
    xyz, rgb = _make_scene(seed=3, n_per_wall=points // 6)
    svc = LocalizeService(track_batch=batch, max_pending=2 * k, **_CFG)
    svc.load_room(xyz, rgb, name="box", warm_shape=hw)

    # per-stream smooth trajectories (~3 cm / ~1.1 deg per frame), frames
    # rendered up front so the drive times serving, not the oracle
    rng = np.random.default_rng(11)
    streams = []
    for s in range(k):
        t0 = np.float32([rng.uniform(-1.5, 1.5), rng.uniform(-1.0, 1.0),
                         rng.uniform(-0.5, 0.5)])
        yaw0 = rng.uniform(-np.pi, np.pi)
        step = np.float32([rng.uniform(-0.03, 0.03),
                           rng.uniform(-0.03, 0.03), 0.01])
        gts, imgs = [], []
        for f in range(frames + 1):
            t = t0 + f * step
            ypr = np.float32([yaw0 + 0.02 * f, 0.0, 0.0])
            gts.append((t, ypr))
            imgs.append(np.asarray(
                render_at(xyz, rgb, t, ypr, hw) * 255).astype(np.uint8))
        streams.append((gts, imgs))

    # seed each stream with one full query on its frame 0
    poses = []
    for gts, imgs in streams:
        out = svc.localize(imgs[0])
        poses.append({"t": out["t"].tolist(),
                      "ypr": ypr_from_rot(out["rot"]).tolist()})

    def drive(record):
        lat = [[] for _ in range(k)]
        errs, hist = [], {}
        t_wall = time.time()

        def run_stream(s):
            gts, imgs = streams[s]
            prev = dict(poses[s])
            for f in range(1, frames + 1):
                t0 = time.time()
                out = svc.localize(imgs[f], prev_pose=prev)
                lat[s].append(time.time() - t0)
                prev = {"t": out["t"].tolist(), "ypr": out["ypr"].tolist()}
                b = int(out.get("batched", 1))
                hist[b] = hist.get(b, 0) + 1
                errs.append(float(np.linalg.norm(out["t"] - gts[f][0])))

        threads = [threading.Thread(target=run_stream, args=(s,))
                   for s in range(k)]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        wall = time.time() - t_wall
        if not record:
            return None
        flat = sorted(x for per in lat for x in per)
        return dict(
            wall_s=round(wall, 3),
            agg_fps=round(k * frames / wall, 2),
            lat_p50_s=round(flat[len(flat) // 2], 4),
            lat_p90_s=round(flat[int(len(flat) * 0.9)], 4),
            batch_hist={str(b): n for b, n in sorted(hist.items())},
            median_t_err_m=round(float(np.median(errs)), 4),
            max_t_err_m=round(float(np.max(errs)), 4),
        )

    drive(record=False)  # warm-up: compiles whichever buckets concurrency hits
    measured = drive(record=True)

    # single-stream steady baseline on the same warm service
    gts, imgs = streams[0]
    prev = dict(poses[0])
    single = []
    for f in range(1, frames + 1):
        t0 = time.time()
        out = svc.localize(imgs[f], prev_pose=prev)
        single.append(time.time() - t0)
        prev = {"t": out["t"].tolist(), "ypr": out["ypr"].tolist()}
    print(json.dumps({
        "mode": "track-streams", "batch": batch, "streams": k,
        "frames_per_stream": frames, "points": points, "pano": list(hw),
        **measured,
        "single_stream_median_s": round(float(np.median(single)), 4),
        "x_single_stream": round(
            measured["lat_p50_s"] / float(np.median(single)), 2
        ),
    }))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode",
                    choices=("http", "sustained", "room-auto", "coldstart",
                             "track-streams"),
                    default="sustained")
    ap.add_argument("--queries", type=int, default=30,
                    help="query count for --mode sustained")
    ap.add_argument("--port", type=int, default=8341)
    ap.add_argument("--probe", choices=("on", "off", "batched"),
                    default="on",
                    help="room-auto probe phase: off = round-3 full-query-"
                         "per-room, on = round-4 per-room probe, batched = "
                         "round-5 one-program probe over all rooms")
    ap.add_argument("--margin", type=float, default=None,
                    help="--mode room-auto: override room_auto_margin "
                         "(probe-loss finalist cut, default 3.0)")
    ap.add_argument("--probe-pairs", type=int, default=None,
                    help="--mode room-auto: override room_auto_probe_pairs "
                         "(per-room stage-1 pair budget, default 512)")
    ap.add_argument("--exec-cache", default="",
                    help="--mode coldstart: executable cache dir ('' = off)")
    ap.add_argument("--points", type=int, default=None,
                    help="room point count (coldstart default 240000; "
                         "room-auto default 60000 — pass 240000 for the "
                         "dense-scale probe measurement)")
    ap.add_argument("--height", type=int, default=None,
                    help="pano height, W = 2H (coldstart default 1024; "
                         "room-auto default 512)")
    ap.add_argument("--streams", type=int, default=6,
                    help="--mode track-streams: concurrent camera streams")
    ap.add_argument("--frames", type=int, default=12,
                    help="--mode track-streams: tracked frames per stream")
    ap.add_argument("--batch", choices=("on", "off"), default="on",
                    help="--mode track-streams: serving micro-batch on/off")
    args = ap.parse_args(argv)
    if args.mode == "http":
        mode_http(args.port)
    elif args.mode == "room-auto":
        mode_room_auto(
            probe={"on": True, "off": False,
                   "batched": "batched"}[args.probe],
            points=args.points or 60000,
            height=args.height or 512,
            margin=args.margin, pairs=args.probe_pairs)
    elif args.mode == "coldstart":
        mode_coldstart(args.exec_cache, args.points or 240000,
                       args.height or 1024)
    elif args.mode == "track-streams":
        mode_track_streams(args.streams, args.frames,
                           batch=args.batch == "on",
                           points=args.points or 60000,
                           height=args.height or 512)
    else:
        mode_sustained(args.queries)


if __name__ == "__main__":
    main()

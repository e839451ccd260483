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


def mode_room_auto():
    from piccolo_tpu.serve import LocalizeService
    from piccolo_tpu.testing import make_cluttered_room

    svc = LocalizeService(max_rooms=4, **_CFG)
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
                rng, n_per_wall=10000, size=SIZE, texture=texture
            )
        else:
            xyz, rgb = _make_scene(seed=seed, texture=texture)
        rooms[name] = (xyz, rgb)
        svc.load_room(xyz, rgb, name=name)
    correct, total, errs = 0, 0, []
    for name, (xyz, rgb) in rooms.items():
        for img, gt_t in _query_images(xyz, rgb, 3, seed=99 + total):
            out = svc.localize(img, room="auto")
            right = out["room"] == name
            correct += right
            total += 1
            if right:
                errs.append(float(np.linalg.norm(out["t"] - gt_t)))
    print(json.dumps({
        "mode": "room-auto", "correct": correct, "total": total,
        "median_t_err_m": round(float(np.median(errs)), 4) if errs else None,
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


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=("http", "sustained", "room-auto"),
                    default="sustained")
    ap.add_argument("--queries", type=int, default=30,
                    help="query count for --mode sustained")
    ap.add_argument("--port", type=int, default=8341)
    args = ap.parse_args(argv)
    if args.mode == "http":
        mode_http(args.port)
    elif args.mode == "room-auto":
        mode_room_auto()
    else:
        mode_sustained(args.queries)


if __name__ == "__main__":
    main()

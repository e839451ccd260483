#!/usr/bin/env python
"""Official benchmark: end-to-end panorama localization throughput.

Runs the complete pipeline (two-stage init + multi-start descent) on a
synthetic room at reference-benchmark scale and prints ONE JSON line:

  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Modes:
  (default)     Stanford-scale: 60k-point cloud, 1024x512 pano, 50-trans x
                8-yaw init -> top-20 -> 6 starts x 100 Adam iters.
  --omniscenes  OmniScenes-scale (reference configs/omniscenes.ini budget):
                60k-point cloud, 2048x1024 pano, 150-trans (z_prior) x 8-yaw
                init at full resolution -> top-50 -> 6 starts x 100 iters.
  --staged      three-stage dispatch path instead of the fused program.
  --breakdown   per-stage fetch-forced timings (stage1/stage2/descent) on
                the staged dispatch path — reproduces the
                docs/PERFORMANCE.md "Where the time goes" numbers.
  --prune       descent-prune speed mode (30, 2): all 6 starts run 30
                iterations, the 2 current-best finish the budget (opt-in;
                the default matches the reference's full multi-start
                descent; dense real workloads should prefer (40, 3) —
                docs/PERFORMANCE.md What-worked #16).

``vs_baseline`` compares against the PyTorch reference running the SAME
workload (same synthetic scene generator, same budgets) measured on this
machine's CPU — the only hardware both frameworks can share here; see
BASELINE.md for the measurements and for the reference's GPU-era context.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# Reference wall times for these exact workloads (sec/pano, steady-state,
# median), from running /root/reference main.py (unmodified, env-compat
# shims only) on the same synthetic datasets on this machine's CPU —
# measurements recorded in BASELINE.md ("Measured baseline" tables):
#   stanford   (2026-08-16): 43.83/38.83/45.97 s -> median 43.83, t_err 3-9 mm
#   omniscenes (2026-08-16): measured by scripts/measure_reference_baseline.py
#                            --dataset omniscenes (see BASELINE.md)
BASELINE_SEC_PER_PANO_CPU = {
    "stanford": 43.83,
    "omniscenes": 83.78,
}


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
        if os.environ.get("PICCOLO_BENCH_RETRIED"):
            raise
        time.sleep(20)
        os.environ["PICCOLO_BENCH_RETRIED"] = "1"
        os.execv(sys.executable, [sys.executable] + sys.argv)

    from piccolo_tpu.init import default_init_dict
    from piccolo_tpu.init.candidates import generate_rot_points, generate_trans_points
    from piccolo_tpu.init.refine import trim_by_hist, trim_by_loss
    from piccolo_tpu.pipeline import LOCALIZE_QUERY_STATICS, localize_query
    from piccolo_tpu.solver import DESCEND_STATICS, descend
    from piccolo_tpu.testing import make_room, random_pose_inside, render_at
    from piccolo_tpu.utils import enable_compilation_cache
    from piccolo_tpu.utils.exec_cache import aot_call
    from piccolo_tpu.harness.localize import _order_bounds, _pad_cloud

    enable_compilation_cache()

    # Executable cache for the bench's big programs (opt-out
    # --no-exec-cache; dir override PICCOLO_BENCH_EXEC_CACHE).  On the
    # axon frontend compilation is SERVER-SIDE and, on degraded days, the
    # remote_compile endpoint can drop a large (slab-kernel) program
    # outright — "Broken pipe" after a server-side timeout — the same
    # outage class serving survives via `exec_cache_dir`
    # (docs/ROUND4.md §3).  One successful compile serializes the
    # executable; later bench processes load it in seconds instead of
    # re-paying (or failing) the remote compile.  Steady-state timing is
    # unchanged: after warm-up the cache is one dict lookup (the disk
    # layer self-disables on CPU backends, utils/exec_cache.py).
    exec_cache_dir = None
    if "--no-exec-cache" not in sys.argv:
        exec_cache_dir = os.environ.get(
            "PICCOLO_BENCH_EXEC_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "piccolo_tpu",
                         "bench_exec"),
        )

    if exec_cache_dir:
        def call_query(*a, **kw):
            return aot_call(localize_query, LOCALIZE_QUERY_STATICS,
                            exec_cache_dir, *a, **kw)

        def call_descend(*a, **kw):
            return aot_call(descend, DESCEND_STATICS,
                            exec_cache_dir, *a, **kw)
    else:
        call_query, call_descend = localize_query, descend

    mode = "omniscenes" if "--omniscenes" in sys.argv else "stanford"
    if mode == "omniscenes":
        # reference configs/omniscenes.ini budget; init runs at full pano
        # resolution (the reference halves init_downsample 2 -> 1,
        # localize.py:349-350, so init == main == 2048x1024)
        # z_prior None (not the shipped 1.5): the synthetic rooms are
        # z-centered, unlike real OmniScenes floors at z=0 — the prior would
        # pin candidates to the ceiling. Grid SIZE (and so timing) is
        # unchanged; the measured reference baseline uses the same setting
        # (scripts/measure_reference_baseline.py).
        pano_hw = (1024, 2048)
        init_step = 1
        init_kw = dict(num_trans=150, z_prior=None)
        num_intermediate = 50
    else:
        pano_hw = (512, 1024)
        init_step = 2  # init downsample 2 (reference stanford default)
        init_kw = dict(num_trans=50, z_prior=None)
        num_intermediate = 20

    rng = np.random.default_rng(7)
    size = (6.0, 4.0, 3.0)
    xyz, rgb = make_room(rng, n_per_wall=10000, size=size, texture="checker")
    xyz_d, rgb_d, mask_d = _pad_cloud(xyz, rgb)
    lo, hi = _order_bounds(xyz, 0.05)

    init_dict = default_init_dict(
        xy_only=True, yaw_only=True, num_yaw=8,
        num_split_h=4, num_split_w=4, **init_kw,
    )
    # once-per-room work: candidate grids (host) shipped to device
    trans_grid = generate_trans_points(xyz, init_dict)
    rot_grid = generate_rot_points(init_dict)
    n_trans = trans_grid.shape[0]  # real rows (plan covers only these)
    pad = (-trans_grid.shape[0]) % 64  # match the harness's shape bucket
    trans_valid = np.ones(trans_grid.shape[0] + pad, bool)
    if pad:
        trans_valid[-pad:] = False
        trans_grid = np.concatenate([trans_grid, np.zeros((pad, 3), np.float32)])
    trans_grid = jnp.asarray(trans_grid)
    rot_grid = jnp.asarray(rot_grid)
    trans_valid = jnp.asarray(trans_valid)
    lo_d, hi_d = jnp.asarray(lo), jnp.asarray(hi)

    # The fused whole-query program is the fast path (one dispatch, slab-
    # kernel stage 1); --staged runs the three-stage path instead and
    # --no-slab keeps the fused program on the XLA gather stage 1.
    use_fused = "--staged" not in sys.argv
    # default "auto": f32 at Stanford scale (small-table regime; trajectory-
    # exact), bf16 at OmniScenes scale where the 100 MB table is footprint-
    # bound (ops.sampling.resolve_descent_table; gated by the widened
    # multi-room eval — docs/ROUND3.md)
    descent_table = (
        "uint8" if "--u8-descent" in sys.argv
        else "bfloat16" if "--bf16-descent" in sys.argv
        else "float32" if "--f32-descent" in sys.argv
        else "auto"
    )
    # --prune enables the descent-prune speed mode (NOT the default: the
    # reference descends every start for the full budget; gating evals in
    # docs/PERFORMANCE.md What-worked #16).  The bench uses (30, 2) at both
    # scales as a TIMING artifact; on dense real OmniScenes-like workloads
    # prefer the gentler (40, 3) — the bench's sparse synthetic oracle is
    # density-limited at 2048x1024 (BASELINE.md), so its per-query errors
    # at this scale are band-noise either way, while the density-matched
    # 24-query eval shows (40, 3) restores 24/24 where (30, 2) costs a
    # query.
    prune = (30, 2) if "--prune" in sys.argv else None
    # --multires enables the multi-resolution descent speed mode (opt-in,
    # round 5): first 70 iterations on the stride-2 table (the ~2.4x
    # small-table gather regime), last 30 full-res with optimizer state
    # carried across the switch (solver._descend_single_multires).
    multires = (70, 2) if "--multires" in sys.argv else None
    if multires is not None and prune is not None:
        raise SystemExit("--multires and --prune cannot combine")
    plan = None
    if use_fused and "--no-slab" not in sys.argv:
        from piccolo_tpu.kernels.slab_sampling import build_grid_plan

        # once-per-room work, like the grids above (amortized across the
        # room's queries in a real evaluation run)
        plan = build_grid_plan(
            xyz_d, rgb_d, mask_d, trans_grid[:n_trans], rot_grid,
            pano_hw[0] // init_step, pano_hw[1] // init_step,
        )
    hist_plan = None
    if use_fused and "--no-hist-planes" not in sys.argv:
        from piccolo_tpu.init.refine import build_hist_plan

        # stage-2 winner-bin planes: room-static like the slab plan (the
        # trim's splat depends only on cloud + grid poses + point bins)
        hist_plan = build_hist_plan(
            xyz_d, rgb_d, trans_grid[:n_trans], rot_grid,
            pano_hw[0] // init_step, pano_hw[1] // init_step,
            point_mask=mask_d,
        )

    if "--breakdown-fused" in sys.argv:
        # Per-phase decomposition of the HEAD fused program: the same
        # three phases the one-dispatch localize_query runs (slab stage 1
        # + top-k, hist-plane trim, multi-start descent), jitted
        # separately with a forced fetch after each, plus the bare fetch
        # cost and the measured one-dispatch fused time in the same
        # process.  composite = s1 + s2 + s3 - 2*fetch (the fused program
        # pays ONE fetch, already inside the descent term) — the
        # docs/PERFORMANCE.md "Speed-of-light accounting" input.
        from piccolo_tpu.init.refine import hist_scores_from_planes
        from piccolo_tpu.kernels.slab_sampling import make_pairs, slab_pair_scores

        T, R = trans_grid.shape[0], rot_grid.shape[0]
        TR = T * R
        k1 = num_intermediate
        pair_valid_full = jnp.repeat(trans_valid, R)
        pair_t_full, pair_r_full = make_pairs(trans_grid, rot_grid)

        # NOTE: the plan / hist planes are ARGUMENTS, not closures — a
        # jit-captured closure array is embedded in the HLO as a
        # constant, and the multi-MB slab/plane buffers made the remote
        # compile orders bigger than the fused program's (which passes
        # them as parameters) — big enough to hit the axon server-side
        # compile timeout on degraded days.
        @jax.jit
        def phase1(img_init, plan):
            # mirrors pipeline.localize_query stage 1 (plan_tail="pad")
            s_all = slab_pair_scores(img_init, plan)[:TR]
            if plan.n_pairs < TR:
                s_all = jnp.concatenate([
                    s_all,
                    jnp.full(TR - plan.n_pairs, jnp.inf, s_all.dtype),
                ])
            scores = jnp.where(pair_valid_full, s_all, jnp.inf)
            neg, idx1 = jax.lax.top_k(-scores, k1)
            return neg, idx1

        @jax.jit
        def phase2(img_init, neg, idx1, hist_plan):
            # mirrors stage 2 (hist-plane gather + block histograms)
            sel_valid = jnp.isfinite(neg)
            t1 = jnp.take(pair_t_full, idx1, axis=0)
            r1 = jnp.take(pair_r_full, idx1, axis=0)
            sel = jnp.take(
                hist_plan.planes,
                jnp.minimum(idx1, hist_plan.n_pairs - 1), axis=0,
            )
            padh = (-k1) % 4
            if padh:
                sel = jnp.concatenate(
                    [sel, jnp.broadcast_to(sel[:1], (padh, sel.shape[1]))]
                )
            hs = hist_scores_from_planes(img_init, sel, 4, 4, 4)[:k1]
            hs = jnp.where(sel_valid, hs, -jnp.inf)
            _, idx2 = jax.lax.top_k(hs, 6)
            t2 = jnp.take(t1, idx2, axis=0)
            r2 = jnp.take(r1, idx2, axis=0)
            fv = jnp.take(sel_valid, idx2)
            t2 = jnp.where(fv[:, None], t2, t2[0])
            r2 = jnp.where(fv[:, None], r2, r2[0])
            return t2, r2, fv

        def one_fused_breakdown(seed: int):
            q = np.random.default_rng(seed)
            gt_t, gt_ypr = random_pose_inside(q, size)
            img_main = render_at(xyz, rgb, gt_t, gt_ypr, pano_hw)
            img_init = jnp.asarray(img_main[::init_step, ::init_step])
            np.asarray(img_init[0, 0])
            t0 = time.time()
            neg, idx1 = phase1(img_init, plan)
            np.asarray(idx1[0])
            s1 = time.time() - t0
            t0 = time.time()
            t2c, r2c, fv = phase2(img_init, neg, idx1, hist_plan)
            np.asarray(t2c[0])
            s2 = time.time() - t0
            t0 = time.time()
            res = call_descend(
                img_main, xyz_d, rgb_d, t2c, r2c, lo_d, hi_d, mask_d,
                num_iter=100, lr=0.1, patience=5, factor=0.8, masked=True,
                table_dtype=descent_table, prune=prune, multires=multires,
                start_valid=fv if prune is not None else None,
            )
            k = int(jnp.argmin(res.loss))
            t = np.asarray(res.t[k])
            s3 = time.time() - t0
            # bare fetch: a tiny device array already computed
            z = jnp.zeros(())
            np.asarray(z)
            fts = []
            for _ in range(5):
                tf = time.time()
                np.asarray(z)
                fts.append(time.time() - tf)
            f = float(np.median(fts))
            return s1, s2, s3, f, float(np.linalg.norm(t - gt_t))

        one_fused_breakdown(100)  # compile
        rows = [one_fused_breakdown(200 + i) for i in range(5)]
        s1 = float(np.median([r[0] for r in rows]))
        s2 = float(np.median([r[1] for r in rows]))
        s3 = float(np.median([r[2] for r in rows]))
        fetch = float(np.median([r[3] for r in rows]))
        # the fused one-dispatch program on the same scene, same process
        def one_fused(seed: int) -> float:
            q = np.random.default_rng(seed)
            gt_t, gt_ypr = random_pose_inside(q, size)
            img_main = render_at(xyz, rgb, gt_t, gt_ypr, pano_hw)
            img_init = img_main[::init_step, ::init_step]
            np.asarray(img_init[0, 0])
            t0 = time.time()
            res = call_query(
                img_init, img_main, xyz_d, rgb_d, trans_grid, rot_grid,
                trans_valid, lo_d, hi_d, mask_d,
                num_intermediate=num_intermediate, num_input=6,
                num_iter=100, lr=0.1, patience=5, factor=0.8, masked=True,
                plan=plan, hist_plan=hist_plan,
                descent_table=descent_table, descent_prune=prune,
                descent_multires=multires,
            )
            np.asarray(res.t)
            return time.time() - t0

        one_fused(100)
        fused = float(np.median([one_fused(300 + i) for i in range(5)]))
        out = {
            "metric": f"fused_phase_seconds ({mode})",
            "slab_stage1_s": round(s1, 4),
            "hist_trim_s": round(s2, 4),
            "descent_s": round(s3, 4),
            "fetch_s": round(fetch, 4),
            "composite_s": round(s1 + s2 + s3 - 2 * fetch, 4),
            "fused_measured_s": round(fused, 4),
            "median_t_err_m": round(
                float(np.median([r[4] for r in rows])), 4
            ),
            "descent_table": descent_table,
            "prune": prune, "multires": multires,
            "device": str(jax.devices()[0]),
        }
        print(json.dumps(out))
        return

    if "--breakdown" in sys.argv:
        # Per-stage fetch-forced timing (the staged dispatch path), for
        # reproducing docs/PERFORMANCE.md "Where the time goes" numbers.
        import jax.numpy as jnp  # noqa: F811 (clarity)

        from piccolo_tpu.kernels.slab_sampling import slab_pair_scores

        # un-jitted slab_pair_scores dispatches each group's ops eagerly
        # (measured ~2.4 s of frontend overhead); one jit restores the
        # fused path's ~50 ms kernel time
        score_slab = jax.jit(slab_pair_scores)

        def one_breakdown(seed: int):
            q = np.random.default_rng(seed)
            gt_t, gt_ypr = random_pose_inside(q, size)
            img_main = render_at(xyz, rgb, gt_t, gt_ypr, pano_hw)
            img_init = img_main[::init_step, ::init_step]
            np.asarray(img_init[0, 0])
            t0 = time.time()
            if plan is not None:
                scores = score_slab(jnp.asarray(img_init), plan)
            else:
                from piccolo_tpu.init.refine import score_pose_grid

                scores = score_pose_grid(
                    jnp.asarray(img_init), xyz_d, rgb_d,
                    trans_grid, rot_grid, mask_d, valid=trans_valid,
                )
            np.asarray(scores[0])
            s1 = time.time() - t0
            k1 = min(num_intermediate, scores.shape[0])
            _, idx1 = jax.lax.top_k(-scores, k1)
            if plan is not None:
                pt = jnp.repeat(trans_grid[:n_trans], rot_grid.shape[0], 0)
                pr = jnp.tile(rot_grid, (n_trans, 1))
            else:
                pt = jnp.repeat(trans_grid, rot_grid.shape[0], 0)
                pr = jnp.tile(rot_grid, (trans_grid.shape[0], 1))
            t1c = jnp.take(pt, idx1, axis=0)
            r1c = jnp.take(pr, idx1, axis=0)
            t0 = time.time()
            t2c, r2c = trim_by_hist(
                img_init, xyz_d, rgb_d, t1c, r1c, 6, 4, 4, mask_d
            )
            np.asarray(t2c[0])
            s2 = time.time() - t0
            t0 = time.time()
            res = call_descend(
                img_main, xyz_d, rgb_d, t2c, r2c, lo_d, hi_d, mask_d,
                num_iter=100, lr=0.1, patience=5, factor=0.8, masked=True,
                table_dtype=descent_table,
            )
            k = int(jnp.argmin(res.loss))
            t = np.asarray(res.t[k])
            s3 = time.time() - t0
            return s1, s2, s3, float(np.linalg.norm(t - gt_t))

        one_breakdown(100)  # compile
        rows = [one_breakdown(200 + i) for i in range(5)]
        out = {
            "metric": f"per_stage_seconds ({mode}, staged dispatch)",
            "stage1_s": round(float(np.median([r[0] for r in rows])), 4),
            "stage2_s": round(float(np.median([r[1] for r in rows])), 4),
            "descent_s": round(float(np.median([r[2] for r in rows])), 4),
            "median_t_err_m": round(
                float(np.median([r[3] for r in rows])), 4
            ),
            "stage1_impl": "slab" if plan is not None else "xla",
            "descent_table": descent_table,
            "device": str(jax.devices()[0]),
        }
        print(json.dumps(out))
        return

    def one_query(seed: int):
        q = np.random.default_rng(seed)
        gt_t, gt_ypr = random_pose_inside(q, size)
        img_main = render_at(xyz, rgb, gt_t, gt_ypr, pano_hw)
        img_init = img_main[::init_step, ::init_step]
        np.asarray(img_init[0, 0])  # force the GT render to finish pre-timer
        t0 = time.time()
        if use_fused:
            res = call_query(
                img_init, img_main, xyz_d, rgb_d, trans_grid, rot_grid,
                trans_valid, lo_d, hi_d, mask_d,
                num_intermediate=num_intermediate, num_input=6, num_iter=100,
                lr=0.1, patience=5, factor=0.8, masked=True, plan=plan,
                hist_plan=hist_plan,
                descent_table=descent_table, descent_prune=prune,
                descent_multires=multires,
            )
            t = np.asarray(res.t)
        else:
            t1, r1 = trim_by_loss(
                img_init, xyz_d, rgb_d,
                trans_grid, rot_grid, num_intermediate, mask_d,
                valid=trans_valid,
            )
            t2, r2 = trim_by_hist(
                img_init, xyz_d, rgb_d, t1, r1, 6, 4, 4, mask_d
            )
            res = call_descend(
                img_main, xyz_d, rgb_d, t2, r2, lo_d, hi_d, mask_d,
                num_iter=100, lr=0.1, patience=5, factor=0.8, masked=True,
                table_dtype=descent_table, prune=prune, multires=multires,
            )
            k = int(jnp.argmin(res.loss))
            t = np.asarray(res.t[k])
        elapsed = time.time() - t0
        t_err = float(np.linalg.norm(t - gt_t))
        return elapsed, t_err

    # warm-up query compiles everything
    degraded = None
    try:
        one_query(100)
    except Exception as e:  # platform-outage resilience, not error hiding
        if plan is None or "UNAVAILABLE" not in str(e):
            raise
        # The axon remote_compile endpoint dropped the slab-kernel
        # program (server-side compile timeout on a degraded frontend —
        # observed as "UNAVAILABLE: .../remote_compile: Broken pipe").
        # The benchmark must survive a compiler outage: fall back to the
        # XLA gather stage 1 and say so in the JSON rather than die.
        plan = None
        degraded = "slab-remote-compile-unavailable; xla stage-1 fallback"
        one_query(100)

    times, errs = [], []
    for i in range(5):
        elapsed, t_err = one_query(200 + i)
        times.append(elapsed)
        errs.append(t_err)

    sec_per_pano = float(np.median(times))
    baseline = BASELINE_SEC_PER_PANO_CPU.get(mode)
    label = {
        "stanford": "init+descent, 60k pts, 1024x512",
        "omniscenes": "init+descent, 60k pts, 2048x1024, 150-trans",
    }[mode]
    out = {
        "metric": f"sec_per_pano_end_to_end ({label})",
        "value": round(sec_per_pano, 4),
        "unit": "s/pano",
        "vs_baseline": (
            round(baseline / sec_per_pano, 2) if baseline else None
        ),
        "panos_per_sec": round(1.0 / sec_per_pano, 3),
        "median_t_err_m": round(float(np.median(errs)), 4),
        "device": str(jax.devices()[0]),
    }
    if degraded:
        out["degraded"] = degraded
    print(json.dumps(out))


if __name__ == "__main__":
    main()

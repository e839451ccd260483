"""Room-static stage-2 winner-bin planes (init.refine.HistPlan).

The histogram trim's z-buffer splat (reference utils.py:510-588 renders the
cloud at each candidate pose) depends only on room-static inputs, so it can
be precomputed per (room, init-image size) — stage 2 then gathers planes
and histograms them.  These tests pin: bit-exact equality against the live
splat path (standalone scorer and the full fused program, including padded
grids whose invalid pairs slip into the top-k), loud validation failures
for stale/mismatched plans and colour-rebind conflicts, and the harness
admission policy + background-build lifecycle.
"""

import types

import jax.numpy as jnp
import numpy as np
import pytest

from piccolo_tpu.config import make_config
from piccolo_tpu.harness.localize import _maybe_hist_plan
from piccolo_tpu.init import default_init_dict
from piccolo_tpu.init.candidates import (
    generate_rot_points,
    generate_trans_points,
)
from piccolo_tpu.init.refine import (
    HistPlan,
    build_hist_plan,
    hist_plan_bytes,
    hist_scores,
    hist_scores_from_planes,
)
from piccolo_tpu.ops.quantile import cloud_bounds
from piccolo_tpu.pipeline import localize_query
from piccolo_tpu.testing import make_room, render_at


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(7)
    xyz, rgb = make_room(rng, n_per_wall=1200, texture="checker")
    gt_t = np.array([0.5, -0.3, 0.2], np.float32)
    gt_ypr = np.array([1.2, 0.0, 0.0], np.float32)
    img = np.asarray(render_at(xyz, rgb, gt_t, gt_ypr, (128, 256)))
    d = default_init_dict(
        xy_only=True, num_trans=20, yaw_only=True, num_yaw=4, z_prior=None,
        num_split_h=4, num_split_w=4,
    )
    trans = generate_trans_points(xyz, d)
    rot = generate_rot_points(d)
    lo, hi = cloud_bounds(jnp.asarray(xyz), 0.05)
    return dict(xyz=xyz, rgb=rgb, img=img, trans=trans, rot=rot,
                lo=np.asarray(lo), hi=np.asarray(hi), gt_t=gt_t)


def test_scorer_bit_exact_vs_live_splat(scene):
    T, R = scene["trans"].shape[0], scene["rot"].shape[0]
    plan = build_hist_plan(
        scene["xyz"], scene["rgb"], scene["trans"], scene["rot"], 128, 256
    )
    assert plan.planes.dtype == jnp.int16
    assert plan.n_pairs == T * R
    assert plan.nbytes == hist_plan_bytes(T * R, 128, 256)

    pair_t = jnp.repeat(jnp.asarray(scene["trans"]), R, axis=0)
    pair_r = jnp.tile(jnp.asarray(scene["rot"]), (T, 1))
    pad = (-(T * R)) % 8
    pt = jnp.concatenate([pair_t, jnp.broadcast_to(pair_t[:1], (pad, 3))])
    pr = jnp.concatenate([pair_r, jnp.broadcast_to(pair_r[:1], (pad, 3))])
    live = hist_scores(
        jnp.asarray(scene["img"]), jnp.asarray(scene["xyz"]),
        jnp.asarray(scene["rgb"]), pt, pr,
        num_split_h=4, num_split_w=4,
    )[: T * R]
    sel = jnp.concatenate([
        plan.planes,
        jnp.broadcast_to(plan.planes[:1], (pad, plan.planes.shape[1])),
    ])
    from_planes = hist_scores_from_planes(
        jnp.asarray(scene["img"]), sel, 4, 4, 8
    )[: T * R]
    np.testing.assert_array_equal(np.asarray(live), np.asarray(from_planes))


def _fused(scene, trans, rot, valid, plan, **kw):
    return localize_query(
        jnp.asarray(scene["img"]), jnp.asarray(scene["img"]),
        jnp.asarray(scene["xyz"]), jnp.asarray(scene["rgb"]),
        jnp.asarray(trans), jnp.asarray(rot), jnp.asarray(valid),
        jnp.asarray(scene["lo"]), jnp.asarray(scene["hi"]),
        hist_plan=plan, num_intermediate=10, num_input=4, num_iter=30, **kw,
    )


def test_fused_equality_and_recovery(scene):
    T = scene["trans"].shape[0]
    plan = build_hist_plan(
        scene["xyz"], scene["rgb"], scene["trans"], scene["rot"], 128, 256
    )
    valid = np.ones(T, bool)
    a = _fused(scene, scene["trans"], scene["rot"], valid, None)
    b = _fused(scene, scene["trans"], scene["rot"], valid, plan)
    for f in ("t", "loss", "winner", "start_t", "start_ypr", "cand_loss"):
        np.testing.assert_array_equal(
            np.asarray(getattr(a, f)), np.asarray(getattr(b, f)), err_msg=f
        )
    assert float(jnp.linalg.norm(b.t - jnp.asarray(scene["gt_t"]))) < 0.25


def test_fused_equality_with_grid_padding(scene):
    """Padding rows beyond the plan's n_pairs can enter top-k when valid
    pairs are scarce; their clamped plane gathers must stay masked."""
    real_t = scene["trans"][:2]  # 2x4 = 8 real pairs < num_intermediate=10
    pad_t = np.concatenate([real_t, np.zeros((3, 3), np.float32)])
    valid = np.array([True, True, False, False, False])
    plan = build_hist_plan(
        scene["xyz"], scene["rgb"], real_t, scene["rot"], 128, 256
    )
    a = _fused(scene, pad_t, scene["rot"], valid, None)
    b = _fused(scene, pad_t, scene["rot"], valid, plan)
    for f in ("t", "loss", "winner", "start_t", "start_ypr", "cand_loss"):
        np.testing.assert_array_equal(
            np.asarray(getattr(a, f)), np.asarray(getattr(b, f)), err_msg=f
        )


def test_validation_fails_loudly(scene):
    T = scene["trans"].shape[0]
    valid = np.ones(T, bool)
    plan = build_hist_plan(
        scene["xyz"], scene["rgb"], scene["trans"], scene["rot"], 128, 256
    )
    # image-shape mismatch (plan baked for another init size)
    stale_shape = HistPlan(plan.planes, plan.n_pairs, 64, 128)
    with pytest.raises(ValueError, match="init image"):
        _fused(scene, scene["trans"], scene["rot"], valid, stale_shape)
    # stale pair count (plan from different grids)
    stale_pairs = HistPlan(plan.planes, plan.n_pairs + scene["rot"].shape[0],
                           128, 256)
    with pytest.raises(ValueError, match="stale"):
        _fused(scene, scene["trans"], scene["rot"], valid, stale_pairs)
    # per-query colour rebinds invalidate baked bins
    with pytest.raises(ValueError, match="rebind"):
        _fused(scene, scene["trans"], scene["rot"], valid, plan,
               plan_refresh_rgb=True)


def _room_state(scene):
    xyz = jnp.asarray(scene["xyz"])
    grids = types.SimpleNamespace(
        trans=jnp.asarray(scene["trans"]), rot=jnp.asarray(scene["rot"]),
        n_trans=int(scene["trans"].shape[0]),
        valid=jnp.ones(scene["trans"].shape[0], bool),
    )
    cache = dict(xyz=xyz, rgb=jnp.asarray(scene["rgb"]),
                 mask=jnp.ones(xyz.shape[0], bool))
    return cache, grids


def test_harness_admission_gates(scene):
    cache, grids = _room_state(scene)
    img = np.asarray(scene["img"])
    # off switch
    cfg = make_config(dataset="Stanford2D-3D-S", hist_planes=False)
    assert _maybe_hist_plan(cfg, cache, grids, img) is None
    # per-query colour rebinds bake different bins every query
    for key in ("sharpen_color", "match_color"):
        cfg = make_config(dataset="Stanford2D-3D-S", hist_planes=True,
                          **{key: True})
        assert _maybe_hist_plan(cfg, cache, grids, img) is None
    # criterion='loss' has no stage 2
    cfg = make_config(dataset="Stanford2D-3D-S", hist_planes=True,
                      criterion="loss")
    assert _maybe_hist_plan(cfg, cache, grids, img) is None
    # auto mode stays off on CPU (the win is TPU scatter-cost-shaped)
    cfg = make_config(dataset="Stanford2D-3D-S", hist_planes="auto")
    assert _maybe_hist_plan(cfg, cache, grids, img) is None


def test_harness_background_build_handoff(scene):
    cfg = make_config(dataset="Stanford2D-3D-S", hist_planes=True,
                      slab_background_build=True)
    cache, grids = _room_state(scene)
    img = np.asarray(scene["img"])
    # first call: build starts in the background, query keeps the live splat
    assert _maybe_hist_plan(cfg, cache, grids, img) is None
    pend = [k for k in cache if isinstance(k, tuple)
            and k[0] == "hist_plan_pending"]
    assert len(pend) == 1
    cache[pend[0]]["thread"].join(timeout=120)
    plan = _maybe_hist_plan(cfg, cache, grids, img)
    assert plan is not None
    direct = build_hist_plan(
        scene["xyz"], scene["rgb"], scene["trans"], scene["rot"], 128, 256,
        point_mask=cache["mask"],
    )
    np.testing.assert_array_equal(
        np.asarray(plan.planes), np.asarray(direct.planes)
    )
    # sync mode (serving warm path) returns a plan immediately
    cache2, grids2 = _room_state(scene)
    assert _maybe_hist_plan(cfg, cache2, grids2, img, sync=True) is not None


def _sharded(scene, mesh, plan, trans=None, valid=None, **kw):
    from piccolo_tpu.parallel import localize_query_sharded

    trans = scene["trans"] if trans is None else trans
    valid = np.ones(trans.shape[0], bool) if valid is None else valid
    return localize_query_sharded(
        mesh, jnp.asarray(scene["img"]), jnp.asarray(scene["img"]),
        scene["xyz"], scene["rgb"], trans, scene["rot"], valid,
        scene["lo"], scene["hi"],
        hist_plan=plan, num_intermediate=10, num_input=4, num_iter=30, **kw,
    )


@pytest.mark.parametrize("n_cand,n_point", [(2, 4), (4, 2)])
def test_sharded_equality_vs_live_and_single_device(scene, n_cand, n_point):
    """hist planes x mesh: the 'cand'-sharded plane path must reproduce the
    live point-sharded splat + pmin stage 2 — identical starting candidates
    and descent results — and agree with the single-device plane path."""
    from piccolo_tpu.parallel import make_mesh, shard_hist_plan

    mesh = make_mesh(n_cand, n_point)
    base = build_hist_plan(
        scene["xyz"], scene["rgb"], scene["trans"], scene["rot"], 128, 256
    )
    plan = shard_hist_plan(mesh, base)
    assert plan.planes.shape[0] % n_cand == 0
    a = _sharded(scene, mesh, None)
    b = _sharded(scene, mesh, plan)
    for f in ("t", "loss", "winner", "start_t", "start_ypr", "cand_loss"):
        np.testing.assert_array_equal(
            np.asarray(getattr(a, f)), np.asarray(getattr(b, f)), err_msg=f
        )
    # the single-device plane path picks the same starts (descent results
    # differ only in psum reduction order, so compare starts exactly)
    c = _fused(scene, scene["trans"], scene["rot"],
               np.ones(scene["trans"].shape[0], bool), base)
    np.testing.assert_array_equal(np.asarray(b.start_t), np.asarray(c.start_t))
    np.testing.assert_array_equal(
        np.asarray(b.start_ypr), np.asarray(c.start_ypr)
    )


def test_sharded_validation_and_rebind_conflict(scene):
    from piccolo_tpu.parallel import make_mesh, shard_hist_plan

    mesh = make_mesh(2, 4)
    base = build_hist_plan(
        scene["xyz"], scene["rgb"], scene["trans"], scene["rot"], 128, 256
    )
    plan = shard_hist_plan(mesh, base)
    stale = HistPlan(plan.planes, plan.n_pairs + scene["rot"].shape[0],
                     128, 256)
    with pytest.raises(ValueError, match="stale"):
        _sharded(scene, mesh, stale)
    with pytest.raises(ValueError, match="rebind"):
        _sharded(scene, mesh, plan, plan_refresh_rgb=True)


def test_harness_sharded_hist_plan(scene):
    from piccolo_tpu.harness.localize import _maybe_sharded_hist_plan
    from piccolo_tpu.parallel import make_mesh

    mesh = make_mesh(2, 4)
    cfg = make_config(dataset="Stanford2D-3D-S", hist_planes=True)
    cache, grids = _room_state(scene)
    img = np.asarray(scene["img"])
    plan = _maybe_sharded_hist_plan(cfg, cache, grids, img, mesh)
    assert plan is not None
    assert plan.planes.shape[0] % mesh.shape["cand"] == 0
    # cached per (room, size, factorization); colour rebinds gate off
    assert _maybe_sharded_hist_plan(cfg, cache, grids, img, mesh) is plan
    cfg2 = make_config(dataset="Stanford2D-3D-S", hist_planes=True,
                       sharpen_color=True)
    cache2, grids2 = _room_state(scene)
    assert _maybe_sharded_hist_plan(cfg2, cache2, grids2, img, mesh) is None


def test_harness_build_failure_marks_room(scene, monkeypatch):
    cfg = make_config(dataset="Stanford2D-3D-S", hist_planes=True,
                      slab_background_build=False)
    cache, grids = _room_state(scene)
    img = np.asarray(scene["img"])
    calls = {"n": 0}

    def boom(*a, **k):
        calls["n"] += 1
        raise RuntimeError("synthetic build failure")

    monkeypatch.setattr("piccolo_tpu.init.refine.build_hist_plan", boom)
    assert _maybe_hist_plan(cfg, cache, grids, img) is None
    assert _maybe_hist_plan(cfg, cache, grids, img) is None
    assert calls["n"] == 1  # the failing build must not re-run per query

"""Solver tests, including the render-then-recover integration oracle:

Render a panorama from a synthetic colored cloud at a known pose, then verify
the descent recovers that pose from a nearby start. This is the strongest
self-consistent oracle the problem offers (SURVEY §4) — no dataset needed.
"""

import jax.numpy as jnp
import numpy as np

from piccolo_tpu.loss import Pose, sampling_loss
from piccolo_tpu.ops.pano import render_pano
from piccolo_tpu.ops.quantile import cloud_bounds
from piccolo_tpu.ops.rotation import rot_from_ypr
from piccolo_tpu.solver import descend, solve


def make_room(rng, n_per_wall=4000, size=(6.0, 4.0, 3.0)):
    """A colored box room: 6 walls with distinct smooth color gradients."""
    sx, sy, sz = size
    pts, cols = [], []
    for axis, sign in [(0, 1), (0, -1), (1, 1), (1, -1), (2, 1), (2, -1)]:
        uv = rng.random((n_per_wall, 2)).astype(np.float32)
        p = np.empty((n_per_wall, 3), np.float32)
        dims = [d for d in range(3) if d != axis]
        ext = [size[d] for d in dims]
        p[:, dims[0]] = (uv[:, 0] - 0.5) * ext[0]
        p[:, dims[1]] = (uv[:, 1] - 0.5) * ext[1]
        p[:, axis] = sign * size[axis] / 2
        base = np.zeros(3, np.float32)
        base[axis] = 0.75 if sign > 0 else 0.25
        c = np.clip(
            base[None, :] + 0.5 * np.stack([uv[:, 0], uv[:, 1], uv[:, 0] * uv[:, 1]], 1),
            0.05,
            1.0,
        ).astype(np.float32)
        pts.append(p)
        cols.append(c)
    return np.concatenate(pts), np.concatenate(cols)


def render_at(xyz, rgb, t, ypr, resolution=(256, 512)):
    R = rot_from_ypr(jnp.asarray(ypr))
    cam = (jnp.asarray(xyz) - jnp.asarray(t)) @ R.T
    return render_pano(cam, jnp.asarray(rgb), resolution) / 255.0


def test_render_then_recover(rng):
    xyz, rgb = make_room(rng)
    gt_t = np.array([0.4, -0.3, 0.2], np.float32)
    gt_ypr = np.array([0.5, 0.0, 0.0], np.float32)
    img = render_at(xyz, rgb, gt_t, gt_ypr)

    lo, hi = cloud_bounds(jnp.asarray(xyz), 0.05)
    # start near the GT (the init stage supplies such starts in the pipeline)
    t0 = jnp.asarray((gt_t + np.array([0.3, -0.25, 0.1], np.float32))[None])
    ypr0 = jnp.asarray((gt_ypr + np.array([0.25, 0.0, 0.0], np.float32))[None])

    t, R, loss, res = solve(
        img,
        jnp.asarray(xyz),
        jnp.asarray(rgb),
        t0,
        ypr0,
        lo,
        hi,
        num_iter=100,
        lr=0.1,
        patience=5,
        factor=0.8,
    )
    t_err = float(jnp.linalg.norm(t - jnp.asarray(gt_t)))
    R_gt = np.asarray(rot_from_ypr(jnp.asarray(gt_ypr)))
    tr = np.clip((np.trace(np.asarray(R).T @ R_gt) - 1) / 2, -1, 1)
    r_err = np.degrees(np.arccos(tr))
    assert t_err < 0.2, t_err
    assert r_err < np.degrees(0.2), r_err


def test_multi_start_picks_best(rng):
    xyz, rgb = make_room(rng, n_per_wall=2000)
    gt_t = np.array([0.0, 0.0, 0.0], np.float32)
    gt_ypr = np.array([1.0, 0.0, 0.0], np.float32)
    img = render_at(xyz, rgb, gt_t, gt_ypr, resolution=(128, 256))

    lo, hi = cloud_bounds(jnp.asarray(xyz), 0.05)
    # 4 yaw starts; only one is close.
    t0 = jnp.zeros((4, 3))
    ypr0 = jnp.asarray(
        np.stack(
            [np.array([y, 0, 0], np.float32) for y in (1.2, 2.5, 4.0, 5.5)]
        )
    )
    t, R, loss, res = solve(
        img, jnp.asarray(xyz), jnp.asarray(rgb), t0, ypr0, lo, hi,
        num_iter=60, lr=0.1, patience=5, factor=0.8,
    )
    assert int(jnp.argmin(res.loss)) == 0
    assert float(res.loss[0]) < float(res.loss[1])


def test_translation_stays_in_box(rng):
    xyz, rgb = make_room(rng, n_per_wall=1000)
    img = render_at(xyz, rgb, np.zeros(3, np.float32), np.zeros(3, np.float32),
                    resolution=(64, 128))
    lo, hi = cloud_bounds(jnp.asarray(xyz), 0.05)
    # absurd start far outside the room: clamp must keep it in the box
    t0 = jnp.asarray(np.array([[50.0, -50.0, 30.0]], np.float32))
    ypr0 = jnp.zeros((1, 3))
    res = descend(
        img, jnp.asarray(xyz), jnp.asarray(rgb), t0, ypr0, lo, hi,
        num_iter=5, lr=0.1, patience=5, factor=0.8,
    )
    assert np.all(np.asarray(res.t[0]) >= np.asarray(lo) - 1e-5)
    assert np.all(np.asarray(res.t[0]) <= np.asarray(hi) + 1e-5)


def test_loss_decreases(rng):
    xyz, rgb = make_room(rng, n_per_wall=1500)
    gt_ypr = np.array([0.8, 0.0, 0.0], np.float32)
    img = render_at(xyz, rgb, np.zeros(3, np.float32), gt_ypr, resolution=(128, 256))
    lo, hi = cloud_bounds(jnp.asarray(xyz), 0.05)
    t0 = jnp.asarray(np.array([[0.3, 0.3, 0.1]], np.float32))
    ypr0 = jnp.asarray(np.array([[1.1, 0.0, 0.0]], np.float32))

    pose0 = Pose(t0[0], ypr0[0, 0], ypr0[0, 1], ypr0[0, 2])
    initial = float(
        sampling_loss(pose0, jnp.asarray(xyz), jnp.asarray(rgb), img)
    )
    res = descend(
        img, jnp.asarray(xyz), jnp.asarray(rgb), t0, ypr0, lo, hi,
        num_iter=50, lr=0.1, patience=5, factor=0.8,
    )
    assert float(res.loss[0]) < initial


# ---- descent prune speed mode (solver._descend_pruned) ----


def test_check_prune_normalisation():
    import pytest

    from piccolo_tpu.solver import _check_prune

    assert _check_prune(None, 50, 4, False) is None
    assert _check_prune((0, 2), 50, 4, False) is None  # off
    assert _check_prune((50, 2), 50, 4, False) is None  # nothing saved
    assert _check_prune((10, 4), 50, 4, False) is None  # keeps everyone
    assert _check_prune((10, 2), 50, 4, False) == (10, 2)
    with pytest.raises(ValueError):
        _check_prune((10, 0), 50, 4, False)
    with pytest.raises(ValueError):
        _check_prune((10, 2), 50, 4, True)  # trajectory + prune


def test_descend_prune_recovers_and_aligns(rng):
    """Pruned descent recovers the pose, keeps per-candidate row order, and
    freezes pruned rows at their phase-1 state."""
    xyz, rgb = make_room(rng, n_per_wall=2000)
    gt_ypr = np.array([1.0, 0.0, 0.0], np.float32)
    img = render_at(xyz, rgb, np.zeros(3, np.float32), gt_ypr,
                    resolution=(128, 256))
    lo, hi = cloud_bounds(jnp.asarray(xyz), 0.05)
    t0 = jnp.zeros((4, 3))
    ypr0 = jnp.asarray(
        np.stack(
            [np.array([y, 0, 0], np.float32) for y in (1.2, 2.5, 4.0, 5.5)]
        )
    )
    kw = dict(num_iter=60, lr=0.1, patience=5, factor=0.8)
    full = descend(img, jnp.asarray(xyz), jnp.asarray(rgb), t0, ypr0, lo, hi,
                   **kw)
    pruned = descend(img, jnp.asarray(xyz), jnp.asarray(rgb), t0, ypr0,
                     lo, hi, prune=(15, 2), **kw)

    # the near start (row 0) wins either way and lands on the same pose
    assert int(jnp.argmin(pruned.loss)) == 0
    np.testing.assert_allclose(
        np.asarray(pruned.t[0]), np.asarray(full.t[0]), atol=1e-3
    )

    # pruned rows report their phase-1 (iteration-15) state
    phase1 = descend(img, jnp.asarray(xyz), jnp.asarray(rgb), t0, ypr0,
                     lo, hi, num_iter=15, lr=0.1, patience=5, factor=0.8)
    l1 = np.asarray(phase1.loss)
    survivors = set(np.argsort(l1)[:2].tolist())
    for i in range(4):
        if i in survivors:
            continue
        np.testing.assert_allclose(
            np.asarray(pruned.t[i]), np.asarray(phase1.t[i]), atol=1e-5
        )
        np.testing.assert_allclose(
            float(pruned.loss[i]), float(l1[i]), atol=1e-6
        )


def test_descend_prune_clone_rows_cannot_claim_survivor_slots(rng):
    """Duplicate-best clone rows (the harness's scarce-valid fallback) tie
    bit-identically with the best start at the prune point; ``start_valid``
    must keep them out of the survivor slots so the genuinely-distinct
    second candidate finishes the budget."""
    xyz, rgb = make_room(rng, n_per_wall=2000)
    gt_ypr = np.array([1.0, 0.0, 0.0], np.float32)
    img = render_at(xyz, rgb, np.zeros(3, np.float32), gt_ypr,
                    resolution=(128, 256))
    lo, hi = cloud_bounds(jnp.asarray(xyz), 0.05)
    # rows: [best, distinct-second, clone-of-best, clone-of-best]
    t0 = jnp.zeros((4, 3))
    ypr0 = jnp.asarray(np.stack([
        [1.1, 0, 0], [1.6, 0, 0], [1.1, 0, 0], [1.1, 0, 0],
    ]).astype(np.float32))
    valid = jnp.asarray([True, True, False, False])
    kw = dict(num_iter=40, lr=0.1, patience=5, factor=0.8)
    pruned = descend(img, jnp.asarray(xyz), jnp.asarray(rgb), t0, ypr0,
                     lo, hi, prune=(10, 2), start_valid=valid, **kw)
    phase1 = descend(img, jnp.asarray(xyz), jnp.asarray(rgb), t0, ypr0,
                     lo, hi, num_iter=10, lr=0.1, patience=5, factor=0.8)
    # the distinct second candidate survived (kept descending past iter 10)
    assert float(pruned.loss[1]) < float(phase1.loss[1]) - 1e-4
    # the clone rows are frozen at their phase-1 state
    for i in (2, 3):
        np.testing.assert_allclose(
            np.asarray(pruned.t[i]), np.asarray(phase1.t[i]), atol=1e-5
        )


# ---- multi-resolution descent speed mode (_descend_single_multires) ----


def test_check_multires_normalisation():
    """Off / no-op / invalid multires combinations resolve like prune's."""
    import pytest

    from piccolo_tpu.solver import _check_multires

    assert _check_multires(None, 100, None, False) is None
    assert _check_multires((0, 2), 100, None, False) is None  # off
    assert _check_multires((70, 2), 100, None, False) == (70, 2)
    with pytest.raises(ValueError, match="stride"):
        _check_multires((70, 1), 100, None, False)
    with pytest.raises(ValueError, match="full-res"):
        _check_multires((100, 2), 100, None, False)
    with pytest.raises(ValueError, match="prune"):
        _check_multires((70, 2), 100, (30, 2), False)
    with pytest.raises(ValueError, match="trajectory"):
        _check_multires((70, 2), 100, None, True)


def test_descend_multires_recovers(rng):
    """Multi-resolution descent lands on the full-resolution answer: the
    winner matches the single-resolution descent's pose to mm and the
    final loss is evaluated at full resolution (comparable argmin)."""
    xyz, rgb = make_room(rng, n_per_wall=2000)
    gt_t = np.array([0.3, -0.2, 0.1], np.float32)
    gt_ypr = np.array([1.0, 0.0, 0.0], np.float32)
    img = render_at(xyz, rgb, gt_t, gt_ypr, resolution=(256, 512))
    lo, hi = cloud_bounds(jnp.asarray(xyz), 0.05)
    t0 = jnp.asarray(np.stack([
        gt_t + [0.2, -0.15, 0.05], [1.0, 1.0, 0.3],
    ]).astype(np.float32))
    ypr0 = jnp.asarray(np.stack([
        [1.2, 0, 0], [3.0, 0, 0],
    ]).astype(np.float32))
    kw = dict(num_iter=100, lr=0.1, patience=5, factor=0.8)
    full = descend(img, jnp.asarray(xyz), jnp.asarray(rgb), t0, ypr0,
                   lo, hi, **kw)
    mr = descend(img, jnp.asarray(xyz), jnp.asarray(rgb), t0, ypr0,
                 lo, hi, multires=(70, 2), **kw)
    assert int(jnp.argmin(mr.loss)) == int(jnp.argmin(full.loss)) == 0
    # the near start converges to the same pose through the switch
    assert float(jnp.linalg.norm(mr.t[0] - jnp.asarray(gt_t))) < 0.02
    np.testing.assert_allclose(
        np.asarray(mr.t[0]), np.asarray(full.t[0]), atol=5e-3
    )
    # final losses are full-resolution (same scale as the full descent's)
    np.testing.assert_allclose(
        float(mr.loss[0]), float(full.loss[0]), atol=5e-3
    )


def test_localize_query_multires_matches_full(rng):
    """The fused pipeline's descent_multires picks the same winner and
    lands within mm of the full-resolution fused query."""
    from piccolo_tpu.init import default_init_dict
    from piccolo_tpu.init.candidates import (
        generate_rot_points,
        generate_trans_points,
    )
    from piccolo_tpu.pipeline import localize_query

    xyz, rgb = make_room(rng, n_per_wall=2000)
    gt_t = np.array([0.2, -0.3, 0.15], np.float32)
    gt_ypr = np.array([0.8, 0.0, 0.0], np.float32)
    img = render_at(xyz, rgb, gt_t, gt_ypr, resolution=(128, 256))
    init_dict = default_init_dict(
        xy_only=True, yaw_only=True, num_yaw=4, num_trans=12, z_prior=None,
        num_split_h=4, num_split_w=4,
    )
    trans = generate_trans_points(np.asarray(xyz), init_dict)
    rot = generate_rot_points(init_dict)
    valid = np.ones(trans.shape[0], bool)
    lo, hi = cloud_bounds(jnp.asarray(xyz), 0.05)
    kw = dict(
        num_intermediate=8, num_input=3, num_iter=60, lr=0.1,
        patience=5, factor=0.8,
    )
    full = localize_query(
        img, img, jnp.asarray(xyz), jnp.asarray(rgb), jnp.asarray(trans),
        jnp.asarray(rot), jnp.asarray(valid), lo, hi, **kw,
    )
    mr = localize_query(
        img, img, jnp.asarray(xyz), jnp.asarray(rgb), jnp.asarray(trans),
        jnp.asarray(rot), jnp.asarray(valid), lo, hi,
        descent_multires=(40, 2), **kw,
    )
    assert int(mr.winner) == int(full.winner)
    np.testing.assert_array_equal(  # stages 1+2 are untouched by multires
        np.asarray(mr.start_t), np.asarray(full.start_t)
    )
    np.testing.assert_allclose(
        np.asarray(mr.t), np.asarray(full.t), atol=1e-2
    )
    assert float(jnp.linalg.norm(mr.t - jnp.asarray(gt_t))) < 0.05

"""Fused whole-query pipeline must match the staged path and recover poses."""

import jax.numpy as jnp
import numpy as np

from piccolo_tpu.init import default_init_dict
from piccolo_tpu.init.candidates import generate_rot_points, generate_trans_points
from piccolo_tpu.init.refine import trim_by_hist, trim_by_loss
from piccolo_tpu.ops.quantile import cloud_bounds
from piccolo_tpu.pipeline import localize_query
from piccolo_tpu.solver import descend
from piccolo_tpu.testing import make_room, render_at


def _setup(rng):
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
    return xyz, rgb, img, trans, rot, np.asarray(lo), np.asarray(hi), gt_t


def test_fused_matches_staged(rng):
    xyz, rgb, img, trans, rot, lo, hi, gt_t = _setup(rng)
    kw = dict(num_iter=40, lr=0.1, patience=5, factor=0.8)

    # staged
    t1, r1 = trim_by_loss(
        jnp.asarray(img), jnp.asarray(xyz), jnp.asarray(rgb),
        jnp.asarray(trans), jnp.asarray(rot), 10,
    )
    t2, r2 = trim_by_hist(
        jnp.asarray(img), jnp.asarray(xyz), jnp.asarray(rgb), t1, r1, 4, 4, 4
    )
    staged = descend(
        jnp.asarray(img), jnp.asarray(xyz), jnp.asarray(rgb),
        t2, r2, jnp.asarray(lo), jnp.asarray(hi), **kw,
    )

    # fused
    res = localize_query(
        jnp.asarray(img), jnp.asarray(img), jnp.asarray(xyz), jnp.asarray(rgb),
        jnp.asarray(trans), jnp.asarray(rot),
        jnp.ones(trans.shape[0], bool), jnp.asarray(lo), jnp.asarray(hi),
        num_intermediate=10, num_input=4, **kw,
    )

    # same starting candidates selected (set equality: top_k vs argsort may
    # order equal-score entries differently)
    staged_starts = {tuple(np.round(r, 5)) for r in np.asarray(t2)}
    fused_starts = {tuple(np.round(r, 5)) for r in np.asarray(res.start_t)}
    assert staged_starts == fused_starts

    # winner agrees
    k = int(np.argmin(np.asarray(staged.loss)))
    np.testing.assert_allclose(
        np.asarray(res.t), np.asarray(staged.t[k]), atol=1e-4
    )
    np.testing.assert_allclose(float(res.loss), float(staged.loss[k]), atol=1e-5)


def test_fused_recovers_pose(rng):
    xyz, rgb, img, trans, rot, lo, hi, gt_t = _setup(rng)
    res = localize_query(
        jnp.asarray(img), jnp.asarray(img), jnp.asarray(xyz), jnp.asarray(rgb),
        jnp.asarray(trans), jnp.asarray(rot),
        jnp.ones(trans.shape[0], bool), jnp.asarray(lo), jnp.asarray(hi),
        num_intermediate=10, num_input=4, num_iter=80,
    )
    assert float(jnp.linalg.norm(res.t - jnp.asarray(gt_t))) < 0.2
    assert res.cand_loss.shape == (4,)
    assert int(res.winner) == int(np.argmin(np.asarray(res.cand_loss)))


def test_fused_padding_rows_never_win(rng):
    xyz, rgb, img, trans, rot, lo, hi, gt_t = _setup(rng)
    # pad the grid with rows sitting exactly on the GT — but marked invalid
    bad = np.broadcast_to(gt_t, (8, 3)).copy()
    trans_p = np.concatenate([trans, bad]).astype(np.float32)
    valid = np.concatenate([np.ones(len(trans), bool), np.zeros(8, bool)])
    res = localize_query(
        jnp.asarray(img), jnp.asarray(img), jnp.asarray(xyz), jnp.asarray(rgb),
        jnp.asarray(trans_p), jnp.asarray(rot),
        jnp.asarray(valid), jnp.asarray(lo), jnp.asarray(hi),
        num_intermediate=10, num_input=4, num_iter=5,
    )
    # none of the selected starts may be a padding row
    for s in np.asarray(res.start_t):
        assert not np.allclose(s, gt_t, atol=1e-6)

"""Fused whole-query pipeline must match the staged path and recover poses."""

import jax.numpy as jnp
import numpy as np
import pytest

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


def test_fused_invalid_rows_blocked_when_valid_pairs_scarce(rng):
    """Fewer valid (trans,rot) pairs than num_intermediate: the +inf padding
    candidates that slip through stage-1 top_k must never survive the
    histogram ranking into the descent starts (regression)."""
    xyz, rgb, img, trans, rot, lo, hi, gt_t = _setup(rng)
    # only 3 valid translations x 4 rots = 12 pairs < num_intermediate=20;
    # padding rows sit exactly on the GT so any leak would win the descent
    few = trans[:3]
    bad = np.broadcast_to(gt_t, (5, 3)).astype(np.float32)
    trans_p = np.concatenate([few, bad])
    valid = np.concatenate([np.ones(3, bool), np.zeros(5, bool)])
    res = localize_query(
        jnp.asarray(img), jnp.asarray(img), jnp.asarray(xyz), jnp.asarray(rgb),
        jnp.asarray(trans_p), jnp.asarray(rot),
        jnp.asarray(valid), jnp.asarray(lo), jnp.asarray(hi),
        num_intermediate=20, num_input=6, num_iter=5,
    )
    for s in np.asarray(res.start_t):
        assert not np.allclose(s, gt_t, atol=1e-6), np.asarray(res.start_t)


def test_make_input_subsample_with_padded_mask(rng):
    """sample_rate_for_init + a padded point_mask must compose (regression:
    the Bernoulli keep vector was drawn at the filtered length)."""
    from piccolo_tpu.init import default_init_dict, make_input

    xyz, rgb = make_room(rng, n_per_wall=400)
    img = render_at(xyz, rgb, np.zeros(3, np.float32),
                    np.zeros(3, np.float32), (32, 64))
    pad = 123
    xyz_p = np.concatenate([xyz, np.zeros((pad, 3), np.float32)])
    rgb_p = np.concatenate([rgb, np.zeros((pad, 3), np.float32)])
    mask = jnp.arange(xyz_p.shape[0]) < xyz.shape[0]
    d = default_init_dict(xy_only=True, num_trans=8, yaw_only=True,
                          num_yaw=4, z_prior=None, sample_rate_for_init=3)
    t, r = make_input(img, jnp.asarray(xyz_p), jnp.asarray(rgb_p), 3, d,
                      "loss_histogram", 6, point_mask=mask)
    assert t.shape == (3, 3) and r.shape == (3, 3)
    # the kept subset is independent of padding: same candidates unpadded
    t2, r2 = make_input(img, jnp.asarray(xyz), jnp.asarray(rgb), 3, d,
                        "loss_histogram", 6)
    np.testing.assert_allclose(t, t2, atol=1e-6)


@pytest.mark.parametrize("criterion", ["loss_histogram", "loss"])
def test_fused_padding_rows_never_win(rng, criterion):
    xyz, rgb, img, trans, rot, lo, hi, gt_t = _setup(rng)
    # pad the grid with rows sitting exactly on the GT — but marked invalid
    bad = np.broadcast_to(gt_t, (8, 3)).copy()
    trans_p = np.concatenate([trans, bad]).astype(np.float32)
    valid = np.concatenate([np.ones(len(trans), bool), np.zeros(8, bool)])
    res = localize_query(
        jnp.asarray(img), jnp.asarray(img), jnp.asarray(xyz), jnp.asarray(rgb),
        jnp.asarray(trans_p), jnp.asarray(rot),
        jnp.asarray(valid), jnp.asarray(lo), jnp.asarray(hi),
        num_intermediate=10, num_input=4, num_iter=5, criterion=criterion,
    )
    # none of the selected starts may be a padding row
    for s in np.asarray(res.start_t):
        assert not np.allclose(s, gt_t, atol=1e-6)


def test_fused_with_slab_plan_matches_plain(rng):
    """Slab-kernel stage 1 selects the same starts and winner as XLA stage 1."""
    from piccolo_tpu.kernels.slab_sampling import build_grid_plan

    xyz, rgb, img, trans, rot, lo, hi, gt_t = _setup(rng)
    kw = dict(
        num_intermediate=10, num_input=4,
        num_iter=30, lr=0.1, patience=5, factor=0.8,
    )
    args = (
        jnp.asarray(img), jnp.asarray(img), jnp.asarray(xyz), jnp.asarray(rgb),
        jnp.asarray(trans), jnp.asarray(rot),
        jnp.ones(trans.shape[0], bool), jnp.asarray(lo), jnp.asarray(hi),
    )
    plain = localize_query(*args, **kw)
    plan = build_grid_plan(
        jnp.asarray(xyz), jnp.asarray(rgb), None,
        jnp.asarray(trans), jnp.asarray(rot), img.shape[0], img.shape[1],
    )
    slab = localize_query(*args, plan=plan, **kw)

    plain_starts = {tuple(np.round(r, 5)) for r in np.asarray(plain.start_t)}
    slab_starts = {tuple(np.round(r, 5)) for r in np.asarray(slab.start_t)}
    assert plain_starts == slab_starts
    np.testing.assert_allclose(np.asarray(slab.t), np.asarray(plain.t), atol=1e-4)
    np.testing.assert_allclose(float(slab.loss), float(plain.loss), atol=1e-5)


def test_fused_slab_plan_rgb_refresh_matches_plain(rng):
    """sharpen_color rebinds: plan targets re-baked from the query rgb."""
    from piccolo_tpu.kernels.slab_sampling import build_grid_plan

    xyz, rgb, img, trans, rot, lo, hi, gt_t = _setup(rng)
    rgb2 = jnp.asarray(
        np.clip(np.asarray(rgb) * 0.8 + 0.1, 0.0, 1.0).astype(np.float32)
    )
    kw = dict(
        num_intermediate=10, num_input=4,
        num_iter=20, lr=0.1, patience=5, factor=0.8,
    )
    args = (
        jnp.asarray(img), jnp.asarray(img), jnp.asarray(xyz), rgb2,
        jnp.asarray(trans), jnp.asarray(rot),
        jnp.ones(trans.shape[0], bool), jnp.asarray(lo), jnp.asarray(hi),
    )
    plain = localize_query(*args, **kw)
    # plan built with the ORIGINAL colors; refresh re-bakes rgb2 targets
    plan = build_grid_plan(
        jnp.asarray(xyz), jnp.asarray(rgb), None,
        jnp.asarray(trans), jnp.asarray(rot), img.shape[0], img.shape[1],
    )
    slab = localize_query(*args, plan=plan, plan_refresh_rgb=True, **kw)
    plain_starts = {tuple(np.round(r, 5)) for r in np.asarray(plain.start_t)}
    slab_starts = {tuple(np.round(r, 5)) for r in np.asarray(slab.start_t)}
    assert plain_starts == slab_starts
    np.testing.assert_allclose(np.asarray(slab.t), np.asarray(plain.t), atol=1e-4)


def test_fused_partial_plan_xla_tail_matches_plain(rng):
    """A budget-truncated PARTIAL plan with plan_tail='xla': pairs beyond
    plan.n_pairs are real candidates scored by the XLA gather path and
    composed into the same stage-1 table — same starts and winner as the
    planless pipeline (stretch-scale rooms whose full sorted streams
    exceed slab_bytes_cap, docs/PERFORMANCE.md "Scale stress")."""
    from piccolo_tpu.kernels.slab_sampling import build_grid_plan

    xyz, rgb, img, trans, rot, lo, hi, gt_t = _setup(rng)
    kw = dict(
        num_intermediate=10, num_input=4,
        num_iter=30, lr=0.1, patience=5, factor=0.8,
    )
    args = (
        jnp.asarray(img), jnp.asarray(img), jnp.asarray(xyz), jnp.asarray(rgb),
        jnp.asarray(trans), jnp.asarray(rot),
        jnp.ones(trans.shape[0], bool), jnp.asarray(lo), jnp.asarray(hi),
    )
    plain = localize_query(*args, **kw)
    # plan covers only the leading 7 of 20 trans rows; the 52-pair tail
    # (incl. whatever basin holds the GT) must come from the XLA engine
    plan = build_grid_plan(
        jnp.asarray(xyz), jnp.asarray(rgb), None,
        jnp.asarray(trans[:7]), jnp.asarray(rot), img.shape[0], img.shape[1],
    )
    assert plan.n_pairs == 7 * rot.shape[0]
    part = localize_query(*args, plan=plan, plan_tail="xla", **kw)

    plain_starts = {tuple(np.round(r, 5)) for r in np.asarray(plain.start_t)}
    part_starts = {tuple(np.round(r, 5)) for r in np.asarray(part.start_t)}
    assert plain_starts == part_starts
    np.testing.assert_allclose(np.asarray(part.t), np.asarray(plain.t), atol=1e-4)
    np.testing.assert_allclose(float(part.loss), float(plain.loss), atol=1e-5)

    # default tail semantics unchanged: "pad" treats the tail as +inf
    # padding, so only plan-covered candidates can be selected
    padded = localize_query(*args, plan=plan, **kw)
    covered = {tuple(np.round(r, 5)) for r in np.asarray(trans[:7])}
    for s in np.asarray(padded.start_t):
        assert tuple(np.round(s, 5)) in covered


def test_fused_partial_plan_tail_padding_rows_never_win(rng):
    """plan_tail='xla' composes with grid-shape padding: invalid rows in
    the XLA-scored tail still score +inf and can never reach the descent."""
    from piccolo_tpu.kernels.slab_sampling import build_grid_plan

    xyz, rgb, img, trans, rot, lo, hi, gt_t = _setup(rng)
    bad = np.broadcast_to(gt_t, (8, 3)).copy()
    trans_p = np.concatenate([trans, bad]).astype(np.float32)
    valid = np.concatenate([np.ones(len(trans), bool), np.zeros(8, bool)])
    plan = build_grid_plan(
        jnp.asarray(xyz), jnp.asarray(rgb), None,
        jnp.asarray(trans[:7]), jnp.asarray(rot), img.shape[0], img.shape[1],
    )
    res = localize_query(
        jnp.asarray(img), jnp.asarray(img), jnp.asarray(xyz), jnp.asarray(rgb),
        jnp.asarray(trans_p), jnp.asarray(rot),
        jnp.asarray(valid), jnp.asarray(lo), jnp.asarray(hi),
        plan=plan, plan_tail="xla",
        num_intermediate=10, num_input=4, num_iter=5,
    )
    for s in np.asarray(res.start_t):
        assert not np.allclose(s, gt_t, atol=1e-6)


@pytest.mark.parametrize("table", ["bfloat16", "uint8"])
def test_fused_narrow_descent_table_recovers_pose(rng, table):
    """Opt-in narrow descent tables: quantized texels, f32 math, same
    winner basin."""
    xyz, rgb, img, trans, rot, lo, hi, gt_t = _setup(rng)
    res = localize_query(
        jnp.asarray(img), jnp.asarray(img), jnp.asarray(xyz), jnp.asarray(rgb),
        jnp.asarray(trans), jnp.asarray(rot),
        jnp.ones(trans.shape[0], bool), jnp.asarray(lo), jnp.asarray(hi),
        num_intermediate=10, num_input=4, num_iter=80,
        descent_table=table,
    )
    assert float(jnp.linalg.norm(res.t - jnp.asarray(gt_t))) < 0.2


def test_plateau_factor_defaults_unified():
    """All descent surfaces default to the reference's plateau factor 0.9
    (reference omniloc.py:28); shipped configs pass 0.8 explicitly."""
    import inspect

    from piccolo_tpu.parallel.fused import localize_query_sharded
    from piccolo_tpu.solver import descend

    # solver.solve forwards **kw to descend, so descend's default covers it
    for fn in (localize_query, localize_query_sharded, descend):
        sig = inspect.signature(getattr(fn, "__wrapped__", fn))
        assert sig.parameters["factor"].default == 0.9, fn


def test_fused_rejects_mismatched_plan(rng):
    """A plan built for different grids must fail loudly, not silently
    truncate/pad into plausible-but-wrong stage-1 rankings (ADVICE r2)."""
    from piccolo_tpu.kernels.slab_sampling import build_grid_plan

    xyz, rgb, img, trans, rot, lo, hi, gt_t = _setup(rng)
    plan = build_grid_plan(
        jnp.asarray(xyz), jnp.asarray(rgb), None,
        jnp.asarray(trans), jnp.asarray(rot), img.shape[0], img.shape[1],
    )
    args_shorter = (
        jnp.asarray(img), jnp.asarray(img), jnp.asarray(xyz), jnp.asarray(rgb),
        jnp.asarray(trans[:4]), jnp.asarray(rot),
        jnp.ones(4, bool), jnp.asarray(lo), jnp.asarray(hi),
    )
    with pytest.raises(ValueError, match="built for different grids"):
        localize_query(*args_shorter, plan=plan, num_intermediate=4,
                       num_input=2, num_iter=2)
    # wrong image resolution (stale plan) also fails loudly
    img2 = img[::2, ::2]
    args_smaller_img = (
        jnp.asarray(img2), jnp.asarray(img2), jnp.asarray(xyz),
        jnp.asarray(rgb), jnp.asarray(trans), jnp.asarray(rot),
        jnp.ones(trans.shape[0], bool), jnp.asarray(lo), jnp.asarray(hi),
    )
    with pytest.raises(ValueError, match="stale plan"):
        localize_query(*args_smaller_img, plan=plan, num_intermediate=4,
                       num_input=2, num_iter=2)


def test_localize_query_batch_matches_single(rng):
    """Direct characterization of the EXPERIMENTAL batch API: per-query
    results equal localize_query's (it is a convenience vmap, not a
    throughput lever — docs/PERFORMANCE.md What-did-not-work #3)."""
    from piccolo_tpu.pipeline import localize_query_batch

    xyz, rgb, img, trans, rot, lo, hi, gt_t = _setup(rng)
    img2 = np.asarray(render_at(
        jnp.asarray(xyz), jnp.asarray(rgb),
        np.array([-0.4, 0.2, 0.0], np.float32),
        np.array([2.0, 0.0, 0.0], np.float32), (128, 256),
    ))
    kw = dict(num_intermediate=8, num_input=3, num_iter=10)
    batch = localize_query_batch(
        jnp.stack([jnp.asarray(img), jnp.asarray(img2)]),
        jnp.stack([jnp.asarray(img), jnp.asarray(img2)]),
        jnp.asarray(xyz), jnp.asarray(rgb), jnp.asarray(trans),
        jnp.asarray(rot), jnp.ones(trans.shape[0], bool),
        jnp.asarray(lo), jnp.asarray(hi), **kw,
    )
    for q, im in enumerate((img, img2)):
        single = localize_query(
            jnp.asarray(im), jnp.asarray(im), jnp.asarray(xyz),
            jnp.asarray(rgb), jnp.asarray(trans), jnp.asarray(rot),
            jnp.ones(trans.shape[0], bool), jnp.asarray(lo),
            jnp.asarray(hi), **kw,
        )
        assert int(batch.winner[q]) == int(single.winner)
        np.testing.assert_allclose(
            np.asarray(batch.t[q]), np.asarray(single.t), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(batch.cand_loss[q]), np.asarray(single.cand_loss),
            atol=1e-5,
        )


def test_fused_criterion_loss_matches_staged(rng):
    """criterion='loss' (working extension): the final starts are the top
    num_input pairs by sampling loss — identical to the staged
    trim_by_loss — and the histogram stage never runs."""
    xyz, rgb, img, trans, rot, lo, hi, gt_t = _setup(rng)
    kw = dict(num_iter=20, lr=0.1, patience=5, factor=0.8)

    t2, r2 = trim_by_loss(
        jnp.asarray(img), jnp.asarray(xyz), jnp.asarray(rgb),
        jnp.asarray(trans), jnp.asarray(rot), 4,
    )
    staged = descend(
        jnp.asarray(img), jnp.asarray(xyz), jnp.asarray(rgb),
        t2, r2, jnp.asarray(lo), jnp.asarray(hi), **kw,
    )
    res = localize_query(
        jnp.asarray(img), jnp.asarray(img), jnp.asarray(xyz), jnp.asarray(rgb),
        jnp.asarray(trans), jnp.asarray(rot),
        jnp.ones(trans.shape[0], bool), jnp.asarray(lo), jnp.asarray(hi),
        num_intermediate=10, num_input=4, criterion="loss", **kw,
    )
    staged_starts = {tuple(np.round(r, 5)) for r in np.asarray(t2)}
    fused_starts = {tuple(np.round(r, 5)) for r in np.asarray(res.start_t)}
    assert staged_starts == fused_starts
    k = int(np.argmin(np.asarray(staged.loss)))
    np.testing.assert_allclose(
        np.asarray(res.t), np.asarray(staged.t[k]), atol=1e-4
    )

    # the two criteria are allowed to pick different starts (that is the
    # point); both must still have the right shape
    assert res.start_t.shape == (4, 3)

    with pytest.raises(ValueError, match="criterion"):
        localize_query(
            jnp.asarray(img), jnp.asarray(img), jnp.asarray(xyz),
            jnp.asarray(rgb), jnp.asarray(trans), jnp.asarray(rot),
            jnp.ones(trans.shape[0], bool), jnp.asarray(lo), jnp.asarray(hi),
            num_input=4, criterion="histogram", **kw,
        )


def test_make_input_criterion_loss(rng):
    """Staged make_input criterion='loss': top num_input by the stage-1
    loss table, no histogram stage (the reference's non-default criterion
    branches all crash — utils.py:625-627; this one works)."""
    from piccolo_tpu.init import default_init_dict, make_input
    from piccolo_tpu.init.refine import score_pose_grid

    xyz, rgb = make_room(rng, n_per_wall=300, texture="checker")
    img = render_at(xyz, rgb, np.zeros(3, np.float32),
                    np.zeros(3, np.float32), (32, 64))
    d = default_init_dict(xy_only=True, num_trans=8, yaw_only=True,
                          num_yaw=4, z_prior=None)
    t, r = make_input(img, jnp.asarray(xyz), jnp.asarray(rgb), 3, d,
                      criterion="loss", num_intermediate=6)
    assert t.shape == (3, 3) and r.shape == (3, 3)
    # manual oracle: the 3 lowest-loss (trans, rot) pairs, in loss order
    from piccolo_tpu.init.candidates import (
        generate_rot_points, generate_trans_points,
    )
    trans = jnp.asarray(generate_trans_points(xyz, d))
    rot = jnp.asarray(generate_rot_points(d))
    scores = np.asarray(score_pose_grid(
        jnp.asarray(img), jnp.asarray(xyz), jnp.asarray(rgb), trans, rot
    ))
    order = np.argsort(scores)[:3]
    np.testing.assert_allclose(
        t, np.asarray(trans)[order // rot.shape[0]], atol=1e-6
    )
    np.testing.assert_allclose(
        r, np.asarray(rot)[order % rot.shape[0]], atol=1e-6
    )


def test_fused_trajectory_matches_plain(rng):
    """trajectory=True returns per-iteration states whose LAST step equals
    the plain fused result (visualize rides the fused path — round 3)."""
    xyz, rgb, img, trans, rot, lo, hi, gt_t = _setup(rng)
    kw = dict(num_intermediate=8, num_input=3, num_iter=12)
    args = (
        jnp.asarray(img), jnp.asarray(img), jnp.asarray(xyz), jnp.asarray(rgb),
        jnp.asarray(trans), jnp.asarray(rot),
        jnp.ones(trans.shape[0], bool), jnp.asarray(lo), jnp.asarray(hi),
    )
    plain = localize_query(*args, **kw)
    res, traj = localize_query(*args, trajectory=True, **kw)
    assert traj.t.shape == (3, 12, 3)
    assert traj.yaw.shape == (3, 12)
    np.testing.assert_array_equal(np.asarray(res.t), np.asarray(plain.t))
    np.testing.assert_array_equal(
        np.asarray(res.cand_loss), np.asarray(plain.cand_loss)
    )
    # the last trajectory step IS the final candidate state
    np.testing.assert_array_equal(
        np.asarray(traj.t[:, -1]), np.asarray(res.cand_t)
    )


@pytest.mark.parametrize("criterion", ["loss_histogram", "loss"])
def test_fused_scarce_valid_pairs_duplicate_best_start(rng, criterion):
    """Fewer valid pairs than num_input: the surplus start slots must
    duplicate the best valid start instead of descending from garbage
    padding poses (which can out-descend the genuine candidates)."""
    xyz, rgb, img, trans, rot, lo, hi, gt_t = _setup(rng)
    # 1 valid translation x 4 rots = 4 pairs < num_input=6; padding rows
    # sit exactly on the GT so a leak would (wrongly) win the descent
    bad = np.broadcast_to(gt_t, (7, 3)).copy()
    trans_p = np.concatenate([trans[:1], bad]).astype(np.float32)
    valid = np.concatenate([np.ones(1, bool), np.zeros(7, bool)])
    res = localize_query(
        jnp.asarray(img), jnp.asarray(img), jnp.asarray(xyz), jnp.asarray(rgb),
        jnp.asarray(trans_p), jnp.asarray(rot),
        jnp.asarray(valid), jnp.asarray(lo), jnp.asarray(hi),
        num_intermediate=8, num_input=6, num_iter=5, criterion=criterion,
    )
    starts = np.asarray(res.start_t)
    for s in starts:
        assert not np.allclose(s, gt_t, atol=1e-6), starts
        np.testing.assert_allclose(s, trans_p[0], atol=1e-6)
    # slots 4..5 duplicate the best valid start (4 real pairs only)
    np.testing.assert_array_equal(starts[4], starts[0])


def test_fused_all_black_image_degrades_gracefully(rng):
    """A query image with no valid samples anywhere (all black): every
    candidate scores +inf (the reference NaNs via an empty mean,
    omniloc.py:198), the pipeline must return a finite in-room pose and
    an inf loss — never NaN, never a crash."""
    xyz, rgb, img, trans, rot, lo, hi, gt_t = _setup(rng)
    black = jnp.zeros_like(jnp.asarray(img))
    res = localize_query(
        black, black, jnp.asarray(xyz), jnp.asarray(rgb),
        jnp.asarray(trans), jnp.asarray(rot),
        jnp.ones(trans.shape[0], bool), jnp.asarray(lo), jnp.asarray(hi),
        num_intermediate=10, num_input=4, num_iter=5,
    )
    assert np.all(np.isfinite(np.asarray(res.t)))
    assert np.all(np.asarray(res.t) >= lo - 1e-6)
    assert np.all(np.asarray(res.t) <= hi + 1e-6)
    assert np.isinf(float(res.loss))
    assert not np.any(np.isnan(np.asarray(res.cand_loss)))


def test_fused_empty_point_mask_degrades_gracefully(rng):
    """point_mask all False (an empty cloud after filtering) likewise
    yields inf losses and finite poses."""
    xyz, rgb, img, trans, rot, lo, hi, gt_t = _setup(rng)
    res = localize_query(
        jnp.asarray(img), jnp.asarray(img), jnp.asarray(xyz),
        jnp.asarray(rgb), jnp.asarray(trans), jnp.asarray(rot),
        jnp.ones(trans.shape[0], bool), jnp.asarray(lo), jnp.asarray(hi),
        point_mask=jnp.zeros(xyz.shape[0], bool), masked=True,
        num_intermediate=10, num_input=4, num_iter=5,
    )
    assert np.all(np.isfinite(np.asarray(res.t)))
    assert np.isinf(float(res.loss))


def test_fused_prune_matches_staged_prune(rng):
    """descent_prune on the fused path equals the same prune on the staged
    path (same two-phase program over the same selected starts)."""
    xyz, rgb, img, trans, rot, lo, hi, gt_t = _setup(rng)
    kw = dict(num_iter=40, lr=0.1, patience=5, factor=0.8)

    t1, r1 = trim_by_loss(
        jnp.asarray(img), jnp.asarray(xyz), jnp.asarray(rgb),
        jnp.asarray(trans), jnp.asarray(rot), 10,
    )
    t2, r2 = trim_by_hist(
        jnp.asarray(img), jnp.asarray(xyz), jnp.asarray(rgb), t1, r1, 4, 4, 4
    )
    staged = descend(
        jnp.asarray(img), jnp.asarray(xyz), jnp.asarray(rgb),
        t2, r2, jnp.asarray(lo), jnp.asarray(hi), prune=(12, 2), **kw,
    )
    res = localize_query(
        jnp.asarray(img), jnp.asarray(img), jnp.asarray(xyz), jnp.asarray(rgb),
        jnp.asarray(trans), jnp.asarray(rot),
        jnp.ones(trans.shape[0], bool), jnp.asarray(lo), jnp.asarray(hi),
        num_intermediate=10, num_input=4, descent_prune=(12, 2), **kw,
    )
    k = int(np.argmin(np.asarray(staged.loss)))
    np.testing.assert_allclose(
        np.asarray(res.t), np.asarray(staged.t[k]), atol=1e-4
    )
    np.testing.assert_allclose(
        float(res.loss), float(staged.loss[k]), atol=1e-5
    )


def test_fused_prune_recovers_pose(rng):
    xyz, rgb, img, trans, rot, lo, hi, gt_t = _setup(rng)
    res = localize_query(
        jnp.asarray(img), jnp.asarray(img), jnp.asarray(xyz), jnp.asarray(rgb),
        jnp.asarray(trans), jnp.asarray(rot),
        jnp.ones(trans.shape[0], bool), jnp.asarray(lo), jnp.asarray(hi),
        num_intermediate=10, num_input=4, num_iter=80,
        descent_prune=(20, 2),
    )
    assert float(jnp.linalg.norm(res.t - jnp.asarray(gt_t))) < 0.2
    # per-candidate outputs still align with starting poses (B rows)
    assert res.cand_loss.shape == (4,)
    assert int(res.winner) == int(np.argmin(np.asarray(res.cand_loss)))


def test_fused_prune_rejects_trajectory(rng):
    xyz, rgb, img, trans, rot, lo, hi, gt_t = _setup(rng)
    with pytest.raises(ValueError, match="trajectory"):
        localize_query(
            jnp.asarray(img), jnp.asarray(img), jnp.asarray(xyz),
            jnp.asarray(rgb), jnp.asarray(trans), jnp.asarray(rot),
            jnp.ones(trans.shape[0], bool), jnp.asarray(lo), jnp.asarray(hi),
            num_intermediate=10, num_input=4, num_iter=20,
            descent_prune=(5, 2), trajectory=True,
        )

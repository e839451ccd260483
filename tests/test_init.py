"""Tests for candidate generation and the two-stage trim."""

import jax.numpy as jnp
import numpy as np
import torch

from piccolo_tpu.init.candidates import (
    adaptive_trans_num,
    default_init_dict,
    generate_rot_points,
    generate_trans_points,
)
from piccolo_tpu.init.refine import make_input, score_pose_grid, trim_by_loss
from piccolo_tpu.ops.rotation import rot_from_ypr

from test_solver import make_room, render_at


def _torch_adaptive(xyz, max_trans_num, xy_only):
    """Reference adaptive_trans_num (utils.py:282-318)."""
    from math import ceil

    x = torch.from_numpy(xyz)
    xyz_max = torch.quantile(x, dim=0, q=0.90)
    xyz_min = torch.quantile(x, dim=0, q=0.10)
    L = xyz_max - xyz_min
    if xy_only:
        return (
            ceil((L[0] * max_trans_num / L[1]) ** 0.5),
            ceil((L[1] * max_trans_num / L[0]) ** 0.5),
        )
    nx = ceil((L[0] ** 2 * max_trans_num / (L[1] * L[2])) ** (1 / 3))
    ny = ceil((L[1] ** 2 * max_trans_num / (L[0] * L[2])) ** (1 / 3))
    nz = ceil((L[2] ** 2 * max_trans_num / (L[0] * L[1])) ** (1 / 3))
    out = []
    for n in (nx, ny, nz):
        out.append(n - 1 if n % 2 == 0 else n)
    return tuple(out)


def test_adaptive_trans_num_matches_reference(rng):
    for _ in range(5):
        xyz = (rng.random((5000, 3)) * [6, 4, 3]).astype(np.float32)
        assert adaptive_trans_num(xyz, 50, True) == _torch_adaptive(xyz, 50, True)
        assert adaptive_trans_num(xyz, 50, False) == _torch_adaptive(xyz, 50, False)


def test_trans_points_quantile_mode(rng):
    xyz = (rng.random((8000, 3)) * [6, 4, 3] - [3, 2, 0]).astype(np.float32)
    d = default_init_dict(xy_only=False, num_trans=50)
    pts = generate_trans_points(xyz, d)
    nx, ny, nz = adaptive_trans_num(xyz, 50, False)
    assert pts.shape == (nx * ny * nz, 3)
    # all candidates inside the cloud bounding box
    assert (pts >= xyz.min(0) - 1e-4).all() and (pts <= xyz.max(0) + 1e-4).all()
    # torch.quantile golden for the x axis
    split = (
        (np.arange(nx) + 1) / (nx + 1)
        if 1 / (nx + 1) > 0.1
        else np.linspace(0.1, 0.9, nx)
    )
    ref_x = torch.quantile(
        torch.from_numpy(xyz[:, 0]), torch.from_numpy(split.astype(np.float32))
    ).numpy()
    np.testing.assert_allclose(np.unique(pts[:, 0]), np.sort(ref_x), rtol=1e-5)


def test_trans_points_xy_only_z_prior(rng):
    xyz = (rng.random((3000, 3)) * [6, 4, 3]).astype(np.float32)
    d = default_init_dict(xy_only=True, num_trans=150, z_prior=1.5,
                          dataset="OmniScenes")
    pts = generate_trans_points(xyz, d)
    assert np.all(pts[:, 2] == 1.5)
    d2 = default_init_dict(xy_only=True, num_trans=150, z_prior=None)
    pts2 = generate_trans_points(xyz, d2)
    np.testing.assert_allclose(pts2[:, 2], xyz[:, 2].mean(), rtol=1e-5)


def test_rot_points_yaw_only():
    d = default_init_dict(yaw_only=True, num_yaw=8)
    rot = generate_rot_points(d)
    assert rot.shape == (8, 3)
    np.testing.assert_allclose(rot[:, 0], np.arange(8) * 2 * np.pi / 8, rtol=1e-6)
    assert np.all(rot[:, 1:] == 0)


def test_rot_points_full_grid_dedups():
    d = default_init_dict(
        yaw_only=False, num_yaw=4, num_pitch=4, num_roll=4,
        max_pitch=2 * np.pi,
    )
    rot = generate_rot_points(d)
    # 64 raw combinations collapse: equivalent rotations filtered out
    assert rot.shape[0] < 64
    assert rot.shape[1] == 3
    # all kept rotations are genuinely distinct as matrices
    mats = np.asarray(rot_from_ypr(jnp.asarray(rot)))
    flat = np.round(mats.reshape(len(mats), -1), 3)
    assert len(np.unique(flat, axis=0)) == len(mats)
    # deterministic across calls
    rot2 = generate_rot_points(d)
    np.testing.assert_array_equal(rot, rot2)


def test_score_grid_ranks_gt_pose_first(rng):
    xyz, rgb = make_room(rng, n_per_wall=1500)
    gt_t = np.array([0.3, -0.2, 0.1], np.float32)
    gt_ypr = np.array([1.0, 0.0, 0.0], np.float32)
    img = render_at(xyz, rgb, gt_t, gt_ypr, resolution=(128, 256))

    trans = jnp.asarray(
        np.stack([gt_t, [1.5, 1.0, 0.5], [-1.5, -1.0, 0.8]]).astype(np.float32)
    )
    rot = jnp.asarray(
        np.stack(
            [[1.0, 0, 0], [2.5, 0, 0], [4.0, 0, 0]]
        ).astype(np.float32)
    )
    scores = np.asarray(
        score_pose_grid(img, jnp.asarray(xyz), jnp.asarray(rgb), trans, rot)
    )
    # flattened trans-major: entry 0 is (gt_t, gt_yaw)
    assert scores.argmin() == 0

    t1, r1 = trim_by_loss(img, jnp.asarray(xyz), jnp.asarray(rgb), trans, rot, 2)
    np.testing.assert_allclose(np.asarray(t1[0]), gt_t, atol=1e-6)
    np.testing.assert_allclose(np.asarray(r1[0]), [1.0, 0, 0], atol=1e-6)


def test_make_input_end_to_end(rng):
    xyz, rgb = make_room(rng, n_per_wall=1200)
    gt_t = np.array([0.5, -0.3, 0.0], np.float32)
    gt_ypr = np.array([0.8, 0.0, 0.0], np.float32)
    img = render_at(xyz, rgb, gt_t, gt_ypr, resolution=(128, 256))

    d = default_init_dict(
        xy_only=True, num_trans=20, yaw_only=True, num_yaw=4,
        z_prior=None, num_split_h=4, num_split_w=4,
    )
    trans, rot = make_input(
        img, jnp.asarray(xyz), jnp.asarray(rgb),
        num_input=4, init_dict=d, criterion="loss_histogram",
        num_intermediate=10,
    )
    assert trans.shape == (4, 3) and rot.shape == (4, 3)
    # candidates stay inside the room
    assert (np.abs(trans[:, 0]) < 3.1).all() and (np.abs(trans[:, 1]) < 2.1).all()
    # at least one candidate is reasonably near the GT basin
    d_t = np.linalg.norm(trans[:, :2] - gt_t[:2], axis=-1)
    d_yaw = np.abs((rot[:, 0] - gt_ypr[0] + np.pi) % (2 * np.pi) - np.pi)
    assert np.any((d_t < 1.5) & (d_yaw < np.pi / 3)), (trans, rot)


def test_hist_scores_equals_naive_render_path(rng):
    """The single-pass packed-key histogram scorer must match a plain
    per-candidate render-then-block-histogram loop (the reference
    formulation), including pure-black points counting as background.

    Tolerance: the packed key compares distances at 18-bit precision, so
    same-pixel same-priority taps within ~2e-3 relative distance may
    resolve to a different (equally valid) winner — observed score noise
    is ~2e-4, two orders below the ~1e-2 gaps between genuinely different
    candidates that drive selection."""
    import jax.numpy as jnp

    from piccolo_tpu.init.refine import _HIST_BINS, hist_scores
    from piccolo_tpu.ops.histogram import block_histograms
    from piccolo_tpu.ops.pano import render_pano

    xyz, rgb = make_room(rng, n_per_wall=600)
    rgb = rgb.copy()
    rgb[:30] = 0.0  # pure-black points must count as background
    img = render_at(xyz, rgb, np.array([0.2, 0.1, 0.0], np.float32),
                    np.array([0.7, 0, 0], np.float32), (64, 128))
    trans = jnp.asarray(rng.random((8, 3)).astype(np.float32) * 0.5)
    ypr = jnp.asarray(np.stack([[y, 0, 0] for y in np.linspace(0, 5, 8)]).astype(np.float32))

    fast = np.asarray(hist_scores(
        img, jnp.asarray(xyz), jnp.asarray(rgb), trans, ypr,
        num_split_h=4, num_split_w=4, chunk=4,
    ))

    # naive per-candidate: render then histogram (reference semantics)
    H, W = 64, 128
    img255 = img * 255.0
    img_mask = jnp.sum(img255 == 0.0, axis=-1) != 3
    img_h, img_c = block_histograms(img255, img_mask, _HIST_BINS, 4, 4)
    img_hn = np.asarray(img_h / jnp.maximum(img_c, 1e-12)[:, None])
    middle = np.array([(i // 4 >= 1) and (i // 4 <= 2) for i in range(16)])
    naive = []
    from piccolo_tpu.ops.rotation import rot_from_ypr

    for i in range(8):
        R = rot_from_ypr(ypr[i])
        cam = (jnp.asarray(xyz) - trans[i]) @ R.T
        proj = render_pano(cam, jnp.asarray(rgb), (H, W))
        proj_mask = jnp.sum(proj == 0.0, axis=-1) != 3
        ph, pc = block_histograms(proj, proj_mask & img_mask, _HIST_BINS, 4, 4)
        phn = np.asarray(ph / jnp.maximum(pc, 1e-12)[:, None])
        inter = np.minimum(phn, img_hn).sum(-1)
        ok = (np.asarray(pc) > 0) & (np.asarray(img_c) > 0) & middle
        naive.append(float((inter * ok).sum()) / 16)
    np.testing.assert_allclose(fast, np.array(naive), atol=1e-3)
    # rankings must agree despite tie noise
    np.testing.assert_array_equal(np.argsort(fast), np.argsort(np.array(naive)))


def test_make_input_padding_does_not_pollute_grids(rng):
    """Padded clouds (static-shape buckets) must produce the same candidates
    as the unpadded cloud — padding zeros must not shift the quantile grids
    (regression: the staged harness passed padded clouds to make_input)."""
    import jax.numpy as jnp

    xyz, rgb = make_room(rng, n_per_wall=500)
    gt_t = np.array([0.4, -0.2, 0.1], np.float32)
    img = render_at(xyz, rgb, gt_t, np.array([0.8, 0, 0], np.float32),
                    resolution=(64, 128))
    d = default_init_dict(xy_only=True, num_trans=16, yaw_only=True,
                          num_yaw=4, z_prior=None)

    t_clean, r_clean = make_input(
        img, jnp.asarray(xyz), jnp.asarray(rgb), 4, d, "loss_histogram", 8
    )
    pad = 997
    xyz_p = np.concatenate([xyz, np.zeros((pad, 3), np.float32)])
    rgb_p = np.concatenate([rgb, np.zeros((pad, 3), np.float32)])
    mask = jnp.arange(xyz_p.shape[0]) < xyz.shape[0]
    t_pad, r_pad = make_input(
        img, jnp.asarray(xyz_p), jnp.asarray(rgb_p), 4, d, "loss_histogram", 8,
        point_mask=mask,
    )
    np.testing.assert_allclose(t_pad, t_clean, atol=1e-6)
    np.testing.assert_allclose(r_pad, r_clean, atol=1e-6)


def test_make_input_rejects_unknown_criterion(rng):
    xyz, rgb = make_room(rng, n_per_wall=200)
    img = render_at(xyz, rgb, np.zeros(3, np.float32), np.zeros(3, np.float32),
                    resolution=(32, 64))
    d = default_init_dict(num_trans=4)
    try:
        make_input(img, jnp.asarray(xyz), jnp.asarray(rgb), 2, d,
                   criterion="histogram", num_intermediate=4)
        assert False, "should raise"
    except ValueError as e:
        assert "loss_histogram" in str(e)

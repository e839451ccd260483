"""Tracking mode: warm-started per-frame descent with divergence recovery."""

import jax.numpy as jnp
import numpy as np
import pytest

from piccolo_tpu.ops.quantile import cloud_bounds
from piccolo_tpu.testing import make_scene, raycast_pano, scene_cloud
from piccolo_tpu.tracking import Tracker, track_step


@pytest.fixture(scope="module")
def room():
    rng = np.random.default_rng(5)
    scene = make_scene(rng, size=(6.0, 4.0, 3.0), n_occluders=1,
                       texture="checker")
    xyz, rgb = scene_cloud(scene, rng, 9000)
    lo, hi = cloud_bounds(jnp.asarray(xyz), 0.05)
    return scene, jnp.asarray(xyz), jnp.asarray(rgb), lo, hi


def _trajectory(n, start=(-1.0, -0.8, 0.1), yaw0=0.6):
    """A smooth handheld-like path: ~3 cm + ~1.2 deg per frame."""
    ts, yprs = [], []
    for i in range(n):
        ts.append(np.array([
            start[0] + 0.03 * i,
            start[1] + 0.02 * np.sin(i / 3.0),
            start[2] + 0.01 * np.cos(i / 4.0),
        ], np.float32))
        yprs.append(np.array([yaw0 + 0.02 * i, 0.0, 0.0], np.float32))
    return ts, yprs


def test_track_step_refines_from_nearby_pose(room):
    scene, xyz, rgb, lo, hi = room
    gt_t = np.array([0.3, -0.5, 0.2], np.float32)
    gt_ypr = np.array([1.0, 0.0, 0.0], np.float32)
    img = jnp.asarray(raycast_pano(scene, gt_t, gt_ypr, (128, 256)))
    res = track_step(
        img, xyz, rgb,
        gt_t + np.array([0.04, -0.03, 0.02], np.float32),
        gt_ypr + np.array([0.03, 0.0, 0.0], np.float32),
        lo, hi,
    )
    assert float(jnp.linalg.norm(res.t[0] - jnp.asarray(gt_t))) < 0.02


def test_tracker_follows_trajectory(room):
    scene, xyz, rgb, lo, hi = room
    ts, yprs = _trajectory(8)
    tracker = Tracker(xyz, rgb, lo, hi, ts[0], yprs[0], window=4)
    errs = []
    for t_gt, ypr_gt in zip(ts[1:], yprs[1:]):
        img = jnp.asarray(raycast_pano(scene, t_gt, ypr_gt, (128, 256)))
        out = tracker.update(img)
        assert not out.recovered and not out.lost
        errs.append(float(np.linalg.norm(out.t - t_gt)))
    assert max(errs) < 0.03, errs


def test_tracker_recovery_on_teleport(room):
    scene, xyz, rgb, lo, hi = room
    ts, yprs = _trajectory(7)
    far_t = np.array([1.8, 1.2, -0.4], np.float32)
    far_ypr = np.array([3.5, 0.0, 0.0], np.float32)

    calls = []

    def recover(img):
        calls.append(1)
        return far_t, far_ypr  # stand-in for a full localize_query

    tracker = Tracker(xyz, rgb, lo, hi, ts[0], yprs[0], window=4,
                      recover=recover)
    for t_gt, ypr_gt in zip(ts[1:], yprs[1:]):
        img = jnp.asarray(raycast_pano(scene, t_gt, ypr_gt, (128, 256)))
        out = tracker.update(img)
        assert not out.recovered
    # teleport: across the room with a big rotation — the warm descent
    # cannot follow, the loss blows past ratio x rolling median
    img = jnp.asarray(raycast_pano(scene, far_t, far_ypr, (128, 256)))
    out = tracker.update(img)
    assert out.recovered and calls == [1]
    assert float(np.linalg.norm(out.t - far_t)) < 0.03
    # and tracking continues from the recovered pose
    img = jnp.asarray(
        raycast_pano(scene, far_t + np.float32([0.03, 0, 0]), far_ypr,
                     (128, 256))
    )
    out = tracker.update(img)
    assert not out.recovered and not out.lost
    assert float(np.linalg.norm(out.t - (far_t + np.float32([0.03, 0, 0])))) < 0.03


def test_tracker_flags_lost_without_recover(room):
    scene, xyz, rgb, lo, hi = room
    ts, yprs = _trajectory(7)
    tracker = Tracker(xyz, rgb, lo, hi, ts[0], yprs[0], window=4)
    for t_gt, ypr_gt in zip(ts[1:], yprs[1:]):
        img = jnp.asarray(raycast_pano(scene, t_gt, ypr_gt, (128, 256)))
        tracker.update(img)
    img = jnp.asarray(
        raycast_pano(scene, np.float32([1.8, 1.2, -0.4]),
                     np.float32([3.5, 0, 0]), (128, 256))
    )
    out = tracker.update(img)
    assert out.lost and not out.recovered


def test_divergence_gate_nan_hardening():
    from piccolo_tpu.tracking import DivergenceGate

    gate = DivergenceGate(window=3, ratio=3.0)
    # non-finite diverges immediately, even before the window fills
    assert gate.diverged(float("nan"))
    assert gate.diverged(float("inf"))
    for v in (0.1, 0.11, 0.09):
        assert not gate.diverged(v)
        gate.accept(v)
    # non-finite losses are never accepted into the window
    gate.accept(float("nan"))
    assert not gate.diverged(0.12)      # median still finite
    assert gate.diverged(0.5)           # 5x the median trips
    gate.reset()
    assert not gate.diverged(99.0)      # fresh regime: window empty


def test_tracker_nan_loss_keeps_previous_pose(room, monkeypatch):
    import piccolo_tpu.tracking as T

    scene, xyz, rgb, lo, hi = room
    t0 = np.float32([0.1, 0.2, 0.0])
    tracker = T.Tracker(xyz, rgb, lo, hi, t0, np.zeros(3, np.float32),
                        window=2)
    bad = (np.float32([np.nan] * 3), np.float32([np.nan] * 3),
           np.full((3, 3), np.nan, np.float32), float("nan"))
    monkeypatch.setattr(tracker, "_descend", lambda img: bad)
    out = tracker.update(jnp.zeros((8, 16, 3)))
    # lost, but the pose is NOT poisoned with NaN — the previous pose holds
    assert out.lost and not out.recovered
    np.testing.assert_array_equal(out.t, t0)
    assert np.isfinite(out.rot).all()
    np.testing.assert_array_equal(tracker.pose[0], t0)


def test_track_step_prepped_matches_host_prep(room):
    """The fused device-prep path (uint8 in, normalize + CDF match on
    device) agrees with the host-prep path (float image via
    color.color_match) — the two tracked-frame surfaces must localize
    identically up to the f32/f64 quantile noise of the device match."""
    from piccolo_tpu.color import cloud_color_cdf, color_match
    from piccolo_tpu.tracking import track_step_fetched, track_step_prepped_fetched

    scene, xyz, rgb, lo, hi = room
    gt_t = np.array([0.3, -0.5, 0.2], np.float32)
    gt_ypr = np.array([1.0, 0.0, 0.0], np.float32)
    img_u8 = (raycast_pano(scene, gt_t, gt_ypr, (128, 256)) * 255).astype(np.uint8)
    prev_t = gt_t + np.array([0.03, -0.02, 0.01], np.float32)
    prev_ypr = gt_ypr + np.array([0.02, 0.0, 0.0], np.float32)
    rgb_np = np.asarray(rgb)

    # host path: float conversion + host color_match + uint8 requantize
    imgf = img_u8.astype(np.float32) / 255.0
    matched = color_match(imgf, rgb_np)
    matched = (matched * 255).astype(np.uint8).astype(np.float32) / 255.0
    t_h, ypr_h, rot_h, loss_h = track_step_fetched(
        jnp.asarray(matched), xyz, rgb, prev_t, prev_ypr, lo, hi
    )

    # device path: uint8 in, everything else fused into the jit
    cdf = tuple(jnp.asarray(a) for a in cloud_color_cdf(rgb_np))
    t_d, ypr_d, rot_d, loss_d = track_step_prepped_fetched(
        jnp.asarray(img_u8), xyz, rgb, prev_t, prev_ypr, lo, hi, cdf=cdf
    )
    assert np.linalg.norm(t_h - t_d) < 5e-3
    assert np.linalg.norm(ypr_h - ypr_d) < 5e-3
    assert abs(loss_h - loss_d) < 1e-3

    # and without match_color the only delta is the device's uint8
    # normalize (XLA lowers /255 to *(1/255): one-ulp vs numpy)
    t_p, ypr_p, _, loss_p = track_step_prepped_fetched(
        jnp.asarray(img_u8), xyz, rgb, prev_t, prev_ypr, lo, hi
    )
    t_f, ypr_f, _, loss_f = track_step_fetched(
        jnp.asarray(imgf), xyz, rgb, prev_t, prev_ypr, lo, hi
    )
    np.testing.assert_allclose(t_p, t_f, atol=1e-5)
    np.testing.assert_allclose(ypr_p, ypr_f, atol=1e-5)
    assert abs(loss_p - loss_f) < 1e-5


def test_track_step_prepped_sharpen_matches_host_prep(room):
    """sharpen_color inside the tracked jit: the fused device path (uint8
    in, joint Y-equalization of frame AND cloud on device) localizes
    identically to the host path (color_mod on the host, sharpened image
    and rebound cloud colors fed to the plain descent).  The sharpen math
    is integer-exact up to the documented 1-level truncation boundary, so
    the poses agree to descent float noise."""
    from piccolo_tpu.color import (
        SharpenState,
        cloud_sharpen_state,
        color_match,
        color_mod,
        cloud_color_cdf,
    )
    from piccolo_tpu.tracking import track_step_fetched, track_step_prepped_fetched

    scene, xyz, rgb, lo, hi = room
    gt_t = np.array([0.3, -0.5, 0.2], np.float32)
    gt_ypr = np.array([1.0, 0.0, 0.0], np.float32)
    img_u8 = (raycast_pano(scene, gt_t, gt_ypr, (128, 256)) * 255).astype(np.uint8)
    prev_t = gt_t + np.array([0.03, -0.02, 0.01], np.float32)
    prev_ypr = gt_ypr + np.array([0.02, 0.0, 0.0], np.float32)
    rgb_np = np.asarray(rgb)

    # host path: color_mod + requantize (harness finish_omniscenes_images)
    imgf = img_u8.astype(np.float32) / 255.0
    mod_img, mod_rgb = color_mod(imgf, rgb_np, 256)
    mod_img = (mod_img * 255).astype(np.uint8).astype(np.float32) / 255.0
    t_h, ypr_h, _, loss_h = track_step_fetched(
        jnp.asarray(mod_img), xyz, jnp.asarray(mod_rgb), prev_t, prev_ypr,
        lo, hi,
    )

    st = cloud_sharpen_state(rgb_np, pad_to=rgb_np.shape[0])
    st_j = SharpenState(*(jnp.asarray(a) for a in st))
    t_d, ypr_d, _, loss_d = track_step_prepped_fetched(
        jnp.asarray(img_u8), xyz, rgb, prev_t, prev_ypr, lo, hi,
        sharpen=st_j,
    )
    assert np.linalg.norm(t_h - t_d) < 2e-3
    assert np.linalg.norm(ypr_h - ypr_d) < 2e-3
    assert abs(loss_h - loss_d) < 1e-4

    # match + sharpen chained (finish_omniscenes_images order): host does
    # match -> color_mod on the float matched image; the intermediate
    # uint8 requantization is trunc-equivalent in both paths
    matched = color_match(imgf, rgb_np)
    mod_img2, mod_rgb2 = color_mod(matched, rgb_np, 256)
    mod_img2 = (mod_img2 * 255).astype(np.uint8).astype(np.float32) / 255.0
    t_h2, ypr_h2, _, loss_h2 = track_step_fetched(
        jnp.asarray(mod_img2), xyz, jnp.asarray(mod_rgb2), prev_t, prev_ypr,
        lo, hi,
    )
    cdf = tuple(jnp.asarray(a) for a in cloud_color_cdf(rgb_np))
    t_d2, ypr_d2, _, loss_d2 = track_step_prepped_fetched(
        jnp.asarray(img_u8), xyz, rgb, prev_t, prev_ypr, lo, hi,
        cdf=cdf, sharpen=st_j,
    )
    assert np.linalg.norm(t_h2 - t_d2) < 5e-3
    assert np.linalg.norm(ypr_h2 - ypr_d2) < 5e-3
    assert abs(loss_h2 - loss_d2) < 1e-3


def test_track_step_prepped_exec_cache_identical(room, tmp_path):
    """The tracked fast path through the executable cache
    (exec_cache_dir) answers bit-identically to the direct jit call —
    on CPU the disk layer is disabled by design (utils/exec_cache.py),
    so this pins the kwarg plumbing + the in-process memoized Compiled."""
    from piccolo_tpu.color import cloud_color_cdf
    from piccolo_tpu.tracking import track_step_prepped_fetched
    from piccolo_tpu.utils.exec_cache import clear_memo

    scene, xyz, rgb, lo, hi = room
    gt_t = np.array([0.2, -0.4, 0.15], np.float32)
    gt_ypr = np.array([0.8, 0.0, 0.0], np.float32)
    img_u8 = (raycast_pano(scene, gt_t, gt_ypr, (128, 256)) * 255).astype(
        np.uint8)
    prev_t = gt_t + np.array([0.02, -0.03, 0.01], np.float32)
    prev_ypr = gt_ypr + np.array([-0.02, 0.0, 0.0], np.float32)
    cdf = tuple(jnp.asarray(a) for a in cloud_color_cdf(np.asarray(rgb)))

    kw = dict(cdf=cdf, num_iter=12)
    want = track_step_prepped_fetched(
        jnp.asarray(img_u8), xyz, rgb, prev_t, prev_ypr, lo, hi, **kw)
    clear_memo()
    got = track_step_prepped_fetched(
        jnp.asarray(img_u8), xyz, rgb, prev_t, prev_ypr, lo, hi,
        exec_cache_dir=str(tmp_path), **kw)
    for w, g in zip(want, got):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g))
    # second call rides the memo (no new lowering): still identical
    got2 = track_step_prepped_fetched(
        jnp.asarray(img_u8), xyz, rgb, prev_t, prev_ypr, lo, hi,
        exec_cache_dir=str(tmp_path), **kw)
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(got2[0]))
    clear_memo()


def test_track_step_fetched_exec_cache_identical(room, tmp_path):
    """track_step's exec-cache route (the serving tracked path) answers
    identically to the direct descend jit."""
    from piccolo_tpu.tracking import track_step_fetched
    from piccolo_tpu.utils.exec_cache import clear_memo

    scene, xyz, rgb, lo, hi = room
    gt_t = np.array([0.1, -0.3, 0.05], np.float32)
    gt_ypr = np.array([0.5, 0.0, 0.0], np.float32)
    img = jnp.asarray(raycast_pano(scene, gt_t, gt_ypr, (128, 256)))
    prev_t = gt_t + np.array([0.02, 0.02, -0.01], np.float32)
    prev_ypr = gt_ypr + np.array([0.01, 0.0, 0.0], np.float32)

    want = track_step_fetched(img, xyz, rgb, prev_t, prev_ypr, lo, hi,
                              num_iter=12)
    clear_memo()
    got = track_step_fetched(img, xyz, rgb, prev_t, prev_ypr, lo, hi,
                             num_iter=12, exec_cache_dir=str(tmp_path))
    for w, g in zip(want, got):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g))
    clear_memo()


def test_track_steps_batched_matches_single(room):
    """Multi-stream tracking: the vmapped K-stream step answers each
    stream like per-stream track_step (to f32 batching noise) through
    ONE program, and padding/near-GT convergence hold."""
    from piccolo_tpu.tracking import track_step_fetched, track_steps_batched

    scene, xyz, rgb, lo, hi = room
    gts = [
        (np.array([0.3, -0.5, 0.2], np.float32),
         np.array([1.0, 0.0, 0.0], np.float32)),
        (np.array([-0.8, 0.4, -0.1], np.float32),
         np.array([2.2, 0.0, 0.0], np.float32)),
        (np.array([1.1, 0.9, 0.3], np.float32),
         np.array([-0.7, 0.0, 0.0], np.float32)),
    ]
    off_t = np.array([0.04, -0.03, 0.02], np.float32)
    off_y = np.array([0.03, 0.0, 0.0], np.float32)
    imgs = np.stack([
        raycast_pano(scene, t, y, (128, 256)) for t, y in gts
    ])
    prev_ts = np.stack([t + off_t for t, _ in gts])
    prev_yprs = np.stack([y + off_y for _, y in gts])

    batched = track_steps_batched(
        imgs, xyz, rgb, prev_ts, prev_yprs, lo, hi
    )
    assert len(batched) == 3
    for k, (gt_t, _) in enumerate(gts):
        t_b, ypr_b, rot_b, loss_b = batched[k]
        t_s, ypr_s, rot_s, loss_s = track_step_fetched(
            jnp.asarray(imgs[k]), xyz, rgb, prev_ts[k], prev_yprs[k],
            lo, hi,
        )
        # each stream converges near its own GT...
        assert np.linalg.norm(t_b - gt_t) < 0.02
        # ...and equals the per-stream scalar program to batching noise
        np.testing.assert_allclose(t_b, t_s, atol=1e-4)
        np.testing.assert_allclose(ypr_b, ypr_s, atol=1e-4)
        np.testing.assert_allclose(rot_b, rot_s, atol=1e-4)
        assert abs(loss_b - loss_s) < 1e-4

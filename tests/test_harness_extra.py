"""Extra harness coverage: error isolation, batched queries, metrics."""

import numpy as np
import jax.numpy as jnp

from piccolo_tpu.config import make_config
from piccolo_tpu.harness.metrics import (
    AccuracyTracker,
    rotation_error_deg,
    translation_error,
)
from piccolo_tpu.harness.outputs import CsvSummary, fmt_array
from piccolo_tpu.pipeline import localize_query_batch
from piccolo_tpu.ops.quantile import cloud_bounds
from piccolo_tpu.testing import make_room, render_at


def test_rotation_error_clamping():
    R = np.eye(3)
    assert rotation_error_deg(R, R) == 0.0
    # trace slightly above 3 (non-orthonormal drift) must not NaN
    R2 = np.eye(3) * 1.0001
    assert np.isfinite(rotation_error_deg(R, R2))
    # 180-degree rotation
    R3 = np.diag([-1.0, -1.0, 1.0])
    np.testing.assert_allclose(rotation_error_deg(R, R3), 180.0, atol=1e-4)


def test_translation_error_shapes():
    a = np.array([[1.0], [2.0], [3.0]])
    b = np.array([1.0, 2.0, 4.0])
    np.testing.assert_allclose(translation_error(a, b), 1.0)


def test_accuracy_tracker():
    t = AccuracyTracker(0.2, 10.0)
    assert t.update(0.1, 5.0) is True
    assert t.update(0.3, 5.0) is False
    assert t.update(0.1, 15.0) is False
    assert t.accuracy == 1 / 3


def test_csv_resume_roundtrip(tmp_path):
    path = str(tmp_path / "r.csv")
    cols = ["pano_name", "x"]
    c = CsvSummary(path, cols)
    c.write(["a.png", 1])
    c.write(["b.png", 2])
    c.close()
    c2 = CsvSummary(path, cols, resume=True)
    assert c2.done == {"a.png", "b.png"}
    c2.write(["c.png", 3])
    c2.close()
    c3 = CsvSummary(path, cols, resume=True)
    assert c3.done == {"a.png", "b.png", "c.png"}
    c3.close()


def test_fmt_array_matches_reference_format():
    a = np.array([[1.5], [2.0], [-3.25]])
    s = fmt_array(a)
    assert s == str(a.flatten())[1:-1]
    assert "\n" not in s


def test_localize_query_batch(rng):
    xyz, rgb = make_room(rng, n_per_wall=800)
    lo, hi = cloud_bounds(jnp.asarray(xyz), 0.05)
    gts = [np.array([0.3, -0.2, 0.1], np.float32),
           np.array([-0.5, 0.4, 0.0], np.float32)]
    imgs = jnp.stack(
        [render_at(xyz, rgb, t, np.array([1.0, 0, 0], np.float32), (64, 128))
         for t in gts]
    )
    trans = jnp.asarray(
        np.stack([[0.0, 0.0, 0.0], [1.0, -1.0, 0.2], [-1.0, 1.0, 0.1]]).astype(np.float32)
    )
    rot = jnp.asarray(np.stack([[0.0, 0, 0], [1.0, 0, 0], [2.0, 0, 0], [3.0, 0, 0]]).astype(np.float32))
    res = localize_query_batch(
        imgs, imgs, jnp.asarray(xyz), jnp.asarray(rgb),
        trans, rot, jnp.ones(3, bool), jnp.asarray(lo), jnp.asarray(hi),
        num_intermediate=6, num_input=3, num_iter=50,
    )
    assert res.t.shape == (2, 3)
    for q in range(2):
        assert float(jnp.linalg.norm(res.t[q] - jnp.asarray(gts[q]))) < 0.3


def test_continue_on_error_config():
    cfg = make_config(dataset="Stanford2D-3D-S", continue_on_error=True)
    assert cfg.continue_on_error is True


def test_debug_nans_config_key_raises_on_poisoned_input():
    """debug_nans=True (the reference's set_detect_anomaly parity knob,
    localize.py:94,320 — a backward-pass NaN detector) makes a NaN-poisoned
    gradient evaluation raise instead of silently propagating.

    (A NaN *image* alone doesn't trip it: safe_norm's double-where launders
    forward NaNs to 0 by design; the gradient path is where poison survives,
    same as torch's anomaly mode.)"""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import pytest

    from piccolo_tpu.config import make_config
    from piccolo_tpu.harness.localize import _setup_debug
    from piccolo_tpu.loss import Pose, sampling_loss

    _setup_debug(make_config(dataset="Stanford2D-3D-S"))  # default: off
    assert not jax.config.jax_debug_nans

    # poisoned inputs built BEFORE the flag flips (the per-op NaN checker
    # would otherwise flag the intentional NaN constant's own transfer)
    img = jnp.asarray(np.random.default_rng(1).random((8, 16, 3)), jnp.float32)
    xyz = jnp.full((64, 3), np.nan, jnp.float32)
    rgb = jnp.ones((64, 3), jnp.float32) * 0.5
    pose = Pose(t=jnp.zeros(3), yaw=jnp.float32(0.1),
                pitch=jnp.float32(0.0), roll=jnp.float32(0.0))
    jax.block_until_ready(xyz)

    _setup_debug(make_config(dataset="Stanford2D-3D-S", debug_nans=True))
    try:
        grad_fn = jax.jit(jax.grad(lambda p: sampling_loss(p, xyz, rgb, img)))
        with pytest.raises(FloatingPointError):
            jax.block_until_ready(grad_fn(pose))
    finally:
        jax.config.update("jax_debug_nans", False)


def test_cluttered_room_recovers_pose():
    """Occluded/cluttered scene: the pipeline must still localize (points
    behind occluders lose the z-buffer without poisoning the loss)."""
    import jax.numpy as jnp
    import numpy as np

    from piccolo_tpu.harness.localize import _order_bounds, _pad_cloud
    from piccolo_tpu.init import default_init_dict
    from piccolo_tpu.init.candidates import (
        generate_rot_points,
        generate_trans_points,
    )
    from piccolo_tpu.pipeline import localize_query
    from piccolo_tpu.testing import (
        make_cluttered_room,
        pose_outside_occluders,
        render_at,
    )

    rng = np.random.default_rng(4)
    size = (5.0, 4.0, 2.8)
    xyz, rgb, occ = make_cluttered_room(
        rng, n_per_wall=900, size=size, n_occluders=2, n_per_occluder=600
    )
    assert occ.shape == (2, 2, 3)
    gt_t, gt_ypr = pose_outside_occluders(rng, occ, size)
    img = render_at(xyz, rgb, gt_t, gt_ypr, (96, 192))

    xyz_d, rgb_d, mask_d = _pad_cloud(
        xyz.astype(np.float32), rgb.astype(np.float32)
    )
    lo, hi = _order_bounds(xyz, 0.05)
    init_dict = default_init_dict(
        xy_only=True, num_trans=20, yaw_only=True, num_yaw=8,
        z_prior=None, num_split_h=4, num_split_w=4,
    )
    tg = generate_trans_points(xyz, init_dict)
    rg = generate_rot_points(init_dict)
    res = localize_query(
        img, img, xyz_d, rgb_d, jnp.asarray(tg), jnp.asarray(rg),
        jnp.ones(tg.shape[0], bool), jnp.asarray(lo), jnp.asarray(hi),
        mask_d, num_intermediate=16, num_input=6, num_iter=80,
        lr=0.1, patience=5, factor=0.8, masked=True,
        grid_chunk=8, hist_chunk=4,
    )
    t_err = float(np.linalg.norm(np.asarray(res.t) - gt_t))
    assert t_err < 0.2, t_err


def test_prepare_stanford_images_sharpen_init_only():
    """sharpen_color color-mods the INIT image only; the descent image is
    the unmodified main resize (reference localize.py:173-179,211-212).
    Shared by the CLI and serving (serve.py) — this pins the semantics."""
    import numpy as np
    from piccolo_tpu.config import make_config
    from piccolo_tpu.harness.localize import (
        _pad_cloud, prepare_stanford_images,
    )

    rng = np.random.default_rng(0)
    orig = rng.integers(0, 256, (64, 128, 3), dtype=np.uint8)
    rgb_np = rng.random((500, 3)).astype(np.float32)
    xyz_np = rng.normal(size=(500, 3)).astype(np.float32)
    _, rgb_d, mask_d = _pad_cloud(xyz_np, rgb_np)
    room = dict(rgb=rgb_d, rgb_np=rgb_np, mask=mask_d)

    cfg = make_config(dataset="Stanford2D-3D-S", sharpen_color=True,
                      init_downsample_h=2, init_downsample_w=2)
    img_init, img_main, rgb_used, prep_timed = prepare_stanford_images(
        cfg, orig, room
    )
    assert img_init.shape == (32, 64, 3)
    # main image untouched by color_mod: exactly orig/255 at full res
    np.testing.assert_array_equal(
        img_main, orig.astype(np.float32) / 255.0
    )
    # init image IS modified (equalized) and rgb_used rebound + padded
    assert not np.array_equal(
        img_init, (orig[::2, ::2].astype(np.float32) / 255.0)
    )
    assert rgb_used.shape[0] == int(mask_d.shape[0])
    assert rgb_used is not room["rgb"]
    assert prep_timed >= 0


def test_prepare_omniscenes_images_synth_ablations():
    """synth_const/gamma/wb semantics (reference localize.py:384-393),
    incl. the documented wb saturate-at-255 fix, the 2048x1024 resize and
    the init-downsample halving (localize.py:349-381)."""
    import numpy as np
    from piccolo_tpu.config import make_config
    from piccolo_tpu.harness.localize import (
        _pad_cloud, prepare_omniscenes_images,
    )

    rng = np.random.default_rng(1)
    raw = rng.integers(0, 256, (128, 256, 3), dtype=np.uint8)
    raw[0, 0] = [200, 100, 50]
    rgb_np = rng.random((400, 3)).astype(np.float32)
    xyz_np = rng.normal(size=(400, 3)).astype(np.float32)
    _, rgb_d, mask_d = _pad_cloud(xyz_np, rgb_np)
    room = dict(rgb=rgb_d, rgb_np=rgb_np, mask=mask_d)

    base = make_config(dataset="OmniScenes", init_downsample_h=2,
                       init_downsample_w=2)
    orig, img_init, img_main, rgb_used, _ = prepare_omniscenes_images(
        base, raw, room
    )
    assert orig.shape == (1024, 2048, 3) and orig.dtype == np.uint8
    # halved init downsample: 2 -> 1, so init == main == full 2048x1024
    assert img_init.shape == (1024, 2048, 3)
    assert img_main.shape == (1024, 2048, 3)
    assert rgb_used is room["rgb"]

    # synth_const: integer divide of the uint8 image
    cfg = base._replace() if hasattr(base, "_replace") else base
    cfg = make_config(dataset="OmniScenes", synth_const=2)
    orig_c, _, _, _, _ = prepare_omniscenes_images(cfg, raw, room)
    ref_c = (np.asarray(
        __import__("piccolo_tpu.harness.imaging", fromlist=["resize"])
        .resize(raw, (2048, 1024))
    ) // 2).astype(np.uint8)
    np.testing.assert_array_equal(orig_c, ref_c)

    # synth_wb > 1 saturates at 255 instead of wrapping (parity-notes fix)
    cfg = make_config(dataset="OmniScenes", synth_wb=True,
                      synth_r=3.0, synth_g=1.0, synth_b=1.0)
    orig_wb, _, _, _, _ = prepare_omniscenes_images(cfg, raw, room)
    assert orig_wb[..., 0].max() == 255
    assert orig_wb.dtype == np.uint8

    # synth_gamma
    cfg = make_config(dataset="OmniScenes", synth_gamma=2.0)
    from piccolo_tpu.harness.imaging import resize as _rs

    orig_g, _, _, _, _ = prepare_omniscenes_images(cfg, raw, room)
    expect = ((_rs(raw, (2048, 1024)) / 255.0) ** 2.0 * 255).astype(np.uint8)
    np.testing.assert_array_equal(orig_g, expect)


def test_device_index_commit_and_equality(rng):
    """device_index pins a process's fused queries to one chip: the room
    commits to jax.devices()[i] and _run_fused co-locates the per-query
    images there, with results identical to default placement."""
    import jax

    from piccolo_tpu.harness.localize import (
        _commit_room,
        _FusedGrids,
        _order_bounds,
        _pad_cloud,
        _query_device,
        _run_fused,
        get_init_dict,
    )

    cfg = make_config(
        dataset="Stanford2D-3D-S", xy_only=True, num_trans=16,
        yaw_only=True, num_yaw=4, z_prior=None,
        num_split_h=4, num_split_w=4, num_intermediate=8, num_input=4,
        num_iter=40, device_index=1,
    )
    init_dict = get_init_dict(cfg)
    xyz, rgb = make_room(rng, n_per_wall=1200, texture="checker")
    img = np.asarray(
        render_at(xyz, rgb, np.zeros(3, np.float32),
                  np.array([0.7, 0, 0], np.float32), (128, 256))
    )

    def build_room(dev):
        xyz_d, rgb_d, mask_d = _pad_cloud(xyz, rgb)
        lo, hi = _order_bounds(xyz, 0.05)
        room = dict(xyz_np=xyz, rgb_np=rgb, xyz=xyz_d, rgb=rgb_d,
                    mask=mask_d, lo=lo, hi=hi,
                    grids=_FusedGrids(xyz, init_dict))
        return _commit_room(room, dev)

    dev = _query_device(cfg)
    assert dev is jax.devices()[1]
    room1 = build_room(dev)
    assert room1["xyz"].devices() == {dev}
    assert room1["grids"].trans.devices() == {dev}
    res1 = _run_fused(img, img, room1, room1["rgb"], cfg, init_dict,
                      room1["grids"])
    assert res1.t.devices() == {dev}

    room0 = build_room(None)
    res0 = _run_fused(img, img, room0, room0["rgb"], cfg, init_dict,
                      room0["grids"])
    assert int(res1.winner) == int(res0.winner)
    np.testing.assert_allclose(np.asarray(res1.t), np.asarray(res0.t),
                               atol=3e-2)
    np.testing.assert_allclose(float(res1.loss), float(res0.loss), atol=5e-3)


def test_device_index_validation():
    import pytest

    from piccolo_tpu.harness.localize import _query_device

    with pytest.raises(ValueError, match="mutually exclusive"):
        _query_device(make_config(device_index=0, n_devices=2))
    with pytest.raises(ValueError, match="devices are visible"):
        _query_device(make_config(device_index=64))
    # staged-path configs fall back loudly to the default device
    assert _query_device(make_config(device_index=1), fused=False) is None


def test_cfg_prune_resolution():
    """_cfg_prune: off by default; visualize falls back to the full descent."""
    import warnings as _w

    from piccolo_tpu.config import make_config
    from piccolo_tpu.harness import localize as _hl
    from piccolo_tpu.harness.localize import _cfg_prune

    _hl._prune_warned.clear()  # once-only warning set is process-global

    off = make_config(dataset="Stanford2D-3D-S")
    assert _cfg_prune(off) is None
    on = make_config(descent_prune_iter=30, descent_prune_keep=2)
    assert _cfg_prune(on) == (30, 2)
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        assert _cfg_prune(on, want_traj=True) is None  # GIFs -> full descent
    assert any("full descent" in str(r.message) for r in rec)


def test_remote_tunnel_frontend_detection(monkeypatch):
    """The axon plugin registers devices under the plain 'tpu' platform
    name, so remote-tunnel detection must read platform_version (a
    `default_backend() != "axon"` check never fires — the disk plan cache
    was silently ON over the tunnel)."""
    from piccolo_tpu.harness import localize as hl

    class FakeClient:
        platform_version = "PJRT C API\naxon 0.1.0; compile-cache v14"

    class FakeDev:
        client = FakeClient()

    monkeypatch.setattr(hl.jax, "devices", lambda: [FakeDev()])
    assert hl._remote_tunnel_frontend() is True
    FakeClient.platform_version = "PJRT C API\nTFRT TPU v5"
    assert hl._remote_tunnel_frontend() is False

    def boom():
        raise RuntimeError("no backend")

    monkeypatch.setattr(hl.jax, "devices", boom)
    assert hl._remote_tunnel_frontend() is False

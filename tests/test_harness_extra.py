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

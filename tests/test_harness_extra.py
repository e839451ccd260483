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

"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

The sharded solver must produce the same result as the single-device vmapped
solver (up to f32 reduction-order noise) under every mesh factorization.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from piccolo_tpu.ops.quantile import cloud_bounds
from piccolo_tpu.parallel import make_mesh, solve_sharded
from piccolo_tpu.solver import descend
from piccolo_tpu.testing import make_room, render_at


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(3)
    xyz, rgb = make_room(rng, n_per_wall=800)
    gt_t = np.array([0.3, -0.2, 0.1], np.float32)
    gt_ypr = np.array([0.9, 0.0, 0.0], np.float32)
    img = np.asarray(render_at(xyz, rgb, gt_t, gt_ypr, (64, 128)))
    lo, hi = cloud_bounds(jnp.asarray(xyz), 0.05)
    t0 = np.stack([gt_t + [0.2, -0.1, 0.05], [1.0, 1.0, 0.3], [-1.0, 0.5, 0.2]]).astype(np.float32)
    ypr0 = np.stack([[1.1, 0, 0], [2.0, 0, 0], [4.0, 0, 0]]).astype(np.float32)
    return xyz, rgb, img, np.asarray(lo), np.asarray(hi), t0, ypr0, gt_t


def test_devices_available():
    assert len(jax.devices()) == 8, jax.devices()


def test_make_mesh_explicit_single_axis():
    """Explicitly fixing ONE axis fills only the other (regression)."""
    m = make_mesh(n_cand=4)
    assert m.shape == {"cand": 4, "point": 2}
    m = make_mesh(n_point=8)
    assert m.shape == {"cand": 1, "point": 8}
    m = make_mesh()
    assert m.shape == {"cand": 2, "point": 4}


@pytest.mark.parametrize("n_cand,n_point", [(1, 8), (2, 4), (4, 2), (8, 1)])
def test_sharded_matches_single_device(scene, n_cand, n_point):
    """Short-horizon trajectories must match tightly across every mesh
    factorization (any systematic deviation — e.g. a mis-transposed psum —
    shows up immediately); long horizons only agree on the winner because
    f32 reduction-order noise amplifies chaotically on non-converging
    candidates."""
    xyz, rgb, img, lo, hi, t0, ypr0, gt_t = scene
    mesh = make_mesh(n_cand, n_point)

    ref3 = descend(
        jnp.asarray(img), jnp.asarray(xyz), jnp.asarray(rgb),
        jnp.asarray(t0), jnp.asarray(ypr0), jnp.asarray(lo), jnp.asarray(hi),
        num_iter=3, lr=0.1, patience=5, factor=0.8,
    )
    _, _, _, res3 = solve_sharded(
        mesh, img, xyz, rgb, t0, ypr0, lo, hi,
        num_iter=3, lr=0.1, patience=5, factor=0.8,
    )
    np.testing.assert_allclose(np.asarray(res3.t), np.asarray(ref3.t), atol=2e-2)
    np.testing.assert_allclose(
        np.asarray(res3.loss), np.asarray(ref3.loss), atol=1e-3
    )

    ref = descend(
        jnp.asarray(img), jnp.asarray(xyz), jnp.asarray(rgb),
        jnp.asarray(t0), jnp.asarray(ypr0), jnp.asarray(lo), jnp.asarray(hi),
        num_iter=30, lr=0.1, patience=5, factor=0.8,
    )
    t, R, loss, res = solve_sharded(
        mesh, img, xyz, rgb, t0, ypr0, lo, hi,
        num_iter=30, lr=0.1, patience=5, factor=0.8,
    )
    k_ref = int(np.argmin(np.asarray(ref.loss)))
    k = int(np.argmin(np.asarray(res.loss)))
    assert k == k_ref
    # the winner lands in the same basin (still descending at 30 iters, so
    # per-step f32 noise leaves cm-scale spread)
    np.testing.assert_allclose(
        np.asarray(res.t[k]), np.asarray(ref.t[k_ref]), atol=8e-2
    )
    np.testing.assert_allclose(
        float(res.loss[k]), float(ref.loss[k_ref]), atol=8e-3
    )


def test_sharded_point_padding_is_inert(scene):
    """Point counts not divisible by the mesh axis must not change results."""
    xyz, rgb, img, lo, hi, t0, ypr0, gt_t = scene
    mesh = make_mesh(2, 4)
    # chop to a count not divisible by 4
    m = xyz.shape[0] - 3
    t1, _, l1, _ = solve_sharded(
        mesh, img, xyz[:m], rgb[:m], t0, ypr0, lo, hi, num_iter=10,
        factor=0.8,
    )
    # same cloud, explicit mask instead of chop
    mask = np.arange(xyz.shape[0]) < m
    t2, _, l2, _ = solve_sharded(
        mesh, img, xyz, rgb, t0, ypr0, lo, hi, point_mask=mask, num_iter=10,
        factor=0.8,
    )
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2), atol=1e-5)
    np.testing.assert_allclose(float(l1), float(l2), atol=1e-6)


def test_sharded_recovers_pose(scene):
    xyz, rgb, img, lo, hi, t0, ypr0, gt_t = scene
    mesh = make_mesh()  # default factorization over all 8 devices
    t, R, loss, res = solve_sharded(
        mesh, img, xyz, rgb, t0, ypr0, lo, hi,
        num_iter=80, lr=0.1, patience=5, factor=0.8,
    )
    assert float(jnp.linalg.norm(t - jnp.asarray(gt_t))) < 0.25

"""Tests for ypr -> rotation matrices (reference utils.py:425-453)."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

from piccolo_tpu.ops.rotation import rot_from_ypr


def test_matches_scipy_euler(rng):
    ypr = rng.uniform(-np.pi, np.pi, size=(100, 3)).astype(np.float32)
    ours = np.asarray(rot_from_ypr(jnp.asarray(ypr)))
    # R = RZ(yaw) @ RY(pitch) @ RX(roll) == intrinsic 'ZYX' euler
    ref = Rotation.from_euler("ZYX", ypr).as_matrix().astype(np.float32)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_orthonormal(rng):
    ypr = rng.uniform(-np.pi, np.pi, size=(50, 3)).astype(np.float32)
    R = np.asarray(rot_from_ypr(jnp.asarray(ypr)))
    eye = np.eye(3, dtype=np.float32)
    for r in R:
        np.testing.assert_allclose(r @ r.T, eye, atol=1e-5)
        assert np.linalg.det(r) > 0.99


def test_identity():
    R = np.asarray(rot_from_ypr(jnp.zeros(3)))
    np.testing.assert_allclose(R, np.eye(3), atol=1e-7)


def test_vmap_consistency(rng):
    ypr = rng.uniform(-np.pi, np.pi, size=(10, 3)).astype(np.float32)
    batched = np.asarray(rot_from_ypr(jnp.asarray(ypr)))
    vmapped = np.asarray(jax.vmap(rot_from_ypr)(jnp.asarray(ypr)))
    np.testing.assert_allclose(batched, vmapped, atol=1e-7)

"""Spherical (equirectangular) projection ops.

TPU-native re-design of the reference's ``cloud2idx`` (reference:
``utils.py:16-61``).  Unlike the reference there is no separate
batched/unbatched variant: the function is written rank-polymorphic over
leading dimensions and is `vmap`/`jit` safe, so the batched form falls out of
``jax.vmap`` for free.

Conventions (identical to the reference):
  * Points live in the camera frame with +z up; the camera looks along the
    equator of the unit sphere.
  * ``theta`` (polar angle, [0, pi]) = atan2(||xy||, z + 1e-6)
  * ``phi`` (azimuth, [0, 2pi])      = atan2(y, x + 1e-6) + pi
  * Normalised image coords (x, y) in [-1, 1]:
      u = 2 * (1 - phi / (2 pi)) - 1
      v = 2 * (theta / pi) - 1
  The tiny 1e-6 offsets are kept for exact parity with the reference — they
  shift the singular directions and matter for bit-level comparisons.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["spherical_project", "safe_norm"]

_TWO_PI = 2.0 * np.pi


def safe_norm(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """L2 norm with a zero (not NaN) gradient at the origin.

    ``jnp.linalg.norm`` produces NaN cotangents at exactly-zero vectors
    because of the sqrt; the double-where trick keeps the primal exact and
    the gradient finite (zero), matching torch's subgradient convention.
    """
    sq = jnp.sum(x * x, axis=axis)
    pos = sq > 0
    return jnp.sqrt(jnp.where(pos, sq, 1.0)) * pos


def spherical_project(xyz: jnp.ndarray) -> jnp.ndarray:
    """Project 3-D points onto equirectangular image coords in [-1, 1].

    Args:
      xyz: (..., 3) array of points in the camera frame.

    Returns:
      (..., 2) array of (x, y) sampling coordinates in [-1, 1], the exact
      convention consumed by :func:`piccolo_tpu.ops.sampling.bilinear_sample`.
    """
    x = xyz[..., 0]
    y = xyz[..., 1]
    z = xyz[..., 2]

    # polar angle in [0, pi]
    theta = jnp.arctan2(safe_norm(xyz[..., :2]), z + 1e-6)
    # azimuth in [0, 2 pi]
    phi = jnp.arctan2(y, x + 1e-6) + np.pi

    u = 2.0 * (1.0 - phi / _TWO_PI) - 1.0
    v = 2.0 * (theta / np.pi) - 1.0
    return jnp.stack([u, v], axis=-1)

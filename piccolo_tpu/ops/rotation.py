"""Rotation construction from yaw/pitch/roll.

Replaces the reference's ``rot_from_ypr`` (reference: ``utils.py:425-453``)
and the three inline RX/RY/RZ stacks in ``omniloc.py:71-87,172-188,315-330``.

Convention (identical to the reference): R = RZ(yaw) @ RY(pitch) @ RX(roll),
applied to points as ``x_cam = R @ (x_world - t)``.

Rank-polymorphic: accepts (..., 3) ypr and returns (..., 3, 3); the batched
variant the reference hand-wrote (``BatchSamplingLoss``) is just this under
vmap/broadcasting.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["rot_from_ypr", "rot_x", "rot_y", "rot_z"]


def rot_x(a: jnp.ndarray) -> jnp.ndarray:
    """(...,) angle -> (..., 3, 3) rotation about +x (roll)."""
    c, s = jnp.cos(a), jnp.sin(a)
    o, z = jnp.ones_like(a), jnp.zeros_like(a)
    return jnp.stack(
        [
            jnp.stack([o, z, z], -1),
            jnp.stack([z, c, -s], -1),
            jnp.stack([z, s, c], -1),
        ],
        -2,
    )


def rot_y(a: jnp.ndarray) -> jnp.ndarray:
    """(...,) angle -> (..., 3, 3) rotation about +y (pitch)."""
    c, s = jnp.cos(a), jnp.sin(a)
    o, z = jnp.ones_like(a), jnp.zeros_like(a)
    return jnp.stack(
        [
            jnp.stack([c, z, s], -1),
            jnp.stack([z, o, z], -1),
            jnp.stack([-s, z, c], -1),
        ],
        -2,
    )


def rot_z(a: jnp.ndarray) -> jnp.ndarray:
    """(...,) angle -> (..., 3, 3) rotation about +z (yaw)."""
    c, s = jnp.cos(a), jnp.sin(a)
    o, z = jnp.ones_like(a), jnp.zeros_like(a)
    return jnp.stack(
        [
            jnp.stack([c, -s, z], -1),
            jnp.stack([s, c, z], -1),
            jnp.stack([z, z, o], -1),
        ],
        -2,
    )


def rot_from_ypr(ypr: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) [yaw, pitch, roll] -> (..., 3, 3) R = RZ @ RY @ RX.

    Uses full-f32 matmul precision: on TPU the default precision computes
    f32 matmuls with bf16 inputs, which is far too coarse for pose math.
    """
    yaw = ypr[..., 0]
    pitch = ypr[..., 1]
    roll = ypr[..., 2]
    zy = jnp.einsum(
        "...ij,...jk->...ik", rot_z(yaw), rot_y(pitch), precision="highest"
    )
    return jnp.einsum(
        "...ij,...jk->...ik", zy, rot_x(roll), precision="highest"
    )

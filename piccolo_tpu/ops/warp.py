"""Full-image warping via the bilinear sampler.

Equivalent of the reference's ``warp_from_img`` (reference:
``utils.py:106-131``): sample an (H, W, C) image at an (H', W', 2) grid of
normalized coordinates, producing a warped (H', W', C) image. Shares the
exact grid_sample-parity semantics of :func:`bilinear_sample` (zeros
padding, +-0.99 clip, align_corners=False).
"""

from __future__ import annotations

import jax.numpy as jnp

from .sampling import bilinear_sample

__all__ = ["warp_from_img"]


def warp_from_img(img: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Warp ``img`` by a coordinate ``grid``.

    Args:
      img:  (H, W, C) source image.
      grid: (H', W', 2) normalized (x, y) sampling coordinates in [-1, 1].

    Returns:
      (H', W', C) warped image.
    """
    Ho, Wo, _ = grid.shape
    out = bilinear_sample(img, grid.reshape(-1, 2))
    return out.reshape(Ho, Wo, img.shape[-1])

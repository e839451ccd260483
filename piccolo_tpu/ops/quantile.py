"""Order-statistic helpers.

The reference uses two different quantile notions and we preserve both:
  * ``order_quantile`` — the custom argsort-based pair used for the
    translation clamp box and the out-of-room gate (reference:
    ``utils.py:208-254``): sorted[x][int(n*q)] and sorted[x][int(n*(1-q))].
  * linear-interpolation quantiles (torch.quantile) used by the candidate
    grids — those call sites use ``jnp.quantile`` directly, which matches.
"""

from __future__ import annotations



import jax.numpy as jnp
import numpy as np

__all__ = [
    "order_quantile",
    "cloud_bounds",
    "out_of_room",
    "outside_box",
    "pose_search_bounds",
]


def _xp(a):
    """numpy in -> numpy math (host path, no device transfer); jnp otherwise.

    The clamp-box semantics live ONLY here; both the jitted device callers
    and the harness's host-side gating share this one implementation.
    """
    return np if isinstance(a, np.ndarray) else jnp


def order_quantile(x, q: float):
    """Return (sorted[int(n*q)], sorted[int(n*(1-q))]) of a 1-D array.

    Exact parity with reference ``utils.quantile`` (utils.py:208-229): the
    *lower* order statistic at index int(n*q), no interpolation.
    """
    n = x.shape[0]
    s = _xp(x).sort(x)
    return s[int(n * q)], s[int(n * (1 - q))]


def cloud_bounds(xyz, q: float = 0.05):
    """Per-axis (lo, hi) clamp box from order quantiles.

    Used for the per-step translation clamp (reference: ``omniloc.py:52-58``)
    and the out-of-room gate. Returns ((3,), (3,)) arrays.
    """
    n = xyz.shape[0]
    s = _xp(xyz).sort(xyz, axis=0)
    lo = s[int(n * q)]
    hi = s[int(n * (1 - q))]
    return lo, hi


def pose_search_bounds(
    xyz: jnp.ndarray,
    out_quantile: float = 0.05,
    yaw=(0.0, 6.283185307179586),
    pitch=(0.0, 3.141592653589793),
    roll=(0.0, 6.283185307179586),
    as_slices: bool = False,
):
    """6-DoF search bounds for external optimizers.

    Equivalent of the reference's ``get_bound`` (utils.py:257-279), which
    fed a bayesian-optimization / brute-force search: translation bounds
    from the cloud's order-quantile box plus configurable angle ranges.
    Returns a dict of (lo, hi) pairs, or slices when ``as_slices``.
    """
    lo, hi = cloud_bounds(xyz, out_quantile)
    lo = [float(v) for v in lo]
    hi = [float(v) for v in hi]
    if as_slices:
        return (
            slice(lo[0], hi[0]), slice(lo[1], hi[1]), slice(lo[2], hi[2]),
            slice(*yaw), slice(*pitch), slice(*roll),
        )
    return {
        "x": (lo[0], hi[0]), "y": (lo[1], hi[1]), "z": (lo[2], hi[2]),
        "yaw": tuple(yaw), "pitch": tuple(pitch), "roll": tuple(roll),
    }


def out_of_room(xyz, trans, q: float = 0.05) -> bool:
    """True if ``trans`` falls outside the quantile box of the cloud.

    Parity with reference ``utils.out_of_room`` (utils.py:232-254); note the
    strict inequalities.
    """
    lo, hi = cloud_bounds(xyz, q)
    return outside_box(lo, hi, trans)


def outside_box(lo, hi, trans) -> bool:
    """The gate of :func:`out_of_room` against a precomputed clamp box
    (the harness caches (lo, hi) per room)."""
    t = np.asarray(trans).reshape(-1)[:3]
    lo = np.asarray(lo)
    hi = np.asarray(hi)
    return not bool(np.all((t > lo) & (t < hi)))

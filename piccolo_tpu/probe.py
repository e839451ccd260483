"""Batched room-ranking probe — ONE program scores every resident room.

Serving's ``room="auto"`` (serve.py) must decide which resident room a
query panorama belongs to.  The discriminator has to be a DESCENDED loss
(stage-1 grid minima measurably do not separate same-generator rooms —
docs/ROUND3.md), but a full query per room is expensive, and round 4's
per-room probe (design 2) measured SLOWER than the full loop at
Stanford scale because each probe paid its own dispatch + fetch + an
untruncated stage 1 (docs/ROUND4.md §4).

Design 3 (this module): batch ALL rooms into one jitted program —

  * clouds padded to the residents' max size bucket (validity masks);
  * per-room translation grids SUBSAMPLED to a pair budget (probes rank,
    they don't localize) and padded to a common row count;
  * the rotation grid is config-derived, hence shared;
  * per room: a truncated stage-1 loss table at init resolution ->
    top ``num_starts`` -> a short descent (the same parity transition,
    solver._make_step) -> min loss;
  * ``vmap`` over rooms, ONE dispatch, ONE (R,)-vector fetch.

The per-room dispatch/fetch overhead that dominated design 2 is paid
once for the whole resident set.  No reference counterpart (the
reference assumes the query's room is known, localize.py:152-165).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .init.refine import score_pose_grid
from .ops.sampling import pack_bilinear_blocks
from .solver import _descend_single

__all__ = ["probe_rooms", "ProbeState", "build_probe_state"]

PROBE_STATICS = ("num_starts", "num_iter", "lr", "patience", "factor",
                 "wrap")


@functools.partial(jax.jit, static_argnames=PROBE_STATICS)
def probe_rooms(
    img_init: jnp.ndarray,
    xyz: jnp.ndarray,          # (R, N, 3) padded clouds
    rgb: jnp.ndarray,          # (R, N, 3)
    point_mask: jnp.ndarray,   # (R, N) bool
    trans: jnp.ndarray,        # (R, T, 3) padded probe translation grids
    trans_valid: jnp.ndarray,  # (R, T) bool
    rot: jnp.ndarray,          # (K, 3) shared rotation grid
    lo: jnp.ndarray,           # (R, 3) per-room clamp boxes
    hi: jnp.ndarray,           # (R, 3)
    *,
    num_starts: int = 6,
    num_iter: int = 30,
    lr: float = 0.1,
    patience: int = 5,
    factor: float = 0.8,
    wrap: bool = False,
) -> jnp.ndarray:
    """Probe losses (R,) — per room, the best short-descended loss.

    Every stage runs at the INIT image resolution (the probe never sees
    the main image): a truncated loss table over the room's probe grid
    x the shared rotation grid (padding rows +inf), the ``num_starts``
    best pairs descend ``num_iter`` steps with the reference
    loss+Adam+plateau+clamp transition, and the room reports the minimum
    final loss (+inf when nothing valid — the caller's non-finite
    fallback chain handles empty/degenerate rooms).
    """
    H, W, _ = img_init.shape
    blocks = pack_bilinear_blocks(img_init, wrap=wrap)
    K = rot.shape[0]

    def one_room(xyz_r, rgb_r, pm_r, trans_r, valid_r, lo_r, hi_r):
        scores = score_pose_grid(
            img_init, xyz_r, rgb_r, trans_r, rot, pm_r,
            valid=valid_r, wrap=wrap,
        )
        neg, idx = jax.lax.top_k(-scores, num_starts)
        T = trans_r.shape[0]
        pair_t = jnp.repeat(trans_r, K, axis=0)
        pair_r = jnp.tile(rot, (T, 1))
        t0 = jnp.take(pair_t, idx, axis=0)
        y0 = jnp.take(pair_r, idx, axis=0)
        ok = jnp.isfinite(neg)  # grid-padding pairs scored +inf

        def one(t, y):
            _, loss, _, _ = _descend_single(
                blocks, H, W, xyz_r, rgb_r, t, y, lo_r, hi_r, pm_r,
                num_iter, lr, patience, factor, False, wrap,
            )
            return loss

        losses = jax.vmap(one)(t0, y0)
        losses = jnp.where(ok & jnp.isfinite(losses), losses, jnp.inf)
        return jnp.min(losses)

    return jax.vmap(one_room)(xyz, rgb, point_mask, trans, trans_valid,
                              lo, hi)


class ProbeState:
    """Host-built batched arrays for :func:`probe_rooms` over a resident set.

    Rebuilt whenever the resident set changes (cheap: pure padding/stacking
    of host arrays already in the room caches).  Shapes bucket naturally:
    clouds pad to the residents' max cloud bucket and probe grids to the
    max subsampled row count rounded up to a multiple of 8, so loading one
    more room of a similar size rarely changes the compiled shape.
    """

    def __init__(self, names, xyz, rgb, point_mask, trans, trans_valid,
                 rot, lo, hi):
        self.names: Tuple[str, ...] = tuple(names)
        self.xyz = xyz
        self.rgb = rgb
        self.point_mask = point_mask
        self.trans = trans
        self.trans_valid = trans_valid
        self.rot = rot
        self.lo = lo
        self.hi = hi

    def losses(self, img_init, **kw) -> np.ndarray:
        """Run the batched probe; returns host (R,) losses (one fetch)."""
        return np.asarray(probe_rooms(
            jnp.asarray(img_init, jnp.float32), self.xyz, self.rgb,
            self.point_mask, self.trans, self.trans_valid, self.rot,
            self.lo, self.hi, **kw,
        ))


def _subsample_rows(trans: np.ndarray, n_rot: int, max_pairs: int):
    """Every k-th REAL translation row so rows*n_rot <= max_pairs (>=1)."""
    n = trans.shape[0]
    budget = max(1, int(max_pairs) // max(1, int(n_rot)))
    stride = -(-n // budget)  # ceil
    return trans[::stride]


def build_probe_state(
    rooms, rot: np.ndarray, *, max_pairs: int = 512, device=None,
) -> ProbeState:
    """Batch the resident rooms' probe inputs into one padded stack.

    Args:
      rooms: iterable of ``(name, cache)`` where cache is a serving/harness
        room dict (``xyz_np``/``rgb_np`` host arrays, ``grids`` with the
        full candidate grid and ``n_trans``, ``lo``/``hi``).
      rot: the shared (K, 3) rotation grid (config-derived, identical
        across rooms by construction).
      max_pairs: per-room stage-1 pair budget — each room's REAL
        translation rows are strided down so rows x len(rot) fits it.
      device: optional jax device for the stacked arrays.
    """
    names, clouds, grids, boxes = [], [], [], []
    for name, cache in rooms:
        names.append(name)
        clouds.append((np.asarray(cache["xyz_np"], np.float32),
                       np.asarray(cache["rgb_np"], np.float32)))
        g = cache["grids"]
        real = np.asarray(g.trans[:g.n_trans], np.float32)
        grids.append(_subsample_rows(real, rot.shape[0], max_pairs))
        boxes.append((np.asarray(cache["lo"], np.float32).reshape(3),
                      np.asarray(cache["hi"], np.float32).reshape(3)))

    n_max = max(x.shape[0] for x, _ in clouds)
    t_max = max(t.shape[0] for t in grids)
    t_max += (-t_max) % 8  # coarse bucket: stable shapes across sets
    R = len(names)
    xyz = np.zeros((R, n_max, 3), np.float32)
    rgb = np.zeros((R, n_max, 3), np.float32)
    pm = np.zeros((R, n_max), bool)
    trans = np.zeros((R, t_max, 3), np.float32)
    valid = np.zeros((R, t_max), bool)
    lo = np.zeros((R, 3), np.float32)
    hi = np.zeros((R, 3), np.float32)
    for i, ((x, c), t, (l, h)) in enumerate(zip(clouds, grids, boxes)):
        xyz[i, : x.shape[0]] = x
        rgb[i, : c.shape[0]] = c
        pm[i, : x.shape[0]] = True
        trans[i, : t.shape[0]] = t
        valid[i, : t.shape[0]] = True
        lo[i], hi[i] = l, h

    put = (functools.partial(jax.device_put, device=device)
           if device is not None else jnp.asarray)
    return ProbeState(
        names, put(xyz), put(rgb), put(pm), put(trans), put(valid),
        put(np.asarray(rot, np.float32)), put(lo), put(hi),
    )

"""Disk persistence for sorted-slab grid plans (room-static, cacheable).

A GridPlan is a pure function of (cloud, candidate grids, init-image size,
layout flags) — all room-static — yet round 2 rebuilt it from scratch in
every process (~10 s per room at dense OmniScenes scale, paid synchronously
on each room's first query).  This module gives plans a lifecycle:

  * content-addressed save/load under ``~/.cache/piccolo_tpu/plans``
    (override via config ``slab_plan_cache_dir``), keyed by a digest of the
    exact plan inputs plus a format version — any change to the cloud, the
    grids, the image size, the layout flags, or the plan format invalidates
    the entry by construction (no staleness checks needed);
  * atomic writes (tmp file + rename) so concurrent processes can share a
    cache directory;
  * mtime-LRU eviction against a byte budget so the cache can't grow
    without bound (plans are GBs each at dense scales).

The harness (``_maybe_slab_plan``) loads on hit, and on miss builds on a
BACKGROUND thread while first queries take the XLA stage-1 — see
harness/localize.py.  No reference counterpart (the reference has no
stage-1 acceleration structure at all; its cost lives in the Python loop at
``utils.py:462-507``).
"""

from __future__ import annotations

import hashlib
import os
import tempfile
from typing import Optional

import numpy as np

from .slab_sampling import GridPlan

__all__ = [
    "plan_key",
    "save_plan",
    "load_plan",
    "evict_lru",
    "default_plan_cache_dir",
    "PLAN_FORMAT_VERSION",
]

# Bump whenever the on-disk layout OR the plan semantics change (field
# order, packing, window math) — old entries then miss by construction.
# v3: per-plan window/block geometry (round 3).
# v4: quantized (q8) plan layout flag in the aux record (round 5).
PLAN_FORMAT_VERSION = 4


def default_plan_cache_dir() -> str:
    return os.path.join(
        os.path.expanduser("~"), ".cache", "piccolo_tpu", "plans"
    )


def _digest_array(h, a) -> None:
    a = np.asarray(a)
    h.update(str(a.dtype).encode())
    h.update(str(a.shape).encode())
    h.update(np.ascontiguousarray(a).tobytes())


def plan_key(
    xyz,
    rgb,
    point_mask,
    trans_grid,
    rot_grid,
    height: int,
    width: int,
    compact: bool,
    tp_is_pid: bool,
    wrap: bool = False,
    window=None,
    block=None,
    quant: bool = False,
) -> str:
    """Content digest of everything a plan is a function of.

    Hashing the padded cloud + grids costs a few ms at OmniScenes scale
    (tens of MB through blake2b) — noise next to a build or even a load.
    """
    h = hashlib.blake2b(digest_size=16)
    h.update(f"v{PLAN_FORMAT_VERSION}".encode())
    _digest_array(h, xyz)
    _digest_array(h, rgb)
    if point_mask is not None:
        _digest_array(h, point_mask)
    else:
        h.update(b"nomask")
    _digest_array(h, trans_grid)
    _digest_array(h, rot_grid)
    h.update(
        f"{height}x{width}:{int(compact)}{int(tp_is_pid)}{int(wrap)}"
        f"{int(quant)}".encode()
    )
    if window is not None or block is not None:
        # explicit geometry overrides change plan contents; the auto
        # geometry is a pure function of the hashed inputs, so None (the
        # common case) needs no key contribution
        h.update(f"g{window}x{block}".encode())
    return h.hexdigest()


def _path(cache_dir: str, key: str) -> str:
    return os.path.join(cache_dir, f"plan_{key}.npz")


def save_plan(cache_dir: str, key: str, plan: GridPlan,
              max_bytes: Optional[int] = None) -> str:
    """Persist a plan atomically; optionally evict LRU entries to budget.

    Fetches the plan to host memory (device -> host, GBs at dense scales —
    call from a background thread, not the query path).
    """
    os.makedirs(cache_dir, exist_ok=True)
    # all groups share one padded block count, so the per-group arrays
    # stack into dense tensors
    fields = np.stack([np.asarray(f) for f in plan.fields])
    windows = np.stack([np.asarray(w) for w in plan.windows])
    tps = (np.stack([np.asarray(t) for t in plan.tps])
           if plan.tps else np.zeros((0,), np.float32))
    aux = np.array(
        [plan.n_pairs, int(plan.compact), int(plan.tp_is_pid),
         plan.height, plan.width, int(plan.wrap),
         plan.window, plan.block, int(plan.quant)],
        np.int64,
    )
    path = _path(cache_dir, key)
    fd, tmp = tempfile.mkstemp(dir=cache_dir, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, fields=fields, windows=windows, tps=tps, aux=aux)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise
    if max_bytes is not None:
        evict_lru(cache_dir, max_bytes)
    return path


def load_plan(cache_dir: str, key: str) -> Optional[GridPlan]:
    """Load a cached plan onto the default device; None on miss/corruption."""
    import jax.numpy as jnp

    path = _path(cache_dir, key)
    if not os.path.exists(path):
        return None
    import zipfile

    try:
        with np.load(path) as z:
            fields = z["fields"]
            windows = z["windows"]
            tps = z["tps"]
            aux = z["aux"]
    except (zipfile.BadZipFile, KeyError, ValueError, EOFError):
        # half-written or foreign file: treat as a miss AND delete (the
        # atomic rename makes this unlikely, but a corrupt cache must
        # never crash queries)
        try:
            os.unlink(path)
        except OSError:
            pass
        return None
    except Exception:
        # transient failure (host memory pressure, interrupted read):
        # miss WITHOUT deleting — the multi-GB entry is likely fine and
        # unlinking it would force every future process to rebuild
        return None
    try:
        os.utime(path)  # LRU touch
    except OSError:
        pass  # concurrently evicted: the data is already in memory
    (n_pairs, compact, tp_is_pid, height, width, wrap, window, block,
     quant) = (int(v) for v in aux)
    return GridPlan(
        fields=[jnp.asarray(f) for f in fields],
        windows=[jnp.asarray(w) for w in windows],
        tps=[jnp.asarray(t) for t in tps] if tps.size else (),
        n_pairs=n_pairs, compact=bool(compact), tp_is_pid=bool(tp_is_pid),
        height=height, width=width, wrap=bool(wrap),
        window=window, block=block, quant=bool(quant),
    )


def evict_lru(cache_dir: str, max_bytes: int) -> int:
    """Delete oldest-touched plans until the directory fits the budget.

    Also sweeps .tmp orphans older than an hour — a process killed mid
    np.savez (SIGKILL/OOM) leaves multi-GB temporaries that the '.npz'
    budget would otherwise never see.  Returns the entries removed.
    """
    import time as _time

    try:
        names = os.listdir(cache_dir)
    except OSError:
        return 0
    for n in names:
        if n.endswith(".tmp"):
            p = os.path.join(cache_dir, n)
            try:
                if _time.time() - os.path.getmtime(p) > 3600:
                    os.unlink(p)
            except OSError:
                pass
    entries = []
    for n in names:
        if not n.endswith(".npz"):
            continue
        p = os.path.join(cache_dir, n)
        try:
            entries.append((os.path.getmtime(p), os.path.getsize(p), p))
        except OSError:
            # raced with another process's eviction/replace of THIS file;
            # skip it rather than aborting the whole pass (a shared cache
            # dir is supported — one lost stat must not leave the
            # directory over budget)
            continue
    total = sum(s for _, s, _ in entries)
    removed = 0
    for _, size, path in sorted(entries):
        if total <= max_bytes:
            break
        try:
            os.unlink(path)
            total -= size
            removed += 1
        except OSError:
            pass
    return removed

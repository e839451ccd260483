"""Persistent localization service: the production serving surface.

The reference is a batch evaluation script (``main.py`` — one process per
dataset sweep, reference ``localize.py:76,300``); production deployments
instead keep a chip warm and answer single localization queries.  This
module holds a room's device state resident — padded cloud, candidate
grids, sorted-slab plan, jitted programs — so after the first (compiling)
query each call runs at steady-state latency (~0.30 s at the Stanford
budget on one TPU v5e chip), and layers a minimal stdlib HTTP JSON API on
top for cross-process serving.

No reference counterpart (additive — SURVEY §5 lists no serving
subsystem).  All reference config keys are honored; the compute path is
exactly the harness's fused pipeline (`harness.localize._run_fused`), so
served poses match the batch CLI bit-for-bit.

Usage (library)::

    svc = LocalizeService(num_trans=50, num_yaw=8, yaw_only=True)
    svc.load_room(xyz, rgb)                  # or svc.load_room_pcd(path)
    out = svc.localize(image)                # (H, W, 3) RGB uint8/float
    out["t"], out["rot"], out["loss"], out["time_s"]

Usage (HTTP)::

    python -m piccolo_tpu.serve --config configs/stanford.ini \
        --pcd /data/room.txt --port 8321
    curl -X POST localhost:8321/localize -d '{"image_path": "pano.png"}'
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import threading
import time
from typing import Dict, Optional

import numpy as np

from collections import OrderedDict, deque

from .config import cfg_get, make_config, parse_ini
from .harness.localize import (
    _drop_slab_plans,
    _FusedGrids,
    _maybe_mesh,
    _order_bounds,
    _pad_cloud,
    _run_fused,
    _use_fused,
    get_init_dict,
    prepare_omniscenes_images,
    prepare_stanford_images,
)

__all__ = ["LocalizeService", "ServiceOverloaded", "serve_forever", "main"]


class ServiceOverloaded(RuntimeError):
    """Raised when admission would exceed ``max_pending`` in-flight requests.

    The HTTP layer maps this to 503 (with Retry-After) so load balancers
    get an explicit backpressure signal instead of growing latency.
    """


_CFG_DEFAULTS = dict(
    dataset="Stanford2D-3D-S",
    sample_rate=1,
    out_of_room_quantile=0.05,
)


class LocalizeService:
    """One room resident on device; ``localize()`` per query panorama.

    Construct with a config namedtuple (``parse_ini`` output) or keyword
    config values; every key the batch harness honors works here
    (init budget, descent_table, slab_init, n_devices, ...).
    """

    def __init__(self, cfg=None, max_rooms: int = 1, max_pending: int = 8,
                 **cfg_kwargs):
        if cfg is None:
            cfg = make_config(**{**_CFG_DEFAULTS, **cfg_kwargs})
        elif cfg_kwargs:
            raise ValueError("pass cfg or keyword config values, not both")
        self.cfg = cfg
        self.init_dict = get_init_dict(cfg)
        if not _use_fused(cfg, self.init_dict):
            # loud instead of silently diverging from the CLI: the staged
            # path's extras (init-only subsample, unknown criterion values)
            # have no serving counterpart
            raise ValueError(
                "serving runs the fused pipeline only; drop "
                "sample_rate_for_init / unknown criterion (or fused="
                "False) from the config"
            )
        if cfg_get(cfg, "visualize", False):
            # the fused pipeline CAN return trajectories (round 3), but
            # serving has no per-iteration artifact surface — reject
            # loudly rather than silently ignoring the key
            raise ValueError(
                "serving returns no per-iteration artifacts; drop "
                "visualize=True from the config"
            )
        self.mesh = _maybe_mesh(cfg)
        # query_devices = N|'all': round-robin whole queries over N chips,
        # each with its own room replica and compute lock — N requests
        # compute CONCURRENTLY (queries are independent; no collectives).
        # Mutually exclusive with n_devices, which shards ONE query over a
        # mesh for latency; query_devices scales THROUGHPUT.
        self._devices = self._resolve_query_devices(cfg)
        # per-device compute locks (chip-serial per chip); the room
        # registry must stay consistent for health checks / loads WITHOUT
        # waiting out a ~0.4 s in-flight query
        self._compute_locks = [threading.Lock() for _ in self._devices]
        # back-compat alias (device 0) — tests and older callers poke it
        self._compute_lock = self._compute_locks[0]
        self._rr_lock = threading.Lock()
        self._rr = 0
        self._rooms_lock = threading.Lock()
        # LRU of resident rooms; slab plans are GBs of HBM, so eviction
        # drops them promptly (harness._drop_slab_plans).  A room evicted
        # mid-query stays alive through the query's own references.
        self._rooms: "OrderedDict[str, Dict]" = OrderedDict()
        self._max_rooms = max(1, int(max_rooms))
        # admission control: requests run their HOST prep concurrently
        # (each on its own handler thread) while exactly one request holds
        # the chip — so request k+1's prep overlaps request k's compute by
        # design (the serving analog of the batch loop's Prefetcher).
        # ``max_pending`` bounds admitted-but-unfinished requests; beyond
        # it localize() raises ServiceOverloaded (HTTP 503) instead of
        # stacking unbounded prep memory + lock-wait latency.
        self._max_pending = max(1, int(max_pending))
        self._pending = 0
        self._pending_lock = threading.Lock()
        # room='auto' batched-probe state per device (probe.py, round 5) —
        # rebuilt lazily whenever the resident set changes
        self._batched_probes: Dict[int, object] = {}
        # multi-stream tracking (round 5): tracked requests that pile up
        # behind a chip's compute lock are drained as ONE vmapped program
        # by whichever request next acquires the lock (opportunistic
        # micro-batch — no added latency when traffic is serial)
        self._track_queues = [deque() for _ in self._devices]
        self._track_qlocks = [threading.Lock() for _ in self._devices]

    @staticmethod
    def _resolve_query_devices(cfg):
        """[device|None, ...] — one entry per query-parallel chip.

        The single-entry ``[None]`` default keeps today's default-device
        placement (no device_put anywhere on that path).
        """
        qd = cfg_get(cfg, "query_devices")
        if qd in (None, 0, 1):
            return [None]
        if cfg_get(cfg, "n_devices") not in (None, 0, 1):
            raise ValueError(
                "query_devices (round-robin queries over chips) and "
                "n_devices (shard each query over a mesh) are mutually "
                "exclusive"
            )
        import jax

        devices = jax.devices()
        n = len(devices) if qd == "all" else int(qd)
        if not 2 <= n <= len(devices):
            raise ValueError(
                f"query_devices={qd} but {len(devices)} devices are visible"
            )
        return list(devices[:n])

    # -- health ------------------------------------------------------------

    @property
    def busy(self) -> bool:
        """True while a request holds a chip (device compute in flight)."""
        return any(l.locked() for l in self._compute_locks)

    @property
    def devices(self) -> int:
        """Query-parallel device count (1 = single default device)."""
        return len(self._devices)

    @property
    def busy_devices(self) -> int:
        """How many of the query-parallel chips are computing right now."""
        return sum(l.locked() for l in self._compute_locks)

    @property
    def pending(self) -> int:
        """Admitted, unfinished requests (prepping, waiting, or computing)."""
        with self._pending_lock:
            return self._pending

    @property
    def max_pending(self) -> int:
        return self._max_pending

    # -- room management ---------------------------------------------------

    def load_room(self, xyz: np.ndarray, rgb: np.ndarray,
                  name: str = "<arrays>",
                  warm_shape: Optional[tuple] = None) -> None:
        """Stage a colored cloud ((N, 3) xyz metres, (N, 3) rgb in [0, 1]).

        ``warm_shape=(H, W)``: immediately run one throwaway query at that
        panorama shape so the slab plan builds and every program compiles
        at LOAD time — the first real query then runs at steady-state
        latency instead of paying seconds (plan) to minutes (cold jit).
        """
        if name == "auto":
            # "auto" is the localize() room-selection sentinel — a room so
            # named could never be addressed explicitly again
            raise ValueError(
                'room name "auto" is reserved for localize(room="auto") '
                "auto-selection — pick another name"
            )
        import jax

        xyz = np.asarray(xyz, np.float32)
        rgb = np.asarray(rgb, np.float32)
        xyz_d, rgb_d, mask_d = _pad_cloud(xyz, rgb)
        lo, hi = _order_bounds(
            xyz, cfg_get(self.cfg, "out_of_room_quantile", 0.05)
        )
        grids = _FusedGrids(xyz, self.init_dict)
        caches = []
        for dev in self._devices:  # one room replica per query chip
            if dev is None:
                caches.append(dict(
                    xyz_np=xyz, rgb_np=rgb, xyz=xyz_d, rgb=rgb_d,
                    mask=mask_d, lo=lo, hi=hi, grids=grids,
                ))
            else:
                caches.append(dict(
                    xyz_np=xyz, rgb_np=rgb,
                    xyz=jax.device_put(xyz_d, dev),
                    rgb=jax.device_put(rgb_d, dev),
                    mask=jax.device_put(mask_d, dev),
                    lo=lo, hi=hi, grids=grids.to_device(dev), device=dev,
                ))
        with self._rooms_lock:
            self._rooms.pop(name, None)
            self._rooms[name] = caches
            while len(self._rooms) > self._max_rooms:
                _, evicted = self._rooms.popitem(last=False)
                for c in evicted:
                    _drop_slab_plans(c)
        if warm_shape is not None:
            H, W = warm_shape
            noise = np.random.default_rng(0).integers(
                0, 256, (int(H), int(W), 3), dtype=np.uint8
            )
            for di in range(len(self._devices)):  # every chip compiles
                self._localize_checked(noise, room=name, device_index=di)
                probe_cfg = cfg_get(self.cfg, "room_auto_probe", False)
                if self._max_rooms > 1 and probe_cfg:
                    # room='auto' probes are a distinct program variant
                    # (init-res descent, truncated budget) — compile it at
                    # load time too, so the first auto request is steady
                    cache = self._rooms[name][di]
                    if (probe_cfg == "batched"
                            and self._batched_probe_usable(
                                len(self._rooms))):
                        st = self._probe_state_batched(di)
                        prep = self._prepare(noise, cache)
                        st.losses(prep[0], **self._probe_kwargs())
                    else:
                        self._probe_room(
                            self._prepare(noise, cache), cache, di
                        )

    def load_room_pcd(self, path: str, dataset: Optional[str] = None) -> None:
        """Load a room from an ``x y z r g b`` text cloud (either dataset's
        format — reference data_utils.py:16,138)."""
        from . import data as data_mod

        ds = dataset or cfg_get(self.cfg, "dataset", "Stanford2D-3D-S")
        reader = (
            data_mod.read_omniscenes if "mni" in ds else data_mod.read_stanford
        )
        xyz, rgb = reader(path, cfg_get(self.cfg, "sample_rate", 1))
        self.load_room(xyz.astype(np.float32), rgb.astype(np.float32), path)

    @property
    def room(self) -> Optional[str]:
        """Most recently used room name (None before any load)."""
        with self._rooms_lock:
            return next(reversed(self._rooms)) if self._rooms else None

    @property
    def rooms(self):
        """Resident room names, least- to most-recently used."""
        with self._rooms_lock:
            return list(self._rooms)

    # -- query -------------------------------------------------------------

    def localize(self, image: np.ndarray, room: Optional[str] = None,
                 prev_pose=None, recover_above: Optional[float] = None) -> Dict:
        """Localize one panorama against a loaded room.

        ``image``: (H, W, 3) RGB, uint8 or float in [0, 1] (floats are
        requantized to uint8 — the CLI's decode path — so served results
        match the batch harness exactly).  ``room`` selects among resident
        rooms (default: most recently used); ``room="auto"`` picks the
        room whose localization loss is lowest, returning per-room
        ``room_scores`` alongside the result (no reference counterpart —
        the reference assumes the query's room is known; see
        ``_select_room`` for the two-phase probe design and why a
        DESCENDED loss, not a stage-1 score, is the discriminator).
        Cost: one full query per resident room by default; the opt-in
        two-phase probe (``room_auto_probe = True``) pays one truncated
        probe per room plus the full query on the probe-ranked finalists
        — in ``room_scores``, rooms the probe ruled out report their
        probe loss, finalists their full winner loss.  Preprocessing is
        the
        harness's own per-query prep (harness.localize.prepare_*_images):
        resize/downsample semantics, color match/sharpen, synth ablations.
        Returns a dict with the winner pose (``t`` (3,), ``rot`` (3, 3)),
        its ``loss``, all candidate losses, ``time_s`` (the reference's
        CSV-parity timed window: main resize + solve), ``total_s``
        (full in-service latency incl. all preprocessing and the result
        fetch) and ``device_index`` (which query-parallel chip answered;
        0 on the single-device default).

        ``prev_pose`` switches the request to the TRACKING path (video
        extension, no reference counterpart — tracking.py): a warm-started
        single-candidate descent from that pose replaces the full
        init+multi-start pipeline (~10-40x cheaper per frame).  Accepts
        ``{"t": [x, y, z], "ypr": [yaw, pitch, roll]}`` (the fields a
        previous reply provides).  Stateless by design: the CLIENT carries
        the pose between frames.  ``recover_above``: when given and the
        tracked loss exceeds it (tracking lost), the SAME request falls
        back to the full pipeline and the reply sets ``recovered`` —
        pick it from a tracked sequence's typical loss (e.g. 3x the
        running median).  ``room="auto"`` needs the full pipeline and
        rejects ``prev_pose``.
        """
        return self._localize_checked(image, room, prev_pose=prev_pose,
                                      recover_above=recover_above)

    def _localize_checked(self, image: np.ndarray, room: Optional[str],
                          device_index: Optional[int] = None,
                          prev_pose=None,
                          recover_above: Optional[float] = None) -> Dict:
        if not self._rooms:
            raise RuntimeError("no room loaded — call load_room[_pcd] first")
        img = np.asarray(image)
        if img.ndim != 3 or img.shape[2] != 3:
            raise ValueError(f"expected (H, W, 3) RGB image, got {img.shape}")
        if img.dtype != np.uint8:
            img = np.clip(np.round(np.asarray(img, np.float32) * 255.0),
                          0, 255).astype(np.uint8)

        with self._pending_lock:
            if self._pending >= self._max_pending:
                raise ServiceOverloaded(
                    f"{self._pending} requests already in flight "
                    f"(max_pending={self._max_pending}); retry later"
                )
            self._pending += 1
        try:
            return self._localize_admitted(img, room, device_index,
                                           prev_pose=prev_pose,
                                           recover_above=recover_above)
        finally:
            with self._pending_lock:
                self._pending -= 1

    def _prepare(self, img: np.ndarray, cache: Dict):
        """The harness's own per-query prep for this service's dataset."""
        if "mni" in cfg_get(self.cfg, "dataset", "Stanford2D-3D-S"):
            _, img_init, img_main, rgb_used, prep_timed = (
                prepare_omniscenes_images(self.cfg, img, cache)
            )
        else:
            img_init, img_main, rgb_used, prep_timed = (
                prepare_stanford_images(self.cfg, img, cache)
            )
        return img_init, img_main, rgb_used, prep_timed

    _PLAN_KEY_HEADS = ("slab_plan", "slab_plan_sharded",
                       "hist_plan", "hist_plan_sharded")

    def _resident_plan_bytes(self, exclude_cache, device_index: int) -> int:
        """HBM already held by OTHER resident rooms' plans on this chip."""
        with self._rooms_lock:
            rooms = list(self._rooms.values())
        total = 0
        for caches in rooms:
            if device_index >= len(caches):
                continue
            c = caches[device_index]
            if c is exclude_cache:
                continue
            for k, v in list(c.items()):
                if (isinstance(k, tuple) and k
                        and k[0] in self._PLAN_KEY_HEADS):
                    total += int(getattr(v, "nbytes", 0) or 0)
        return total

    def _budget_cfg(self, cache, device_index: int):
        """Per-call cfg whose plan caps subtract the HBM other resident
        rooms' plans already hold on this chip.

        Plan admission (`harness.localize._slab_admission` /
        `_maybe_hist_plan`) budgets each room against a PER-PLAN cap; with
        ``max_rooms > 1`` the sum of admitted plans can exceed HBM — at
        dense scale (each compact plan ~7 GB) four resident rooms OOM the
        chip outright, and not just the plan build: a later ``device_put``
        of a query image fails (measured, round 4).  Serving owns the
        resident set, so it reduces the cap per room to what is actually
        left; admission then demotes later rooms to partial plans / the
        XLA stage 1 on its existing ladder instead of exhausting HBM.
        """
        if self._max_rooms <= 1:
            return self.cfg
        other = self._resident_plan_bytes(cache, device_index)
        if not other:
            return self.cfg
        from .kernels.slab_sampling import default_plan_bytes_cap

        base = cfg_get(self.cfg, "slab_bytes_cap")
        if base is None:
            base = default_plan_bytes_cap()
        hist_base = cfg_get(self.cfg, "hist_planes_bytes_cap")
        overrides = dict(
            self.cfg._asdict(),
            slab_bytes_cap=max(0, int(base) - other),
            hist_planes_bytes_cap=max(
                0, int(hist_base if hist_base is not None else base) - other
            ),
        )
        return make_config(**overrides)

    def _compute_room(self, prep, cache, device_index: int) -> Dict:
        """One full fused query against a room: device compute + the single
        packed result fetch, under the device's compute lock."""
        img_init, img_main, rgb_used, prep_timed = prep
        with self._compute_locks[device_index]:
            t0 = time.time()
            # sync_plans: serving builds plans synchronously (the warm
            # path exists precisely to take this hit at load time; a
            # background build would leave warmed rooms half-compiled)
            res = _run_fused(
                img_init, img_main, cache, rgb_used,
                self._budget_cfg(cache, device_index),
                self.init_dict, cache["grids"], self.mesh, sync_plans=True,
            )
            # ONE device fetch: each array fetched separately costs a full
            # round trip on remote-frontend deployments (axon; measured
            # ~75 ms for five arrays vs ~25 ms for one), so the scalar-ish
            # results are packed into a single device vector first
            import jax.numpy as jnp

            packed = np.asarray(jnp.concatenate([
                res.t,
                res.rot.reshape(-1),
                res.loss.reshape(1),
                res.winner.reshape(1).astype(jnp.float32),
                res.cand_loss,
            ]))
            elapsed = time.time() - t0 + prep_timed
        return dict(
            t=packed[:3], rot=packed[3:12].reshape(3, 3),
            loss=float(packed[12]), winner=int(packed[13]),
            cand_loss=packed[14:], time_s=elapsed,
        )

    @staticmethod
    def _parse_prev_pose(prev_pose):
        if isinstance(prev_pose, dict):
            t, ypr = prev_pose.get("t"), prev_pose.get("ypr")
        else:
            t, ypr = prev_pose  # (t, ypr) pair
        t = np.asarray(t, np.float32).reshape(3)
        ypr = np.asarray(ypr, np.float32).reshape(3)
        if not (np.isfinite(t).all() and np.isfinite(ypr).all()):
            raise ValueError(f"non-finite prev_pose: t={t} ypr={ypr}")
        return t, ypr

    def _track_room(self, prep, cache, device_index: int, prev_pose) -> Dict:
        """Warm-started single-candidate descent (tracking.track_step)
        instead of the full pipeline; same lock/fetch discipline as
        _compute_room."""
        import jax.numpy as jnp

        from .tracking import track_kwargs, track_step_fetched

        _, img_main, rgb_used, prep_timed = prep
        t_prev, ypr_prev = self._parse_prev_pose(prev_pose)
        with self._compute_locks[device_index]:
            t0 = time.time()
            t, ypr, rot, loss = track_step_fetched(
                jnp.asarray(img_main), cache["xyz"], rgb_used,
                t_prev, ypr_prev,
                jnp.asarray(cache["lo"]), jnp.asarray(cache["hi"]),
                cache["mask"],
                exec_cache_dir=cfg_get(self.cfg, "exec_cache_dir", None),
                **track_kwargs(self.cfg),
            )
            elapsed = time.time() - t0 + prep_timed
        return dict(
            t=t, rot=rot, loss=loss, winner=0,
            cand_loss=np.asarray([loss], np.float32),
            ypr=ypr, time_s=elapsed, tracked=True,
        )

    def _track_room_maybe_batched(self, prep, cache, device_index: int,
                                  prev_pose) -> Dict:
        """Multi-stream tracking (round 5): tracked requests that are
        waiting on the same chip for the same room are drained as ONE
        vmapped program (tracking.track_steps_batched) by whichever
        request next acquires the compute lock.

        Opportunistic micro-batching: a batch forms ONLY from requests
        already queued — serial traffic runs the single-stream path with
        zero added latency.  Batches are padded up to a size bucket
        ({2, 4, 8, ...} up to ``track_max_batch``) so concurrent load
        compiles a handful of program shapes, not one per K.
        ``track_batch = True`` opts in; sharpen_color configs fall back
        per-request automatically (each frame rebinds the CLOUD colors,
        so streams no longer share the room state the vmap closes over).

        OFF BY DEFAULT after real-chip measurement (round 5,
        ``measure_serving --mode track-streams``, 6 streams x 12 frames,
        Stanford scale): batching measured a uniform PESSIMIZATION —
        wall 9.6 -> 17.0 s, p50 latency 0.80 -> 1.17 s, and even the
        K=1 vmapped call runs 0.25 vs 0.17 s single-stream.  Tracked
        gathers are row-count-bound (docs/PERFORMANCE.md), so a K-batch
        costs ~K x one stream's device time — the only amortized cost is
        the ~25 ms fetch, and the vmapped gather itself runs at a WORSE
        rate (the round-2 "vmap query batching is slower" negative, now
        confirmed on the tracked step).  Kept opt-in for fetch-dominated
        deployments (tiny rooms / very high round-trip frontends).
        """
        _, img_main, rgb_used, prep_timed = prep
        if (not cfg_get(self.cfg, "track_batch", False)
                or rgb_used is not cache["rgb"]):
            return self._track_room(prep, cache, device_index, prev_pose)
        t_prev, ypr_prev = self._parse_prev_pose(prev_pose)
        entry = dict(
            img=img_main, t=t_prev, ypr=ypr_prev, prep_timed=prep_timed,
            key=(id(cache), tuple(np.shape(img_main))),
            event=threading.Event(), out=None,
        )
        qlock = self._track_qlocks[device_index]
        queue = self._track_queues[device_index]
        with qlock:
            queue.append(entry)
        with self._compute_locks[device_index]:
            if not entry["event"].is_set():
                with qlock:
                    # drain by IDENTITY — entries hold numpy arrays, so
                    # deque.remove's == would be ambiguous on them
                    max_batch = max(
                        1, int(cfg_get(self.cfg, "track_max_batch", 8))
                    )
                    batch, keep = [entry], []
                    for e in queue:
                        if e is entry:
                            continue
                        if (e["key"] == entry["key"]
                                and len(batch) < max_batch):
                            batch.append(e)
                        else:
                            keep.append(e)
                    queue.clear()
                    queue.extend(keep)
                self._run_track_batch(batch, cache, device_index)
        out = entry["out"]
        if isinstance(out, BaseException):
            raise out
        return out

    def _run_track_batch(self, batch, cache, device_index: int) -> None:
        """Execute one drained tracked-request batch (compute lock held)."""
        import jax
        import jax.numpy as jnp

        from .tracking import track_kwargs, track_steps_batched

        try:
            t0 = time.time()
            kw = dict(
                exec_cache_dir=cfg_get(self.cfg, "exec_cache_dir", None),
                **track_kwargs(self.cfg),
            )
            if len(batch) == 1:
                from .tracking import track_step_fetched

                e = batch[0]
                results = [track_step_fetched(
                    jnp.asarray(e["img"]), cache["xyz"], cache["rgb"],
                    e["t"], e["ypr"],
                    jnp.asarray(cache["lo"]), jnp.asarray(cache["hi"]),
                    cache["mask"], **kw,
                )]
            else:
                # pad K up to a power-of-two bucket (repeat the last
                # stream; padded rows are computed and discarded) so
                # variable concurrency reuses a handful of compiled shapes
                bucket = 2
                while bucket < len(batch):
                    bucket *= 2
                imgs = np.stack(
                    [np.asarray(e["img"]) for e in batch]
                    + [np.asarray(batch[-1]["img"])] * (bucket - len(batch))
                )
                ts = np.stack(
                    [e["t"] for e in batch]
                    + [batch[-1]["t"]] * (bucket - len(batch))
                )
                yprs = np.stack(
                    [e["ypr"] for e in batch]
                    + [batch[-1]["ypr"]] * (bucket - len(batch))
                )
                dev = cache.get("device")
                imgs = (jax.device_put(imgs, dev) if dev is not None
                        else jnp.asarray(imgs))
                results = track_steps_batched(
                    imgs, cache["xyz"], cache["rgb"], ts, yprs,
                    jnp.asarray(cache["lo"]), jnp.asarray(cache["hi"]),
                    cache["mask"], **kw,
                )[: len(batch)]
            elapsed = time.time() - t0
            extra = {"batched": len(batch)} if len(batch) > 1 else {}
            for e, (t, ypr, rot, loss) in zip(batch, results):
                e["out"] = dict(
                    t=t, rot=rot, loss=loss, winner=0,
                    cand_loss=np.asarray([loss], np.float32),
                    ypr=ypr, time_s=elapsed + e["prep_timed"],
                    tracked=True, **extra,
                )
        except BaseException as exc:
            for e in batch:
                e["out"] = exc
            raise
        finally:
            for e in batch:
                e["event"].set()

    def _probe_room(self, prep, cache, device_index: int) -> float:
        """Truncated ranking query for room='auto' (design 2, round 4):
        full stage 1+2 (the room's resident plans compose unchanged) then a
        short pruned descent at init resolution — see harness._run_fused
        ``probe=True``.  Returns the probe winner loss only."""
        img_init, img_main, rgb_used, _ = prep
        with self._compute_locks[device_index]:
            res = _run_fused(
                img_init, img_main, cache, rgb_used,
                self._budget_cfg(cache, device_index),
                self.init_dict, cache["grids"], self.mesh, sync_plans=True,
                probe=True,
            )
            return float(np.asarray(res.loss))

    def _probe_state_batched(self, device_index: int):
        """The batched-probe arrays for the current resident set (cached;
        rebuilt when the set changes — pure host padding/stacking)."""
        from .probe import build_probe_state

        with self._rooms_lock:
            rooms = [(n, r[device_index]) for n, r in self._rooms.items()]
        key = tuple(n for n, _ in rooms)
        st = self._batched_probes.get(device_index)
        if st is None or st.names != key:
            # the rotation grid is config-derived, identical across rooms
            rot = np.asarray(rooms[0][1]["grids"].rot)
            st = build_probe_state(
                rooms, rot,
                max_pairs=int(
                    cfg_get(self.cfg, "room_auto_probe_pairs", 512)
                ),
                device=self._devices[device_index],
            )
            self._batched_probes[device_index] = st
        return st

    def _probe_kwargs(self) -> Dict:
        return dict(
            num_starts=int(cfg_get(self.cfg, "room_auto_probe_starts", 6)),
            num_iter=int(cfg_get(self.cfg, "room_auto_probe_iters", 30)),
            lr=cfg_get(self.cfg, "lr", 0.1),
            patience=cfg_get(self.cfg, "patience", 5),
            factor=cfg_get(self.cfg, "factor", 0.8),
            wrap=bool(cfg_get(self.cfg, "seam_wrap", False)),
        )

    def _batched_probe_usable(self, n_rooms: int) -> bool:
        """'batched' probes share ONE prepared init image across rooms, so
        per-room color prep (match/sharpen rebinds against each room's
        cloud) disqualifies it — fall back to the per-room probe with a
        one-time warning."""
        if n_rooms < 2:
            return False
        if (cfg_get(self.cfg, "match_color", False)
                or cfg_get(self.cfg, "sharpen_color", False)):
            if not getattr(self, "_warned_batched_color", False):
                self._warned_batched_color = True
                import warnings

                warnings.warn(
                    "room_auto_probe='batched' needs a room-independent "
                    "init image; match_color/sharpen_color rebind colors "
                    "per room — falling back to the per-room probe"
                )
            return False
        return True

    def _select_room(self, img: np.ndarray, device_index: int):
        """room='auto': pick the resident room whose localization loss is
        lowest.

        Default: one FULL query per resident room, lowest finite winner
        loss answers.  A descended loss is the discriminator because the
        cheaper alternative measurably is not: on two same-generator
        synthetic offices the stage-1 grid MINIMUM barely separates rooms
        (0.3178 vs 0.3138 — wrong pick, 607 mm error) while descended
        winner losses separate decisively (the wrong room cannot descend
        to a good color match).

        Opt-in two-phase mode (``room_auto_probe = True``, round 4): a
        truncated PROBE per room — full stage 1+2 then a short pruned
        descent at init resolution (``room_auto_probe_iters``, default
        30) — ranks the rooms; only rooms whose probe loss is within
        ``room_auto_margin`` (default 3x) of the best run the FULL query
        (fallback to the full loop whenever no probe loss is finite).
        Ranking accuracy holds (round-4 12-query/4-room TPU eval: 12/12
        both modes) but the probe is NOT the default because at the
        eval's Stanford-like scale it measured SLOWER than the full loop
        (4.03 s vs 2.02 s median per auto request — the untruncated
        stage 1+2 makes a probe cost ~a full query there, and the 3x
        margin admits several finalists; docs/ROUND4.md §4).
        """
        with self._rooms_lock:
            candidates = [
                (name, replicas[device_index])
                for name, replicas in self._rooms.items()
            ]
        scores: Dict[str, float] = {}
        preps: Dict[str, tuple] = {}
        # one-ahead prep: room k+1's host prep (possibly hundreds of ms)
        # runs on a thread while room k holds the chip — the auto loop
        # keeps the module's prep/compute overlap design
        next_prep = [self._prepare(img, candidates[0][1])]

        def _prep_into(cache):
            next_prep[0] = self._prepare(img, cache)

        probe_cfg = cfg_get(self.cfg, "room_auto_probe", False)
        probe = bool(probe_cfg) and len(candidates) > 1
        batched = (
            probe and probe_cfg == "batched"
            and self._batched_probe_usable(len(candidates))
        )
        order, cut = candidates, None
        if batched:
            # design 3 (round 5, probe.py): ONE padded vmap program scores
            # every resident room — one dispatch, one (R,) fetch — on a
            # TRUNCATED per-room pair budget.  The prep is room-independent
            # here (no color rebinds, _batched_probe_usable), so the
            # finalists reuse it too.
            st = self._probe_state_batched(device_index)
            prep0 = next_prep[0]
            with self._compute_locks[device_index]:
                losses = st.losses(prep0[0], **self._probe_kwargs())
            # the images are room-independent here, but rgb_used must be
            # EACH room's own cloud colors (identity with cache["rgb"]
            # gates the room's baked plans in _run_fused)
            for name, cache in candidates:
                preps[name] = (prep0[0], prep0[1], cache["rgb"], prep0[3])
            scores.update(zip(st.names, (float(v) for v in losses)))
            for name, _ in candidates:
                # a load/evict racing between the candidate snapshot and
                # the probe-state rebuild could leave a candidate unscored
                # — treat it as a non-finalist instead of KeyError-ing
                scores.setdefault(name, float("inf"))
        elif probe:
            for i, (name, cache) in enumerate(candidates):
                prep = preps[name] = next_prep[0]
                th = None
                if i + 1 < len(candidates):
                    th = threading.Thread(
                        target=_prep_into, args=(candidates[i + 1][1],)
                    )
                    th.start()
                scores[name] = self._probe_room(prep, cache, device_index)
                if th is not None:
                    th.join()
        if probe:
            finite = [s for s in scores.values() if np.isfinite(s)]
            if finite:
                margin = float(cfg_get(self.cfg, "room_auto_margin", 3.0))
                cut = min(finite) * margin
                # finalists by probe rank; non-finalists follow as the
                # non-finite-loss fallback chain (a finalist whose FULL
                # query degenerates must not block a probed-out room)
                order = sorted(
                    candidates,
                    key=lambda nc: (
                        not (np.isfinite(scores[nc[0]])
                             and scores[nc[0]] <= cut),
                        scores[nc[0]],
                    ),
                )
            # else: no finite probe anywhere — run the full loop below
            # over every room, preserving the round-3 error semantics

        best = None
        for i, (name, cache) in enumerate(order):
            if (cut is not None and best is not None
                    and np.isfinite(best[1]["loss"])
                    and not (np.isfinite(scores.get(name, np.inf))
                             and scores[name] <= cut)):
                break  # finalists exhausted with a finite answer
            prep = preps.get(name)
            if prep is None:
                # probe-off path: keep the one-ahead prep/compute overlap
                prep = preps[name] = next_prep[0]
                th = None
                if i + 1 < len(order):
                    th = threading.Thread(
                        target=_prep_into, args=(order[i + 1][1],)
                    )
                    th.start()
            else:
                th = None
            fields = self._compute_room(prep, cache, device_index)
            if th is not None:
                th.join()
            scores[name] = fields["loss"]
            # non-finite losses (all-masked/black renders) never win NOR
            # block a later finite room from winning
            if best is None or (
                np.isfinite(fields["loss"])
                and not (np.isfinite(best[1]["loss"])
                         and best[1]["loss"] <= fields["loss"])
            ):
                best = (name, fields)
        if not np.isfinite(best[1]["loss"]):
            raise ValueError(
                "room='auto' found no finite localization loss in any "
                "resident room (all-black/empty query image?)"
            )
        with self._rooms_lock:
            if best[0] in self._rooms:
                self._rooms.move_to_end(best[0])
        return best[0], best[1], scores

    def _localize_admitted(self, img: np.ndarray, room: Optional[str],
                           device_index: Optional[int] = None,
                           prev_pose=None,
                           recover_above: Optional[float] = None) -> Dict:
        t_start = time.time()
        if device_index is None:
            # round-robin chip assignment (load_room's warm path pins it
            # instead so every chip compiles)
            with self._rr_lock:
                device_index = self._rr % len(self._devices)
                self._rr += 1
        room_scores = None
        if room == "auto":
            if prev_pose is not None:
                raise ValueError(
                    'room="auto" runs the full pipeline per room and '
                    "cannot take prev_pose — name the room when tracking"
                )
            room, fields, room_scores = self._select_room(img, device_index)
        else:
            # room resolution under the registry lock; the (host-side,
            # possibly hundreds-of-ms) image prep runs outside the compute
            # locks so it can overlap other requests' device compute
            with self._rooms_lock:
                if room is None:
                    room = next(reversed(self._rooms))
                if room not in self._rooms:
                    raise KeyError(
                        f"room {room!r} not resident "
                        f"(have: {list(self._rooms)})"
                    )
                self._rooms.move_to_end(room)
                cache = self._rooms[room][device_index]
            prep = self._prepare(img, cache)
            if prev_pose is not None:
                fields = self._track_room_maybe_batched(
                    prep, cache, device_index, prev_pose
                )
                if recover_above is not None and not (
                    np.isfinite(fields["loss"])
                    and fields["loss"] <= float(recover_above)
                ):
                    # tracking lost (occlusion/teleport/blur): the SAME
                    # request falls back to the full pipeline
                    from .tracking import ypr_from_rot

                    fields = dict(
                        self._compute_room(prep, cache, device_index),
                        tracked=True, recovered=True,
                    )
                    # the client continues tracking from this pose
                    fields["ypr"] = ypr_from_rot(fields["rot"])
            else:
                fields = self._compute_room(prep, cache, device_index)
        out = dict(
            **fields, total_s=time.time() - t_start, room=room,
            device_index=device_index,
        )
        if room_scores is not None:
            out["room_scores"] = room_scores
        return out


# -- HTTP front ------------------------------------------------------------


_LOOPBACK_HOSTS = {"127.0.0.1", "localhost", "::1"}


def _resolve_payload_path(path: str, data_root: Optional[str],
                          paths_allowed: bool) -> str:
    """Validate a filesystem path arriving in a request payload.

    Trust model: on the default loopback bind every local process that can
    reach the socket already has this process's filesystem access, so
    arbitrary paths are fine.  On a non-loopback bind the HTTP surface is
    unauthenticated — path payloads become an arbitrary-file read/probe
    primitive — so they are refused unless ``--data-root`` confines them
    (realpath + prefix check, symlink-safe).
    """
    if not paths_allowed:
        raise ValueError(
            "path-based payloads are disabled on non-loopback binds; "
            "start the server with --data-root or send image_b64"
        )
    if data_root is None:
        return path
    import os

    real = os.path.realpath(path)
    root = os.path.realpath(data_root)
    if not (real == root or real.startswith(root + os.sep)):
        raise ValueError(
            f"path {path!r} resolves outside the configured data root"
        )
    return real


def _decode_image(payload: Dict, data_root: Optional[str] = None,
                  paths_allowed: bool = True) -> np.ndarray:
    from .harness.imaging import imread_rgb

    if "image_path" in payload:
        return imread_rgb(_resolve_payload_path(
            payload["image_path"], data_root, paths_allowed
        ))
    if "image_b64" in payload:
        raw = base64.b64decode(payload["image_b64"])
        try:
            import cv2

            arr = cv2.imdecode(
                np.frombuffer(raw, np.uint8), cv2.IMREAD_COLOR
            )
            if arr is None:
                raise ValueError("cv2 could not decode image bytes")
            return arr[..., ::-1].copy()  # BGR -> RGB
        except ImportError:
            from PIL import Image

            return np.asarray(Image.open(io.BytesIO(raw)).convert("RGB"))
    raise ValueError("payload needs image_path or image_b64")


def serve_forever(service: LocalizeService, host: str = "127.0.0.1",
                  port: int = 8321, ready_event=None,
                  data_root: Optional[str] = None):
    """Blocking HTTP server over ``service`` (stdlib, JSON API).

    Endpoints: ``GET /healthz``; ``POST /localize`` with
    ``{"image_path" | "image_b64": ...}``; ``POST /room`` with
    ``{"pcd_path": ...}``.  Returns the server object via ``ready_event``
    (``ready_event.server``) when passed, for tests to shut it down.

    Trust model (see :func:`_resolve_payload_path`): the default loopback
    bind accepts arbitrary ``image_path``/``pcd_path`` payloads (local
    clients already share this process's filesystem access).  A
    non-loopback bind refuses path payloads unless ``data_root`` confines
    them; ``image_b64`` always works.
    """
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    paths_allowed = host in _LOOPBACK_HOSTS or data_root is not None

    class Handler(BaseHTTPRequestHandler):
        def _reply(self, code: int, obj: Dict, headers=None) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            for k, v in (headers or {}).items():
                self.send_header(k, v)
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802 (stdlib API)
            try:
                if self.path == "/healthz":
                    # busy/pending are the backpressure signal: a load
                    # balancer can shed before requests start 503ing
                    self._reply(
                        200,
                        {"ok": True, "room": service.room,
                         "rooms": service.rooms,
                         "busy": service.busy,
                         "devices": service.devices,
                         "busy_devices": service.busy_devices,
                         "pending": service.pending,
                         "max_pending": service.max_pending},
                    )
                else:
                    self._reply(404, {"error": "unknown path"})
            except Exception as exc:  # health probes must not see tracebacks
                self._reply(500, {"error": f"{type(exc).__name__}: {exc}"})

        def do_POST(self):  # noqa: N802
            try:
                n = int(self.headers.get("Content-Length", 0))
                payload = json.loads(self.rfile.read(n) or b"{}")
                if self.path == "/localize":
                    out = service.localize(
                        _decode_image(payload, data_root, paths_allowed),
                        room=payload.get("room"),
                        prev_pose=payload.get("prev_pose"),
                        recover_above=payload.get("recover_above"),
                    )
                    reply = {
                        "t": out["t"].tolist(),
                        "rot": out["rot"].tolist(),
                        # non-finite losses (all-masked/degenerate results,
                        # reachable from client input on the tracking path)
                        # would make json.dumps emit bare NaN/Infinity —
                        # not RFC 8259 JSON; null them like room_scores
                        "loss": (out["loss"]
                                 if np.isfinite(out["loss"]) else None),
                        "winner": out["winner"],
                        "time_s": out["time_s"],
                        "room": out["room"],
                        "device_index": out["device_index"],
                    }
                    if out.get("tracked"):
                        reply["tracked"] = True
                        reply["recovered"] = bool(out.get("recovered"))
                        if "ypr" in out:
                            reply["ypr"] = np.asarray(out["ypr"]).tolist()
                        if "batched" in out:  # multi-stream micro-batch size
                            reply["batched"] = int(out["batched"])
                    if "room_scores" in out:  # room="auto" requests
                        # non-finite losses (all-masked rooms) would make
                        # json.dumps emit bare Infinity/NaN — not RFC 8259
                        # JSON; strict clients fail to parse.  null them.
                        reply["room_scores"] = {
                            k: (v if np.isfinite(v) else None)
                            for k, v in out["room_scores"].items()
                        }
                    self._reply(200, reply)
                elif self.path == "/room":
                    service.load_room_pcd(
                        _resolve_payload_path(
                            payload["pcd_path"], data_root, paths_allowed
                        ),
                        payload.get("dataset"),
                    )
                    self._reply(200, {"ok": True, "room": service.room})
                else:
                    self._reply(404, {"error": "unknown path"})
            # served errors must not kill the process — and load balancers
            # must be able to tell bad requests (4xx) from a broken server
            # (5xx).  NOTE: RuntimeError stays 5xx — XLA's OOM/runtime
            # errors subclass it, and "no room loaded" is server-side too.
            except ServiceOverloaded as exc:
                # explicit backpressure: retryable, distinct from 4xx/5xx
                self._reply(
                    503, {"error": f"ServiceOverloaded: {exc}"},
                    headers={"Retry-After": "1"},
                )
            except (ValueError, KeyError, json.JSONDecodeError,
                    FileNotFoundError) as exc:
                self._reply(400, {"error": f"{type(exc).__name__}: {exc}"})
            except Exception as exc:
                self._reply(500, {"error": f"{type(exc).__name__}: {exc}"})

        def log_message(self, *a):  # quiet
            pass

    server = ThreadingHTTPServer((host, port), Handler)
    if ready_event is not None:
        ready_event.server = server
        ready_event.set()
    server.serve_forever()


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--config", required=True, help="ini config (harness keys)")
    ap.add_argument("--pcd", action="append", default=[],
                    help="room point cloud(s) to preload (repeatable)")
    ap.add_argument("--max-rooms", type=int, default=4,
                    help="resident-room LRU size (plans are GBs of HBM)")
    ap.add_argument("--max-pending", type=int, default=8,
                    help="admission bound on in-flight requests; beyond it "
                         "requests get 503 + Retry-After (backpressure)")
    ap.add_argument("--warm", metavar="HxW",
                    help="pre-warm every preloaded room at this panorama "
                         "shape (e.g. 512x1024) so the first real query "
                         "skips plan build + cold compile (~1 min)")
    ap.add_argument("--exec-cache", metavar="DIR",
                    help="serialized-executable cache directory: process "
                         "restarts load the compiled program (~4 s) instead "
                         "of recompiling (~26 s/variant on the axon "
                         "frontend, where the persistent HLO cache never "
                         "hits — docs/ROUND4.md §3).  Shorthand for "
                         "--override exec_cache_dir=DIR")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8321)
    ap.add_argument("--data-root",
                    help="confine image_path/pcd_path payloads to this "
                         "directory (required for path payloads on a "
                         "non-loopback --host; loopback binds trust local "
                         "clients)")
    ap.add_argument("--override", type=str, default=None,
                    help="config overrides, e.g. "
                         "'query_devices=4,descent_table=float32' (the "
                         "batch CLI's grammar, main.py)")
    args = ap.parse_args(argv)

    from .config import apply_overrides
    from .utils import enable_compilation_cache

    enable_compilation_cache()
    cfg = apply_overrides(parse_ini(args.config), args.override)
    if args.exec_cache:
        cfg = apply_overrides(cfg, f"exec_cache_dir={args.exec_cache}")
    svc = LocalizeService(cfg, max_rooms=args.max_rooms,
                          max_pending=args.max_pending)
    for pcd in args.pcd:
        svc.load_room_pcd(pcd)
    if args.warm:
        H, W = (int(v) for v in args.warm.lower().split("x"))
        noise = np.random.default_rng(0).integers(
            0, 256, (H, W, 3), dtype=np.uint8
        )
        for name in svc.rooms:
            t0 = time.time()
            for di in range(svc.devices):  # every query-parallel chip
                svc._localize_checked(noise, room=name, device_index=di)
            print(f"warmed {name} at {H}x{W} in {time.time() - t0:.1f}s",
                  flush=True)
    print(f"serving on {args.host}:{args.port} (room: {svc.room})", flush=True)
    serve_forever(svc, args.host, args.port, data_root=args.data_root)


if __name__ == "__main__":
    main()

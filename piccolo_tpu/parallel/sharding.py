"""Multi-chip execution: candidate x point sharding over a device mesh.

The reference is strictly single-GPU (SURVEY §2.3: no torch.distributed, no
NCCL — its only parallelism is intra-device candidate batching).  The
TPU-native scaling story is SPMD over an ICI mesh with two orthogonal axes:

  * ``cand`` — pose candidates are embarrassingly parallel until the final
    argmin; shard the candidate batch.
  * ``point`` — the sampling loss is a mean over points; shard the cloud and
    reconstruct the global mean with one ``psum`` per loss evaluation (the
    structural cousin of sequence parallelism for this workload, SURVEY §5).

The full descent (lax.scan over iterations, per-candidate Adam state) runs
INSIDE ``shard_map``: parameters for a candidate live replicated along the
``point`` axis and stay in sync because every point-group member sees the
same psum'd loss/gradients.  The only cross-device traffic is the per-step
loss psum (bytes per candidate) riding ICI — there is no gradient
all-reduce of any model state.

Scene-level data parallelism (multi-host sweep over rooms) needs no
collectives at all: shard query files across hosts and concatenate CSVs.
"""

from __future__ import annotations

import functools
import os
import sys
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..loss import Pose, pose_rotation
from ..ops.projection import safe_norm, spherical_project
from ..ops.sampling import (
    bilinear_sample_packed,
    cast_packed_table,
    pack_bilinear_blocks,
    resolve_descent_table,
)
from ..optim import init_adam_plateau
from ..solver import SolveResult, _check_prune, _make_step_for

try:  # jax >= 0.4.31 exposes shard_map at top level
    from jax import shard_map as _shard_map_mod

    shard_map = _shard_map_mod.shard_map if hasattr(_shard_map_mod, "shard_map") else _shard_map_mod
except ImportError:  # pragma: no cover
    from functools import wraps as _wraps

    from jax.experimental.shard_map import shard_map as _legacy_shard_map

    @_wraps(_legacy_shard_map)
    def shard_map(*args, check_vma=None, **kwargs):
        # the legacy entry point spells the replication check `check_rep`;
        # translate so callers can use the modern kwarg (the slab stage-1
        # shard_map passes check_vma=False) on either jax version
        if check_vma is not None:
            kwargs["check_rep"] = check_vma
        return _legacy_shard_map(*args, **kwargs)

__all__ = [
    "make_mesh",
    "solve_sharded",
    "shard_map",
    "init_distributed",
    "descent_local",
]


# Environment variables whose presence means "this process was launched as
# part of a cluster" — auto-init failing under any of these is a
# misconfiguration, not a benign single-process run.
_CLUSTER_ENV_VARS = (
    "JAX_COORDINATOR_ADDRESS",
    "COORDINATOR_ADDRESS",
    "MEGASCALE_COORDINATOR_ADDRESS",
    "TPU_WORKER_HOSTNAMES",
    "SLURM_STEP_NODELIST",
)


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    strict: bool = False,
) -> int:
    """Initialise multi-host JAX (one process per host, ICI+DCN mesh).

    Thin wrapper over ``jax.distributed.initialize`` — with no arguments it
    auto-detects the cluster environment (TPU pods, GKE, SLURM).  Call once
    per process before any device use; after it, ``jax.devices()`` spans the
    pod, ``make_mesh()`` builds the global mesh, and scene-level sweeps use
    ``query_shards=jax.process_count(), query_shard_index=jax.process_index()``.

    Three argument paths:
      * explicit: ``coordinator_address`` (alone — jax infers
        num_processes/process_id on TPU pods — or with both) —
        initialization errors propagate;
      * ``num_processes=1`` (no coordinator): explicit single-process no-op;
      * none: auto-detect.  If auto-init FAILS while cluster launch env vars
        are present (coordinator address, SLURM/TPU-pod markers), that is a
        misconfigured pod — the process would silently run 1/Nth of a
        sharded sweep — so a loud warning is printed (or, with
        ``strict=True``, the error re-raised).

    Returns the process index.
    """
    if process_id is not None and coordinator_address is None:
        raise ValueError(
            "process_id without coordinator_address is meaningless — pass "
            "both (num_processes may be inferred on TPU pods), "
            "num_processes=1 alone, or nothing (auto-detect)"
        )
    if coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    elif num_processes is None:
        try:
            jax.distributed.initialize()
        except Exception as exc:
            present = [v for v in _CLUSTER_ENV_VARS if os.environ.get(v)]
            if present:
                if strict:
                    raise
                import warnings

                msg = (
                    "jax.distributed.initialize() auto-detection FAILED "
                    f"({type(exc).__name__}: {exc}) although cluster launch "
                    f"environment variables are set ({', '.join(present)}). "
                    "Continuing SINGLE-PROCESS: a sharded sweep on this "
                    "config would silently run 1/Nth of its queries per "
                    "host. Pass explicit coordinator_address/num_processes/"
                    "process_id, or strict=True to raise."
                )
                warnings.warn(msg, RuntimeWarning, stacklevel=2)
                print(f"WARNING: {msg}", file=sys.stderr, flush=True)
            # else: plain single-process environment — nothing to initialise
    elif num_processes != 1:
        raise ValueError(
            f"num_processes={num_processes} needs coordinator_address and "
            "process_id (explicit cluster path)"
        )
    return jax.process_index()


def make_mesh(
    n_cand: Optional[int] = None,
    n_point: Optional[int] = None,
    devices=None,
) -> Mesh:
    """Build a ('cand', 'point') mesh over the available devices.

    Default factorization favors the point axis (clouds run to millions of
    points; candidate batches are small — reference num_input=6): at most
    2-way candidates, everything else on points.
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if n_cand is None and n_point is None:
        n_cand = 2 if (n >= 4 and n % 2 == 0) else 1
        n_point = n // n_cand
    elif n_point is None:
        n_point = n // n_cand
    elif n_cand is None:
        n_cand = n // n_point
    assert n_cand * n_point == n, (n_cand, n_point, n)
    return Mesh(devices.reshape(n_cand, n_point), axis_names=("cand", "point"))


def _point_sharded_loss(pose: Pose, xyz, rgb, blocks, height, width,
                        point_mask, wrap=False):
    """Sampling loss with the point dimension sharded along 'point'.

    Local partial (sum, count) + one psum reconstruct the exact global mean
    of piccolo_tpu.loss.sampling_loss.
    """
    R = pose_rotation(pose)
    cam = jnp.einsum("nj,kj->nk", xyz - pose.t, R, precision="highest")
    coords = spherical_project(cam)
    sampled = bilinear_sample_packed(blocks, height, width, coords, wrap=wrap)
    valid = jnp.sum(sampled == 0.0, axis=-1) != 3
    if point_mask is not None:
        valid = valid & point_mask
    per_point = safe_norm(sampled - rgb)
    total = jax.lax.psum(jnp.sum(per_point * valid), "point")
    count = jax.lax.psum(jnp.sum(valid), "point")
    mean = total / jnp.maximum(count, 1)
    return jnp.where(count > 0, mean, jnp.inf)


def descent_local(
    img_l, xyz_l, rgb_l, mask_l, t0_l, ypr0_l, lo_l, hi_l, valid_l=None,
    *, num_iter, lr, patience, factor, table_dtype="auto", wrap=False,
    prune=None, n_valid=None, n_cand=1,
):
    """Per-shard multi-start descent body (runs INSIDE shard_map).

    Candidates arrive 'cand'-sharded, the cloud 'point'-sharded; every loss
    and gradient evaluation reconstructs the global mean with one psum, so a
    candidate's Adam state stays bit-identical across its point-group
    replicas.  Shared by solve_sharded and the fused sharded pipeline
    (parallel/fused.py).

    ``prune=(k, m)`` composes the descent-prune speed mode
    (solver._descend_pruned) with the mesh: after k iterations the local
    phase-1 losses/states all_gather along 'cand' (a few hundred bytes),
    the m globally-best survivors — trailing clone-padding rows beyond
    ``n_valid`` and rows whose 'cand'-sharded ``valid_l`` mask is False
    (the fused path's scarce-valid duplicate-best clones) are excluded —
    are re-distributed evenly across the cand
    groups (slots padded with repeats of the best survivor), and each
    shard finishes the budget on its slice.  A second small all_gather
    scatters survivor finals back into the original candidate rows;
    pruned rows report their frozen phase-1 state, exactly like the
    single-device mode.  ``n_cand`` is the static 'cand'-axis size.
    """
    H, W, _ = img_l.shape
    # the image is replicated across the mesh, so every shard resolves
    # "auto" to the same dtype (the table is per-shard but identical)
    table_dtype = resolve_descent_table(table_dtype, H, W)
    blocks_l = cast_packed_table(pack_bilinear_blocks(img_l, wrap=wrap),
                                 table_dtype)

    # The scheduler scalars start as replicated constants but become
    # 'cand'-varying after the first step (the loss differs per
    # candidate); mark them varying up front so the scan carry type
    # is stable under shard_map's replication tracking.
    vary = lambda x: jax.lax.pcast(x, ("cand",), to="varying")
    # the ONE parity-critical per-iteration transition (solver), built
    # from the point-sharded psum loss
    step = _make_step_for(
        lambda p: _point_sharded_loss(
            p, xyz_l, rgb_l, blocks_l, H, W, mask_l, wrap
        ),
        lo_l, hi_l, patience, factor,
    )

    def init_state(t0, y0):
        params = Pose(t=t0, yaw=y0[0], pitch=y0[1], roll=y0[2])
        state = init_adam_plateau(params, lr)
        return params, state._replace(
            lr=vary(state.lr), best=vary(state.best),
            num_bad=vary(state.num_bad),
        )

    def run(params, state, n):
        (params, state), losses = jax.lax.scan(
            step, (params, state), None, length=n
        )
        return params, state, losses[-1]

    if prune is None:
        def one(t0, y0):
            params, state = init_state(t0, y0)
            params, state, last = run(params, state, num_iter)
            return params, last, state.lr

        params, losses, lrs = jax.vmap(one)(t0_l, ypr0_l)
        ypr = jnp.stack([params.yaw, params.pitch, params.roll], axis=-1)
        return params.t, ypr, losses, lrs

    k_it, m = prune
    b_l = t0_l.shape[0]  # local candidates per cand group

    def seg1(t0, y0):
        params, state = init_state(t0, y0)
        return run(params, state, k_it)

    params1, state1, loss1 = jax.vmap(seg1)(t0_l, ypr0_l)

    gather = lambda tree: jax.tree.map(
        lambda x: jax.lax.all_gather(x, "cand", tiled=True), tree
    )
    all_loss = gather(loss1)  # (n_cand * b_l,)
    gids = jnp.arange(all_loss.shape[0])
    # clone rows must never claim survivor slots: trailing mesh padding
    # (>= n_valid) and the fused path's duplicate-best scarce-valid rows
    # (valid_l False) would tie bit-identically with the best start and
    # silently shrink the effective keep count
    if n_valid is not None:
        all_loss = jnp.where(gids < n_valid, all_loss, jnp.inf)
    if valid_l is not None:
        all_loss = jnp.where(gather(valid_l), all_loss, jnp.inf)
    order = jnp.argsort(all_loss)
    per = -(-m // n_cand)  # survivors per cand group (slots pad the best)
    surv_gids = jnp.concatenate(
        [order[:m], jnp.broadcast_to(order[0], (per * n_cand - m,))]
    )
    all_params1, all_state1 = gather(params1), gather(state1)
    ci = jax.lax.axis_index("cand")
    my_slots = jax.lax.dynamic_slice_in_dim(surv_gids, ci * per, per)
    take = lambda tree, idx: jax.tree.map(lambda x: x[idx], tree)

    def seg2(params, state):
        params, state, last = run(params, state, num_iter - k_it)
        return params, last, state.lr

    params2, loss2, lr2 = jax.vmap(seg2)(
        take(all_params1, my_slots), take(all_state1, my_slots)
    )
    # gather survivor finals (rows ordered as surv_gids) and scatter them
    # back into this shard's original candidate rows
    allF = gather((params2, loss2, lr2))
    my_gids = ci * b_l + jnp.arange(b_l)

    def pick(gid, p1, l1, r1):
        hit = surv_gids == gid
        found = jnp.any(hit)
        pos = jnp.argmax(hit)
        sel = lambda a, b: jax.tree.map(
            lambda x, y: jnp.where(found, x[pos], y), a, b
        )
        return sel(allF[0], p1), sel(allF[1], l1), sel(allF[2], r1)

    params, losses, lrs = jax.vmap(pick)(
        my_gids, params1, loss1, state1.lr
    )
    ypr = jnp.stack([params.yaw, params.pitch, params.roll], axis=-1)
    return params.t, ypr, losses, lrs


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "num_iter", "lr", "patience", "factor",
                     "table_dtype", "wrap", "prune", "n_valid"),
)
def _solve_sharded_jit(
    img, xyz, rgb, trans0, ypr0, lo, hi, point_mask,
    *, mesh, num_iter, lr, patience, factor, table_dtype="auto",
    wrap=False, prune=None, n_valid=None,
):
    t, ypr, losses, lrs = shard_map(
        functools.partial(
            descent_local,
            num_iter=num_iter, lr=lr, patience=patience, factor=factor,
            table_dtype=table_dtype, wrap=wrap,
            prune=prune, n_valid=n_valid, n_cand=mesh.shape["cand"],
        ),
        mesh=mesh,
        in_specs=(
            P(),  # img replicated
            P("point", None),  # xyz
            P("point", None),  # rgb
            P("point"),  # validity mask
            P("cand", None),  # candidate translations
            P("cand", None),  # candidate rotations
            P(),  # lo
            P(),  # hi
        ),
        out_specs=(P("cand", None), P("cand", None), P("cand"), P("cand")),
    )(img, xyz, rgb, point_mask, trans0, ypr0, lo, hi)

    from ..ops.rotation import rot_from_ypr

    rot = rot_from_ypr(ypr)
    return SolveResult(t=t, ypr=ypr, rot=rot, loss=losses, lr=lrs)


def _pad_axis0(a: np.ndarray, multiple: int) -> Tuple[np.ndarray, int]:
    n = a.shape[0]
    pad = (-n) % multiple
    if pad:
        a = np.concatenate([a, np.broadcast_to(a[:1], (pad,) + a.shape[1:])])
    return a, n


def solve_sharded(
    mesh: Mesh,
    img,
    xyz,
    rgb,
    trans0,
    ypr0,
    lo,
    hi,
    point_mask=None,
    *,
    num_iter: int = 100,
    lr: float = 0.1,
    patience: int = 5,
    factor: float = 0.9,
    table_dtype: str = "auto",
    wrap: bool = False,
    prune=None,
):
    """Multi-chip multi-start descent; same contract as solver.solve.

    Candidates are padded to a multiple of the 'cand' axis, points (with the
    validity mask) to a multiple of the 'point' axis; the padding never
    influences results (padded candidates are clones whose losses are
    discarded; padded points are mask=False).

    ``prune=(k, m)`` enables the descent-prune speed mode over the mesh
    (see descent_local) — padding rows never claim survivor slots.

    Returns (t, R, loss, SolveResult-over-original-candidates).
    """
    n_cand = mesh.shape["cand"]
    n_point = mesh.shape["point"]

    trans0, b = _pad_axis0(np.asarray(trans0, np.float32), n_cand)
    ypr0, _ = _pad_axis0(np.asarray(ypr0, np.float32), n_cand)

    xyz = np.asarray(xyz, np.float32)
    rgb = np.asarray(rgb, np.float32)
    n = xyz.shape[0]
    if point_mask is None:
        point_mask = np.ones(n, bool)
    else:
        point_mask = np.asarray(point_mask, bool)
    pad = (-n) % n_point
    if pad:
        xyz = np.concatenate([xyz, np.zeros((pad, 3), np.float32)])
        rgb = np.concatenate([rgb, np.zeros((pad, 3), np.float32)])
        point_mask = np.concatenate([point_mask, np.zeros(pad, bool)])

    # Place inputs on the mesh so jit doesn't re-lay them out per call.
    dev = lambda spec: NamedSharding(mesh, spec)
    img = jax.device_put(jnp.asarray(img, jnp.float32), dev(P()))
    xyz = jax.device_put(xyz, dev(P("point", None)))
    rgb = jax.device_put(rgb, dev(P("point", None)))
    point_mask = jax.device_put(point_mask, dev(P("point")))
    trans0 = jax.device_put(trans0, dev(P("cand", None)))
    ypr0 = jax.device_put(ypr0, dev(P("cand", None)))
    lo = jax.device_put(jnp.asarray(lo, jnp.float32), dev(P()))
    hi = jax.device_put(jnp.asarray(hi, jnp.float32), dev(P()))

    prune = _check_prune(prune, num_iter, b, False)
    res = _solve_sharded_jit(
        img, xyz, rgb, trans0, ypr0, lo, hi, point_mask,
        mesh=mesh, num_iter=num_iter, lr=lr, patience=patience, factor=factor,
        table_dtype=table_dtype, wrap=wrap, prune=prune,
        n_valid=b if prune is not None else None,
    )
    res = SolveResult(
        t=res.t[:b], ypr=res.ypr[:b], rot=res.rot[:b],
        loss=res.loss[:b], lr=res.lr[:b],
    )
    k = int(jnp.argmin(res.loss))
    return res.t[k], res.rot[k], res.loss[k], res

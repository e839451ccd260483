"""Multi-chip fused whole-query pipeline: ALL stages over the device mesh.

`solve_sharded` (sharding.py) covers only the descent; the reference's
dominant cost is the init — the brute-force loss table over the trans x rot
grid (reference utils.py:462-507) and the per-candidate pano render +
histogram trim (utils.py:510-588).  Both are embarrassingly parallel over
candidates and linear over points, so they shard over the same
('cand', 'point') mesh:

  stage 1  pairs sharded along 'cand'; each loss is a point-sharded partial
           sum reconstructed with one psum (bytes per pair over ICI).
  top-k    scores are tiny (one float per pair): computed in plain jit land
           between the shard_maps — XLA inserts the gather of the score
           vector; candidate coordinates stay replicated host constants.
  stage 2  survivors sharded along 'cand'; each shard z-buffers its LOCAL
           points into a packed min-key buffer and one pmin over 'point'
           reconstructs the exact global render (scatter-min is associative)
           — bit-identical to the single-device histogram trim.
  stage 3  the sharded multi-start descent (sharding.descent_local).

Selection semantics match pipeline.localize_query exactly (same ranking
rules, same validity carrying); equality of winners against the
single-device fused program is guarded in tests/test_parallel.py.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..init.refine import (
    HistPlan,
    check_criterion,
    hist_scores_core,
    hist_scores_from_planes,
)
from ..loss import Pose
from ..ops.rotation import rot_from_ypr
from ..ops.sampling import pack_bilinear_blocks
from ..pipeline import LocalizeResult
from .sharding import _point_sharded_loss, descent_local, shard_map

__all__ = [
    "localize_query_sharded",
    "shard_cloud",
    "ShardedGridPlan",
    "shard_grid_plan",
    "shard_hist_plan",
]


class ShardedGridPlan:
    """Per-point-shard sorted-slab plans laid out for the mesh.

    The slab kernel composes with the ('cand', 'point') mesh because
    stage-1 samples factor over points: each point shard gets its OWN plan
    (sorted streams over its local cloud slice, same candidate pairs), the
    kernel runs per shard inside shard_map, and one psum of the
    (loss_sum, valid_count) accumulators reconstructs the exact global
    scores — the mean's numerator and denominator are plain sums over
    samples, so exactness carries over (scores differ from the
    single-device plan only in f32 summation order, like every other
    point-sharded reduction here).  Candidate GROUPS are additionally
    split contiguously along 'cand'.

    fields:  (n_point, n_cand, Gc, NB, nf, BLOCK) f32, sharded
             P('point', 'cand', ...); windows: (n_point, n_cand, Gc, NB)
             int32.  Aux mirrors kernels.slab_sampling.GridPlan.
    """

    def __init__(self, fields, windows, n_pairs: int, compact: bool,
                 tp_is_pid: bool, height: int, width: int,
                 wrap: bool = False, window: int = 512, block: int = 1024,
                 quant: bool = False, tps=None):
        self.fields = fields
        self.windows = windows
        self.tps = tps  # (n_point, n_cand, Gc, NB, block) or None (f32)
        self.n_pairs = int(n_pairs)
        self.compact = bool(compact)
        self.tp_is_pid = bool(tp_is_pid)
        self.height = int(height)
        self.width = int(width)
        self.wrap = bool(wrap)
        self.window = int(window)
        self.block = int(block)
        self.quant = bool(quant)

    def tree_flatten(self):
        return (
            (self.fields, self.windows, self.tps),
            (self.n_pairs, self.compact, self.tp_is_pid,
             self.height, self.width, self.wrap, self.window, self.block,
             self.quant),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        fields, windows, tps = children
        return cls(fields, windows, *aux, tps=tps)

    @property
    def nbytes(self) -> int:
        return (
            self.fields.nbytes + self.windows.nbytes
            + (self.tps.nbytes if self.tps is not None else 0)
        )


jax.tree_util.register_pytree_node(
    ShardedGridPlan, ShardedGridPlan.tree_flatten,
    ShardedGridPlan.tree_unflatten,
)


def shard_grid_plan(
    mesh: Mesh,
    xyz,
    rgb,
    point_mask,
    trans_grid,
    rot_grid,
    height: int,
    width: int,
    compact: bool = False,
    tp_is_pid: bool = False,
    wrap: bool = False,
    quant: bool = False,
) -> ShardedGridPlan:
    """Build per-point-shard slab plans for :func:`localize_query_sharded`.

    ``xyz``/``rgb``/``point_mask`` are the FULL (host or device) cloud —
    the same split as :func:`shard_cloud` (pad to the 'point' axis, then
    contiguous slices) keys each shard's plan to the points that shard
    owns, so the kernel's local pids index the local rgb slice directly
    (sharpen refresh works per shard).  Candidate groups pad to a multiple
    of the 'cand' axis with empty (sentinel) groups whose pairs score +inf
    and are sliced off by ``n_pairs`` masking.

    Slice grid-shape padding off ``trans_grid`` before calling (same
    contract as build_grid_plan).
    """
    from ..kernels.slab_sampling import (
        build_grid_plan,
        nb_bucket,
        plan_required_blocks,
        resolve_plan_geometry,
    )

    n_point = mesh.shape["point"]
    n_cand = mesh.shape["cand"]
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
    per = xyz.shape[0] // n_point
    # one geometry for ALL shards (equal padded shard sizes make the
    # density-based auto resolve identically, but fix it explicitly so the
    # stacked streams can never disagree on shape)
    window, block = resolve_plan_geometry(per, height, width)

    def shard_args(s):
        sl = slice(s * per, (s + 1) * per)
        return (
            jnp.asarray(xyz[sl]), jnp.asarray(rgb[sl]),
            jnp.asarray(point_mask[sl]),
        )

    # one common static block count across shards (max requirement, bucketed)
    def required(s):
        xyz_s, _, mask_s = shard_args(s)
        return plan_required_blocks(
            xyz_s, mask_s, trans_grid, rot_grid, height, width, wrap=wrap,
            window=window, block=block,
        )

    nb = nb_bucket(max(required(s) for s in range(n_point)))

    fields_all, windows_all, tps_all = [], [], []
    n_pairs = None
    for s in range(n_point):
        plan = build_grid_plan(
            *shard_args(s), trans_grid, rot_grid, height, width,
            compact=compact, tp_is_pid=tp_is_pid, nb=nb, wrap=wrap,
            window=window, block=block, quant=quant,
        )
        n_pairs = plan.n_pairs
        f = np.stack([np.asarray(x) for x in plan.fields])  # (G, NB, nf, B)
        w = np.stack([np.asarray(x) for x in plan.windows])  # (G, NB)
        t = (np.stack([np.asarray(x) for x in plan.tps])
             if compact else None)                           # (G, NB, 1, B)
        gpad = (-f.shape[0]) % n_cand
        if gpad:
            # empty groups: sentinel payloads contribute nothing (q8:
            # the 511<<23 lidx sentinel, int32)
            if quant:
                empty = np.full((1, block), 511 << 23, np.int32)
            else:
                empty = np.broadcast_to(
                    np.array([-1, 0, 0] if compact
                             else [-1, 0, 0, 0, 0, 0, -1, 0],
                             np.float32)[:, None],
                    (f.shape[2], block),
                )
            f = np.concatenate(
                [f, np.broadcast_to(empty, (gpad,) + f.shape[1:])]
            )
            w = np.concatenate([w, np.zeros((gpad,) + w.shape[1:], w.dtype)])
            if t is not None:
                t = np.concatenate(
                    [t, np.zeros((gpad,) + t.shape[1:], t.dtype)]
                )
        fields_all.append(f.reshape(n_cand, f.shape[0] // n_cand, *f.shape[1:]))
        windows_all.append(w.reshape(n_cand, w.shape[0] // n_cand, *w.shape[1:]))
        if t is not None:
            tps_all.append(t.reshape(n_cand, t.shape[0] // n_cand, *t.shape[1:]))

    dev = lambda spec: NamedSharding(mesh, spec)
    fields = jax.device_put(
        np.stack(fields_all),
        dev(P("point", "cand", None, None, None, None)),
    )
    windows = jax.device_put(
        np.stack(windows_all), dev(P("point", "cand", None, None))
    )
    tps = (
        jax.device_put(
            np.stack(tps_all),
            dev(P("point", "cand", None, None, None, None)),
        )
        if compact else None
    )
    return ShardedGridPlan(
        fields=fields, windows=windows, n_pairs=n_pairs, compact=compact,
        tp_is_pid=tp_is_pid, height=height, width=width, wrap=wrap,
        window=window, block=block, quant=quant, tps=tps,
    )


def shard_hist_plan(mesh: Mesh, plan: HistPlan) -> HistPlan:
    """Lay a stage-2 winner-bin plan (init.refine.HistPlan) out on the mesh.

    Planes are per-pair independent, so they shard along 'cand' (pair rows
    padded to the axis with sentinel-bin rows that are never gathered —
    the pair-index gather clamps to ``n_pairs - 1``).  Per-device HBM cost
    is ``nbytes / n_cand``; the selected candidates' planes (a few MB) move
    once per query via the top-k gather XLA inserts between the stage-1 and
    stage-2 shard_maps.
    """
    from ..init.refine import _HIST_BINS

    n_cand = mesh.shape["cand"]
    planes = plan.planes
    pad = (-planes.shape[0]) % n_cand
    if pad:
        # the sentinel/background bin sits one past the real bins
        nb = int(np.prod(_HIST_BINS))
        planes = jnp.concatenate([
            planes, jnp.full((pad, planes.shape[1]), nb, planes.dtype)
        ])
    planes = jax.device_put(planes, NamedSharding(mesh, P("cand", None)))
    return HistPlan(planes, plan.n_pairs, plan.height, plan.width)


def shard_cloud(mesh: Mesh, xyz, rgb, point_mask=None):
    """Pad the cloud to the 'point' axis and lay it out on the mesh ONCE.

    The cloud (and its validity mask) is room-static; callers evaluating
    many queries of one room should shard it once and pass the results to
    :func:`localize_query_sharded`, which recognises correctly-sharded
    device arrays and skips the per-query host round-trip + re-layout
    (tens of MB per query at OmniScenes scale otherwise).
    """
    n_point = mesh.shape["point"]
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
    dev = lambda spec: NamedSharding(mesh, spec)
    return (
        jax.device_put(xyz, dev(P("point", None))),
        jax.device_put(rgb, dev(P("point", None))),
        jax.device_put(point_mask, dev(P("point"))),
    )


def _arr_sharded(mesh: Mesh, a, spec) -> bool:
    """True when ``a`` already carries shard_cloud's layout for ``spec``."""
    return (
        isinstance(a, jax.Array)
        and a.shape[0] % mesh.shape["point"] == 0
        and a.sharding == NamedSharding(mesh, spec)
    )


def _pad_clone_rows(a: jnp.ndarray, multiple: int) -> jnp.ndarray:
    """Pad axis 0 to a multiple by cloning row 0 (static pad amount)."""
    pad = (-a.shape[0]) % multiple
    if pad:
        a = jnp.concatenate([a, jnp.broadcast_to(a[:1], (pad,) + a.shape[1:])])
    return a


# exported so utils.exec_cache.aot_call can split static from dynamic
# kwargs (same pattern as pipeline.LOCALIZE_QUERY_STATICS).  `mesh` is a
# static too; its repr covers axis names/sizes but NOT device ids — the
# device assignment is keyed by the argument arrays instead (every array
# reaching the jit was device_put onto the mesh, and exec_cache._aval
# records each leaf's device-id tuple), so same-shape meshes over
# different chips never share an entry.
SHARDED_QUERY_STATICS = (
    "mesh", "num_intermediate", "num_input", "num_split_h", "num_split_w",
    "num_iter", "lr", "patience", "factor", "grid_chunk", "hist_chunk",
    "descent_table", "plan_refresh_rgb", "seam_wrap", "criterion",
    "descent_prune",
)


@functools.partial(jax.jit, static_argnames=SHARDED_QUERY_STATICS)
def _localize_query_sharded_jit(
    img_init, img_main, xyz, rgb, trans_grid, rot_grid, trans_valid,
    lo, hi, point_mask, plan=None, hist_plan=None,
    *, mesh, num_intermediate, num_input, num_split_h, num_split_w,
    num_iter, lr, patience, factor, grid_chunk, hist_chunk,
    descent_table="auto", plan_refresh_rgb=False, seam_wrap=False,
    criterion="loss_histogram", descent_prune=None,
):
    n_cand = mesh.shape["cand"]
    cloud_specs = (P(), P("point", None), P("point", None), P("point"))

    # ---- stage 1: loss table over (trans, rot) pairs, 'cand'-sharded
    # (pair order from the shared parity anchor, kernels.slab_sampling)
    from ..kernels.slab_sampling import make_pairs

    T, R = trans_grid.shape[0], rot_grid.shape[0]
    pt, pr = make_pairs(trans_grid, rot_grid)
    pair_t = _pad_clone_rows(pt, n_cand * grid_chunk)
    pair_r = _pad_clone_rows(pr, n_cand * grid_chunk)
    pair_valid = jnp.concatenate([
        jnp.repeat(trans_valid, R),
        jnp.zeros(pair_t.shape[0] - T * R, bool),
    ])

    def stage1(img, xyz_l, rgb_l, pm_l, pt_l, pr_l, pv_l):
        H, W, _ = img.shape
        blocks = pack_bilinear_blocks(img, wrap=seam_wrap)

        def one(t, ypr, valid):
            pose = Pose(t=t, yaw=ypr[0], pitch=ypr[1], roll=ypr[2])
            s = _point_sharded_loss(pose, xyz_l, rgb_l, blocks, H, W, pm_l,
                                    seam_wrap)
            return jnp.where(valid, s, jnp.inf)

        k = pt_l.shape[0]
        tc = pt_l.reshape(k // grid_chunk, grid_chunk, 3)
        yc = pr_l.reshape(k // grid_chunk, grid_chunk, 3)
        vc = pv_l.reshape(k // grid_chunk, grid_chunk)
        s = jax.lax.map(
            lambda c: jax.vmap(one)(c[0], c[1], c[2]), (tc, yc, vc)
        )
        return s.reshape(-1)

    def stage1_slab(img, rgb_l, fields_l, windows_l, tps_l=None):
        # the mesh composition of the sorted-slab MXU kernel: each device
        # runs the kernel over its own (point-shard, cand-group-slice)
        # streams; ONE psum of the (loss_sum, count) accumulators over
        # 'point' reconstructs the exact global scores (the mean's
        # numerator/denominator are plain sums over samples)
        from ..kernels.slab_sampling import _slab_tables, slab_group_partials

        H, W, _ = img.shape
        tables = _slab_tables(img, H, W, wrap=plan.wrap,
                              window=plan.window)
        fl = fields_l[0, 0]                    # (Gc, NB, nf, BLOCK)
        wl = windows_l[0, 0]
        tl = tps_l[0, 0] if tps_l is not None else None
        ref = rgb_l if plan_refresh_rgb else None
        parts = [
            slab_group_partials(
                tables, fl[g], wl[g], plan.compact, ref,
                tps=tl[g] if tl is not None else None, window=plan.window,
                quant=plan.quant,
            )
            for g in range(fl.shape[0])
        ]
        tot = jax.lax.psum(
            jnp.concatenate([p[0] for p in parts]), "point"
        )
        cnt = jax.lax.psum(
            jnp.concatenate([p[1] for p in parts]), "point"
        )
        mean = tot / jnp.maximum(cnt, 1.0)
        return jnp.where(cnt > 0, mean, jnp.inf)

    if plan is not None:
        if plan.wrap != seam_wrap:
            raise ValueError(
                f"sharded plan was built with wrap={plan.wrap} but "
                f"seam_wrap={seam_wrap}"
            )
        if plan.height and (plan.height, plan.width) != img_init.shape[:2]:
            raise ValueError(
                f"sharded plan was built for a {plan.height}x{plan.width} "
                f"init image but the query image is {img_init.shape[:2]}"
            )
        if plan.n_pairs > T * R or plan.n_pairs % R:
            raise ValueError(
                f"sharded plan covers {plan.n_pairs} pairs but the grids "
                f"imply {T}x{R}={T * R} (stale plan?)"
            )
        # check_vma=False is scoped to THIS shard_map only: pallas_call's
        # internal machinery cannot yet propagate varying-axis metadata
        # through its index bookkeeping (JAX raises "Primitive
        # dynamic_slice requires varying manual axes to match ... pass
        # check_vma=False as a temporary workaround").  The replication
        # audit here is trivial by hand — two psums over 'point', no scan
        # carries, and no gradients flow through stage-1 scores (they feed
        # top_k only) — while the descent (where a disabled check could
        # silently double-count psum gradients) keeps checking ON.
        specs = [
            P(), P("point", None),
            P("point", "cand", None, None, None, None),
            P("point", "cand", None, None),
        ]
        args = [img_init, rgb, plan.fields, plan.windows]
        if plan.tps is not None:
            specs.append(P("point", "cand", None, None, None, None))
            args.append(plan.tps)
        s_slab = shard_map(
            stage1_slab,
            mesh=mesh,
            in_specs=tuple(specs),
            out_specs=P("cand"),
            check_vma=False,
        )(*args)
        s_all = s_slab[: min(plan.n_pairs, T * R)]
        pad_n = pair_t.shape[0] - s_all.shape[0]
        if pad_n:
            s_all = jnp.concatenate(
                [s_all, jnp.full(pad_n, jnp.inf, s_all.dtype)]
            )
        scores = jnp.where(pair_valid, s_all, jnp.inf)
    else:
        scores = shard_map(
            stage1,
            mesh=mesh,
            in_specs=cloud_specs + (
                P("cand", None), P("cand", None), P("cand")
            ),
            out_specs=P("cand"),
        )(img_init, xyz, rgb, point_mask, pair_t, pair_r, pair_valid)

    # criterion='loss' selects the final num_input directly from the table
    # (pipeline.localize_query parity — the histogram stage is skipped)
    k1 = min(num_intermediate if criterion == "loss_histogram" else num_input,
             T * R)
    neg_top, idx1 = jax.lax.top_k(-scores, k1)
    # fewer than k1 valid pairs -> +inf rows slip in; carry their
    # (in)validity so stage 2 can never promote them (pipeline.py parity)
    sel_valid = jnp.isfinite(neg_top)
    t1 = jnp.take(pair_t, idx1, axis=0)
    r1 = jnp.take(pair_r, idx1, axis=0)

    if criterion == "loss":
        t2, r2, k2, final_valid = t1, r1, k1, sel_valid
    else:
        if hist_plan is not None:
            # room-static winner-bin planes (pipeline.py parity): gather the
            # selected pairs' planes by PAIR INDEX, then score them
            # 'cand'-sharded — no per-query splat, no 'point' traffic at all
            # in stage 2.  idx1 rows beyond n_pairs are +inf-scored padding;
            # clamp their gather (sel_valid masks them).  The gather runs
            # INSIDE shard_map (each 'cand' shard contributes the rows it
            # owns, zero elsewhere; one psum combines) so the k1 selected
            # rows are all that ever move — a jit-land jnp.take over the
            # sharded operand axis may lower to an all-gather of the FULL
            # plane array on some XLA versions (advisor r3 #2), which would
            # defeat the nbytes/n_cand per-device HBM contract on large
            # rooms.
            idx_sel = jnp.minimum(idx1, hist_plan.n_pairs - 1)
            per_shard = hist_plan.planes.shape[0] // n_cand

            def gather_planes(planes_l, idx):
                ax = jax.lax.axis_index("cand")
                owner = idx // per_shard
                mine = owner == ax
                loc = jnp.where(mine, idx - ax * per_shard, 0)
                rows = jnp.take(planes_l, loc, axis=0)
                rows = jnp.where(mine[:, None], rows, 0)
                return jax.lax.psum(rows, "cand")

            sel = shard_map(
                gather_planes,
                mesh=mesh,
                in_specs=(P("cand", None), P()),
                out_specs=P(),
            )(hist_plan.planes, idx_sel)
            selp = _pad_clone_rows(sel, n_cand * hist_chunk)

            def stage2_planes(img, sel_l):
                # use_mxu_hist=False: the pallas kernel cannot carry
                # varying-axis metadata through shard_map (the slab stage-1
                # exception is the ONE sanctioned check_vma=False site) —
                # same scatter fallback the live sharded stage 2 uses
                return hist_scores_from_planes(
                    img, sel_l, num_split_h, num_split_w, hist_chunk,
                    use_mxu_hist=False,
                )

            hs = shard_map(
                stage2_planes,
                mesh=mesh,
                in_specs=(P(), P("cand", None)),
                out_specs=P("cand"),
            )(img_init, selp)[:k1]
        else:
            # ---- stage 2: histogram intersection, 'cand'-sharded
            # candidates, 'point'-sharded render combined by pmin
            t1p = _pad_clone_rows(t1, n_cand * hist_chunk)
            r1p = _pad_clone_rows(r1, n_cand * hist_chunk)

            def stage2(img, xyz_l, rgb_l, pm_l, t_l, y_l):
                return hist_scores_core(
                    img, xyz_l, rgb_l, t_l, y_l, pm_l,
                    num_split_h, num_split_w, hist_chunk, point_axis="point",
                )

            hs = shard_map(
                stage2,
                mesh=mesh,
                in_specs=cloud_specs + (P("cand", None), P("cand", None)),
                out_specs=P("cand"),
            )(img_init, xyz, rgb, point_mask, t1p, r1p)[:k1]
        hs = jnp.where(sel_valid, hs, -jnp.inf)
        k2 = min(num_input, k1)
        _, idx2 = jax.lax.top_k(hs, k2)
        t2 = jnp.take(t1, idx2, axis=0)
        r2 = jnp.take(r1, idx2, axis=0)
        final_valid = jnp.take(sel_valid, idx2)
    # garbage-padding poses must not descend (pipeline.py parity): slots
    # beyond the valid pair count duplicate the best valid start instead
    t2 = jnp.where(final_valid[:, None], t2, t2[0])
    r2 = jnp.where(final_valid[:, None], r2, r2[0])

    # ---- stage 3: sharded multi-start descent
    from ..solver import _check_prune

    descent_prune = _check_prune(descent_prune, num_iter, k2, False)
    t2p = _pad_clone_rows(t2, n_cand)
    r2p = _pad_clone_rows(r2, n_cand)
    # scarce-valid duplicate-best rows (final_valid False) and the mesh's
    # trailing clone padding must not claim prune survivor slots
    v2p = jnp.concatenate([
        final_valid, jnp.zeros(t2p.shape[0] - k2, bool)
    ])
    t, ypr, losses, lrs = shard_map(
        functools.partial(
            descent_local,
            num_iter=num_iter, lr=lr, patience=patience, factor=factor,
            table_dtype=descent_table, wrap=seam_wrap,
            prune=descent_prune, n_valid=k2, n_cand=n_cand,
        ),
        mesh=mesh,
        in_specs=cloud_specs + (P("cand", None), P("cand", None), P(), P(),
                                P("cand")),
        out_specs=(P("cand", None), P("cand", None), P("cand"), P("cand")),
    )(img_main, xyz, rgb, point_mask, t2p, r2p, lo, hi, v2p)
    t, ypr, losses = t[:k2], ypr[:k2], losses[:k2]

    w = jnp.argmin(losses)
    rot = rot_from_ypr(ypr)
    return LocalizeResult(
        t=t[w], rot=rot[w], loss=losses[w],
        cand_t=t, cand_ypr=ypr, cand_loss=losses,
        start_t=t2, start_ypr=r2, winner=w,
    )


def localize_query_sharded(
    mesh: Mesh,
    img_init,
    img_main,
    xyz,
    rgb,
    trans_grid,
    rot_grid,
    trans_valid,
    lo,
    hi,
    point_mask=None,
    *,
    num_intermediate: int = 20,
    num_input: int = 6,
    num_split_h: int = 4,
    num_split_w: int = 4,
    num_iter: int = 100,
    lr: float = 0.1,
    patience: int = 5,
    factor: float = 0.9,
    grid_chunk: int = 16,
    hist_chunk: int = 4,
    descent_table: str = "auto",
    plan: "Optional[ShardedGridPlan]" = None,
    plan_refresh_rgb: bool = False,
    hist_plan: "Optional[HistPlan]" = None,
    seam_wrap: bool = False,
    criterion: str = "loss_histogram",
    descent_prune=None,
    exec_cache_dir=None,
) -> LocalizeResult:
    """Localize one panorama end-to-end over a ('cand', 'point') device mesh.

    Same contract as pipeline.localize_query (candidate grids padded to
    static shapes by the caller; returns the same LocalizeResult), with the
    cloud padded here to a 'point'-axis multiple (mask=False padding) and all
    three stages executed SPMD across the mesh.

    ``plan`` (:func:`shard_grid_plan`, room-static) routes stage 1 through
    the sorted-slab MXU kernel per shard instead of the XLA gather — the
    psum-combined accumulators reproduce the single-device slab scores up
    to f32 summation order (guarded in tests/test_parallel.py).  Set
    ``plan_refresh_rgb=True`` when ``rgb`` differs from the colors the
    plan was built with (sharpen_color rebinds).

    ``hist_plan`` (:func:`shard_hist_plan` of an init.refine.build_hist_plan
    product, room-static) replaces the stage-2 point-sharded splat + pmin
    with a gather of precomputed winner-bin planes sharded along 'cand' —
    identical scores (the plane IS the splat's decoded output and the
    query-side histogram code is shared).  Invalid under per-query colour
    rebinds (``plan_refresh_rgb`` raises); unused when ``criterion='loss'``.

    ``criterion``: ``'loss_histogram'`` (parity default) or ``'loss'``
    (working extension — top ``num_input`` by sampling loss, stage 2
    skipped; pipeline.localize_query semantics).

    ``descent_prune=(k, m)``: the descent-prune speed mode composed with
    the mesh (descent_local) — phase-1 losses/states all_gather along
    'cand', the m globally-best survivors redistribute evenly across the
    cand groups, survivor finals scatter back into the original rows.
    Default None = full reference-parity descent.

    ``exec_cache_dir``: route the jitted SPMD program through the
    serialized-executable cache (utils.exec_cache) — a process restart
    loads the compiled executable instead of recompiling server-side
    (the multi-chip analog of pipeline.localize_query's routing;
    docs/ROUND4.md §3).  All arguments are device_put onto the mesh
    BEFORE the cached call, so the cache key carries the exact device
    assignment.
    """
    check_criterion(criterion)
    if plan is not None:
        from ..kernels.slab_sampling import _check_refresh

        _check_refresh(plan.compact, plan.tp_is_pid,
                       rgb if plan_refresh_rgb else None)
    if hist_plan is not None:
        # pipeline.localize_query's validation, mirrored (stale plans must
        # fail loudly, not silently rank wrong)
        T_, R_ = trans_grid.shape[0], rot_grid.shape[0]
        ih, iw = int(img_init.shape[0]), int(img_init.shape[1])
        if (hist_plan.height, hist_plan.width) != (ih, iw):
            raise ValueError(
                f"hist_plan was built for a {hist_plan.height}x"
                f"{hist_plan.width} init image but the query image is "
                f"({ih}, {iw})"
            )
        if hist_plan.n_pairs > T_ * R_ or hist_plan.n_pairs % R_:
            raise ValueError(
                f"hist_plan covers {hist_plan.n_pairs} pairs but the grids "
                f"imply {T_}x{R_}={T_ * R_} (stale plan? rebuild for these "
                "grids)"
            )
        if plan_refresh_rgb:
            raise ValueError(
                "hist_plan bakes point colour bins at build time — a "
                "per-query rgb rebind (plan_refresh_rgb) invalidates it; "
                "pass hist_plan=None for colour-rebinding queries"
            )
    dev = lambda spec: NamedSharding(mesh, spec)
    if (
        _arr_sharded(mesh, xyz, P("point", None))
        and point_mask is not None
        and _arr_sharded(mesh, point_mask, P("point"))
    ):
        # room-static cloud already laid out by shard_cloud; only re-place
        # the colors when a per-query rebind (sharpen_color) replaced them
        if not (
            _arr_sharded(mesh, rgb, P("point", None))
            and rgb.shape[0] == xyz.shape[0]
        ):
            rgb = np.asarray(rgb, np.float32)
            pad = xyz.shape[0] - rgb.shape[0]
            if pad:
                rgb = np.concatenate([rgb, np.zeros((pad, 3), np.float32)])
            rgb = jax.device_put(rgb, dev(P("point", None)))
    else:
        xyz, rgb, point_mask = shard_cloud(mesh, xyz, rgb, point_mask)
    img_init = jax.device_put(jnp.asarray(img_init, jnp.float32), dev(P()))
    img_main = jax.device_put(jnp.asarray(img_main, jnp.float32), dev(P()))
    trans_grid = jax.device_put(jnp.asarray(trans_grid, jnp.float32), dev(P()))
    rot_grid = jax.device_put(jnp.asarray(rot_grid, jnp.float32), dev(P()))
    trans_valid = jax.device_put(jnp.asarray(trans_valid, bool), dev(P()))
    lo = jax.device_put(jnp.asarray(lo, jnp.float32), dev(P()))
    hi = jax.device_put(jnp.asarray(hi, jnp.float32), dev(P()))

    call = _localize_query_sharded_jit
    if exec_cache_dir:
        import os

        from ..utils.exec_cache import aot_call

        call = functools.partial(
            aot_call, _localize_query_sharded_jit, SHARDED_QUERY_STATICS,
            os.path.expanduser(str(exec_cache_dir)),
        )
    return call(
        img_init, img_main, xyz, rgb, trans_grid, rot_grid, trans_valid,
        lo, hi, point_mask, plan, hist_plan,
        mesh=mesh, num_intermediate=num_intermediate, num_input=num_input,
        num_split_h=num_split_h, num_split_w=num_split_w, num_iter=num_iter,
        lr=lr, patience=patience, factor=factor,
        grid_chunk=grid_chunk, hist_chunk=hist_chunk,
        descent_table=descent_table, plan_refresh_rgb=plan_refresh_rgb,
        seam_wrap=seam_wrap, criterion=criterion,
        descent_prune=descent_prune,
    )

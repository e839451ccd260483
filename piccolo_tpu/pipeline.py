"""Whole-query fused pipeline: init scoring + trims + descent in ONE jit.

The staged path (init.make_input then solver.descend) round-trips trimmed
candidates through the host between stages.  Device compute per query is
only ~4 ms; on deployments where dispatch/transfer latency dominates (remote
TPU frontends) the round trips ARE the query time.  This module compiles the
entire per-query pipeline into a single XLA program:

    loss table over the trans x rot grid
      -> top-num_intermediate (lax.top_k)
      -> per-candidate pano render + blockwise histogram intersection
      -> top-num_input
      -> multi-start Adam/plateau descent (lax.scan + vmap)
      -> winner argmin

Only the query image goes up and the winner pose comes back.  Semantics are
identical to the staged path (same ops, same selection rules) — verified in
tests/test_pipeline.py.  One deliberate delta: ranking ties may resolve
differently than argsort-based trimming (lax.top_k is stable too, so in
practice selections match).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .init.refine import (
    HistPlan,
    check_criterion,
    hist_scores_core,
    hist_scores_from_planes,
)
from .kernels.slab_sampling import GridPlan, make_pairs, slab_pair_scores
from .loss import Pose, sampling_loss_packed
from .ops.rotation import rot_from_ypr
from .ops.sampling import (
    cast_packed_table,
    pack_bilinear_blocks,
    resolve_descent_table,
)
from .optim import init_adam_plateau
from .solver import (
    _check_multires,
    _check_prune,
    _descend_pruned,
    _descend_single_multires,
    _make_step,
)

__all__ = ["LocalizeResult", "localize_query", "localize_query_batch"]


class LocalizeResult(NamedTuple):
    t: jnp.ndarray  # (3,) winner translation
    rot: jnp.ndarray  # (3, 3) winner rotation
    loss: jnp.ndarray  # () winner loss
    cand_t: jnp.ndarray  # (num_input, 3) final candidate translations
    cand_ypr: jnp.ndarray  # (num_input, 3)
    cand_loss: jnp.ndarray  # (num_input,)
    start_t: jnp.ndarray  # (num_input, 3) selected starting translations
    start_ypr: jnp.ndarray  # (num_input, 3)
    winner: jnp.ndarray  # () int32 index into the candidates


def _grid_scores(img, xyz, rgb, pair_t, pair_ypr, pair_valid, point_mask,
                 chunk, wrap=False):
    """Loss table over flattened (trans, rot) pairs; invalid pairs -> +inf."""
    H, W, _ = img.shape
    blocks = pack_bilinear_blocks(img, wrap=wrap)

    def one(t, ypr, valid):
        pose = Pose(t=t, yaw=ypr[0], pitch=ypr[1], roll=ypr[2])
        s = sampling_loss_packed(pose, xyz, rgb, blocks, H, W, point_mask,
                                 wrap=wrap)
        return jnp.where(valid, s, jnp.inf)

    k = pair_t.shape[0]
    tc = pair_t.reshape(k // chunk, chunk, 3)
    yc = pair_ypr.reshape(k // chunk, chunk, 3)
    vc = pair_valid.reshape(k // chunk, chunk)
    scores = jax.lax.map(
        lambda c: jax.vmap(one)(c[0], c[1], c[2]), (tc, yc, vc)
    )
    return scores.reshape(-1)


def _descend(img, xyz, rgb, t0s, ypr0s, lo, hi, point_mask,
             num_iter, lr, patience, factor, table_dtype=jnp.float32,
             wrap=False, trajectory=False, prune=None, multires=None,
             table_arg="auto", start_valid=None):
    H, W, _ = img.shape
    # bf16/u8 tables shrink the descent's gather table 2x/4x (the dominant
    # query cost at large panoramas — docs/PERFORMANCE.md "gather rate vs
    # table size"); lerp/loss stay f32 (ops.sampling.cast_packed_table).
    # Opt-in: the default f32 path is trajectory-exact vs the torch
    # reference.
    blocks = cast_packed_table(pack_bilinear_blocks(img, wrap=wrap),
                               table_dtype)

    prune = _check_prune(prune, num_iter, t0s.shape[0], trajectory)
    multires = _check_multires(multires, num_iter, prune, trajectory)
    if multires is not None:
        # multi-resolution speed mode (solver._descend_single_multires):
        # early iterations on a stride-downsampled table, full-res finish
        k_low, stride = multires
        img_lo = img[::stride, ::stride]
        h_lo, w_lo = int(img_lo.shape[0]), int(img_lo.shape[1])
        blocks_lo = cast_packed_table(
            pack_bilinear_blocks(img_lo, wrap=wrap),
            resolve_descent_table(table_arg, h_lo, w_lo),
        )

        def one_mr(t0, y0):
            params, loss, _, _ = _descend_single_multires(
                blocks_lo, h_lo, w_lo, blocks, H, W, xyz, rgb, t0, y0,
                lo, hi, point_mask, k_low, num_iter, lr, patience, factor,
                wrap,
            )
            return params, loss

        return jax.vmap(one_mr)(t0s, ypr0s)
    if prune is not None:
        # two-phase prune speed mode (solver._descend_pruned): all starts
        # for prune[0] iters, the prune[1] best finish the budget;
        # ``start_valid`` keeps duplicate-best clone rows (the
        # scarce-valid-pair fallback below) out of the survivor slots
        params, losses, _ = _descend_pruned(
            blocks, H, W, xyz, rgb, t0s, ypr0s, lo, hi, point_mask,
            num_iter, lr, patience, factor, wrap, prune[0], prune[1],
            start_valid=start_valid,
        )
        return params, losses

    # the parity-critical loss+Adam+plateau+clamp transition lives in ONE
    # place (solver._make_step), shared with the staged and pruned paths
    step = _make_step(blocks, H, W, xyz, rgb, lo, hi, point_mask,
                      patience, factor, trajectory, wrap)

    def one(t0, y0):
        params = Pose(t=t0, yaw=y0[0], pitch=y0[1], roll=y0[2])
        state = init_adam_plateau(params, lr)
        (params, _), ys = jax.lax.scan(
            step, (params, state), None, length=num_iter
        )
        if trajectory:
            losses, traj = ys
            return params, losses[-1], traj
        return params, ys[-1], None

    if trajectory:
        return jax.vmap(one)(t0s, ypr0s)
    params, losses, _ = jax.vmap(one)(t0s, ypr0s)
    return params, losses


# exported so utils.exec_cache.aot_call can split static from dynamic
# kwargs without re-stating the list (a Compiled is invoked without its
# statics — they are baked into the executable)
LOCALIZE_QUERY_STATICS = (
    "num_intermediate", "num_input", "num_split_h", "num_split_w",
    "num_iter", "lr", "patience", "factor", "masked",
    "grid_chunk", "hist_chunk", "plan_refresh_rgb", "descent_table",
    "seam_wrap", "trajectory", "criterion", "descent_prune",
    "plan_tail", "descent_multires",
)


@functools.partial(jax.jit, static_argnames=LOCALIZE_QUERY_STATICS)
def localize_query(
    img_init: jnp.ndarray,
    img_main: jnp.ndarray,
    xyz: jnp.ndarray,
    rgb: jnp.ndarray,
    trans_grid: jnp.ndarray,  # (T, 3) padded candidate translations
    rot_grid: jnp.ndarray,  # (R, 3) rotation grid
    trans_valid: jnp.ndarray,  # (T,) bool — False for padding rows
    lo: jnp.ndarray,
    hi: jnp.ndarray,
    point_mask: Optional[jnp.ndarray] = None,
    *,
    num_intermediate: int = 20,
    num_input: int = 6,
    num_split_h: int = 4,
    num_split_w: int = 4,
    num_iter: int = 100,
    lr: float = 0.1,
    patience: int = 5,
    factor: float = 0.9,
    masked: bool = False,
    grid_chunk: int = 16,
    hist_chunk: int = 4,
    plan: Optional[GridPlan] = None,
    plan_refresh_rgb: bool = False,
    hist_plan: Optional[HistPlan] = None,
    descent_table: str = "auto",
    seam_wrap: bool = False,
    trajectory: bool = False,
    criterion: str = "loss_histogram",
    descent_prune: Optional[Tuple[int, int]] = None,
    plan_tail: str = "pad",
    descent_multires: Optional[Tuple[int, int]] = None,
) -> LocalizeResult:
    """Localize one panorama end-to-end on device.

    ``trajectory=True`` additionally returns the per-iteration descent
    states — ``(result, traj)`` where ``traj`` is a Pose pytree with
    leading (num_input, num_iter) — the fused-path source for the
    reference's per-iteration GIFs (omniloc.py:60-69), so ``visualize``
    runs no longer forfeit the single-dispatch fused speed.

    The candidate grids come from init.candidates (host, data-dependent
    sizes) padded to static shapes by the caller; everything else never
    leaves the device.

    ``descent_table``: texel dtype for the descent's packed sampling table
    (``auto`` | ``float32`` | ``bfloat16`` | ``uint8``).  The default
    ``auto`` picks bf16 at large (footprint-bound) main images and f32
    otherwise — see ops.sampling.resolve_descent_table; pass ``float32``
    for torch-trajectory-exact parity at every scale.

    ``seam_wrap``: sample the LOSS across the equirect seam at phi=+-pi
    (stage-1 scoring and the descent) instead of the reference's clip
    (SURVEY §7(e); off by default for parity).  A slab ``plan`` must then
    be built with ``wrap=True``.  The stage-2 histogram trim renders
    panoramas rather than sampling them, so it is unaffected.

    ``plan`` (kernels.slab_sampling.build_grid_plan, room-static) routes
    stage 1 through the sorted-slab MXU kernel instead of the XLA gather —
    same scores up to f32 summation order, ~16x faster at large image
    sizes.  Set ``plan_refresh_rgb=True`` when ``rgb`` differs from the
    colors the plan was built with (per-query sharpen_color rebinds).

    ``plan_tail``: what candidate pairs beyond ``plan.n_pairs`` are.
    ``"pad"`` (default) = grid-shape padding (scores +inf, reference
    behavior); ``"xla"`` = real pairs a PARTIAL plan could not cover
    under its HBM budget — they are scored with the XLA gather path and
    composed into the same table (identical ranking semantics; the two
    engines agree up to f32 summation order).  The harness admission
    passes "xla" when it had to truncate a plan to fit ``slab_bytes_cap``
    (stretch-scale rooms, docs/PERFORMANCE.md "Scale stress").

    ``hist_plan`` (init.refine.build_hist_plan, room-static) replaces the
    stage-2 per-candidate z-buffer splat with a gather of precomputed
    winner-bin planes — bit-identical scores (the plane IS the splat's
    decoded output; the query-side mask and histograms are the same code),
    at 2 B/pixel/pair of HBM.  Invalid under per-query colour rebinds
    (``plan_refresh_rgb`` raises); unused when ``criterion='loss'``.

    ``criterion``: ``'loss_histogram'`` (reference parity — the only value
    the reference's branch ladder survives, utils.py:625-627) runs the
    loss-table trim then the histogram trim; ``'loss'`` (working
    extension, same semantics as init.make_input's) selects the top
    ``num_input`` pairs by sampling loss directly and skips stage 2.

    ``descent_prune``: optional ``(prune_iter, prune_keep)`` descent speed
    mode — all starts run ``prune_iter`` iterations, then only the
    ``prune_keep`` current-best finish the budget with their optimizer
    state carried across the split (solver._descend_pruned; measured 1.5x
    on the descent stage at bench scale).  Off by default: the reference
    descends every start for the full budget.  Incompatible with
    ``trajectory=True``.

    ``descent_multires``: optional ``(low_iters, stride)`` descent speed
    mode — the first ``low_iters`` iterations sample a stride-downsampled
    table (the small-table gather regime runs ~2.4x the large-table rate)
    and the rest refine at full resolution with optimizer state carried
    exactly across the switch (solver._descend_single_multires).  Off by
    default (reference parity); incompatible with ``descent_prune`` and
    ``trajectory``.
    """
    check_criterion(criterion)
    pm = point_mask if masked else None
    table_arg = descent_table
    descent_table = resolve_descent_table(
        descent_table, img_main.shape[0], img_main.shape[1]
    )
    T, R = trans_grid.shape[0], rot_grid.shape[0]
    if plan is not None and plan.wrap != seam_wrap:
        raise ValueError(
            f"plan was built with wrap={plan.wrap} but seam_wrap="
            f"{seam_wrap} — its table rows assume the other seam mode"
        )
    if plan is not None and (plan.n_pairs > T * R or plan.n_pairs % R):
        # a stale/mismatched plan would silently truncate or pad into
        # plausible-but-wrong stage-1 rankings — fail loudly at trace time
        raise ValueError(
            f"plan covers {plan.n_pairs} candidate pairs but the grids "
            f"imply {T} trans x {R} rots = {T * R} — the plan was built "
            "for different grids (rebuild it for this room/config)"
        )
    if hist_plan is not None:
        if (hist_plan.height, hist_plan.width) != img_init.shape[:2]:
            raise ValueError(
                f"hist_plan was built for a {hist_plan.height}x"
                f"{hist_plan.width} init image but the query image is "
                f"{img_init.shape[:2]}"
            )
        if hist_plan.n_pairs > T * R or hist_plan.n_pairs % R:
            raise ValueError(
                f"hist_plan covers {hist_plan.n_pairs} pairs but the grids "
                f"imply {T}x{R}={T * R} (stale plan? rebuild for these "
                "grids)"
            )
        if plan_refresh_rgb:
            raise ValueError(
                "hist_plan bakes point colour bins at build time — a "
                "per-query rgb rebind (plan_refresh_rgb) invalidates it; "
                "pass hist_plan=None for colour-rebinding queries"
            )

    # ---- stage 1: brute-force loss table (reference utils.py:462-507)
    pair_t, pair_r = make_pairs(trans_grid, rot_grid)
    pair_valid = jnp.repeat(trans_valid, R)
    if plan is not None:
        # the plan covers the leading n_pairs.  What lies beyond depends on
        # plan_tail: "pad" (default) = grid-shape padding the caller sliced
        # off before planning — scores +inf; "xla" = REAL pairs a PARTIAL
        # plan could not cover under its HBM budget (harness admission at
        # stretch scales) — scored with the XLA gather path so the two
        # stage-1 engines compose into one full table.
        s_all = slab_pair_scores(
            img_init, plan, rgb if plan_refresh_rgb else None
        )[: T * R]
        if plan.n_pairs < T * R:
            if plan_tail == "xla":
                tail_t = pair_t[plan.n_pairs:]
                tail_r = pair_r[plan.n_pairs:]
                tail_valid = pair_valid[plan.n_pairs:]
                padt = (-tail_t.shape[0]) % grid_chunk
                if padt:
                    tail_t = jnp.concatenate(
                        [tail_t, jnp.broadcast_to(tail_t[:1], (padt, 3))]
                    )
                    tail_r = jnp.concatenate(
                        [tail_r, jnp.broadcast_to(tail_r[:1], (padt, 3))]
                    )
                    tail_valid = jnp.concatenate(
                        [tail_valid, jnp.zeros(padt, bool)]
                    )
                s_tail = _grid_scores(
                    img_init, xyz, rgb, tail_t, tail_r, tail_valid, pm,
                    grid_chunk, wrap=seam_wrap,
                )[: T * R - plan.n_pairs]
            else:
                s_tail = jnp.full(
                    T * R - plan.n_pairs, jnp.inf, s_all.dtype
                )
            s_all = jnp.concatenate([s_all, s_tail])
        scores = jnp.where(pair_valid, s_all, jnp.inf)
    else:
        pad = (-pair_t.shape[0]) % grid_chunk
        if pad:
            pair_t = jnp.concatenate(
                [pair_t, jnp.broadcast_to(pair_t[:1], (pad, 3))]
            )
            pair_r = jnp.concatenate(
                [pair_r, jnp.broadcast_to(pair_r[:1], (pad, 3))]
            )
            pair_valid = jnp.concatenate([pair_valid, jnp.zeros(pad, bool)])
        scores = _grid_scores(
            img_init, xyz, rgb, pair_t, pair_r, pair_valid, pm, grid_chunk,
            wrap=seam_wrap,
        )
    # criterion='loss' selects the final num_input directly from the table
    k1 = min(num_intermediate if criterion == "loss_histogram" else num_input,
             T * R)
    # smallest-k via top_k on negated scores (stable, same order as argsort)
    neg_top, idx1 = jax.lax.top_k(-scores, k1)
    # when fewer than k1 valid pairs exist, +inf padding rows slip in here;
    # carry their (in)validity so stage 2 can never promote them
    sel_valid = jnp.isfinite(neg_top)
    t1 = jnp.take(pair_t, idx1, axis=0)
    r1 = jnp.take(pair_r, idx1, axis=0)

    if criterion == "loss":
        t2, r2, final_valid = t1, r1, sel_valid
    else:
        # ---- stage 2: histogram intersection (reference utils.py:510-588)
        if hist_plan is not None:
            # room-static winner-bin planes: gather the selected pairs'
            # planes by PAIR INDEX and histogram them — no per-query splat.
            # idx1 rows beyond n_pairs are +inf-scored padding (sel_valid
            # False masks their scores to -inf below); clamp their gather.
            sel = jnp.take(
                hist_plan.planes,
                jnp.minimum(idx1, hist_plan.n_pairs - 1), axis=0,
            )
            padh = (-k1) % hist_chunk
            if padh:
                sel = jnp.concatenate(
                    [sel, jnp.broadcast_to(sel[:1], (padh, sel.shape[1]))]
                )
            hs = hist_scores_from_planes(
                img_init, sel, num_split_h, num_split_w, hist_chunk
            )[:k1]
        else:
            padh = (-k1) % hist_chunk
            t1p = jnp.concatenate([t1, jnp.broadcast_to(t1[:1], (padh, 3))]) if padh else t1
            r1p = jnp.concatenate([r1, jnp.broadcast_to(r1[:1], (padh, 3))]) if padh else r1
            hs = hist_scores_core(
                img_init, xyz, rgb, t1p, r1p, pm, num_split_h, num_split_w, hist_chunk
            )[:k1]
        hs = jnp.where(sel_valid, hs, -jnp.inf)
        k2 = min(num_input, k1)
        _, idx2 = jax.lax.top_k(hs, k2)
        t2 = jnp.take(t1, idx2, axis=0)
        r2 = jnp.take(r1, idx2, axis=0)
        final_valid = jnp.take(sel_valid, idx2)
    # fewer valid pairs than starts (tiny manual grids): the trailing
    # slots would otherwise descend from garbage padding poses, which can
    # out-descend the genuine candidates and win — duplicate the BEST
    # valid start instead (row 0: both selections rank valid rows first)
    t2 = jnp.where(final_valid[:, None], t2, t2[0])
    r2 = jnp.where(final_valid[:, None], r2, r2[0])

    # ---- stage 3: multi-start descent (reference omniloc.py)
    out = _descend(
        img_main, xyz, rgb, t2, r2, lo, hi, pm, num_iter, lr, patience,
        factor, table_dtype=jnp.dtype(descent_table), wrap=seam_wrap,
        trajectory=trajectory, prune=descent_prune,
        multires=descent_multires, table_arg=table_arg,
        start_valid=final_valid,
    )
    if trajectory:
        params, losses, traj = out
    else:
        params, losses = out
        traj = None
    ypr = jnp.stack([params.yaw, params.pitch, params.roll], axis=-1)
    w = jnp.argmin(losses)
    rot = rot_from_ypr(ypr)
    result = LocalizeResult(
        t=params.t[w], rot=rot[w], loss=losses[w],
        cand_t=params.t, cand_ypr=ypr, cand_loss=losses,
        start_t=t2, start_ypr=r2, winner=w,
    )
    if trajectory:
        return result, traj
    return result


def localize_query_batch(
    img_init_batch: jnp.ndarray,  # (Q, Hi, Wi, 3)
    img_main_batch: jnp.ndarray,  # (Q, Hm, Wm, 3)
    xyz, rgb, trans_grid, rot_grid, trans_valid, lo, hi, point_mask=None,
    **kw,
) -> LocalizeResult:
    """EXPERIMENTAL: localize a BATCH of panoramas of one room in one program.

    Convenience API only (no reference counterpart) — on one chip this is a
    measured PESSIMIZATION (batched scatters/gathers serialize rather than
    co-schedule: 2.1 s/pano at Q=2 vs 1.31 s single; docs/PERFORMANCE.md
    "What did not work" #3).  For throughput use the ('cand','point') mesh
    (parallel.localize_query_sharded) or shard queries across processes.
    Per-query results are identical to :func:`localize_query` (guarded in
    tests/test_pipeline.py).  Returns a LocalizeResult with a leading Q axis.
    """
    def one(ii, im):
        return localize_query(
            ii, im, xyz, rgb, trans_grid, rot_grid, trans_valid, lo, hi,
            point_mask, **kw,
        )

    return jax.vmap(one)(img_init_batch, img_main_batch)

"""Multi-start gradient-descent pose solver.

Unifies the reference's sequential ``omniloc`` (reference:
``omniloc.py:11-102``) and batched ``omniloc_batch`` (``omniloc.py:205-296``)
into ONE jitted program: the descent loop is a ``lax.scan`` and the candidate
dimension is ``jax.vmap`` — per-candidate Adam + plateau-LR state rides in
the scan carry, so all starting points advance in lockstep on-device with no
host round-trips.  (The reference's two modes differ only in loss
normalisation bookkeeping; per-candidate gradients are independent either
way, see SURVEY §3.4.)

The per-step translation clamp to the cloud's quantile box
(omniloc.py:52-58) is applied after each Adam update, to the parameters only
(Adam moments are NOT projected, matching torch semantics where the clamp is
done under no_grad on the param data).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .loss import Pose, pose_rotation, sampling_loss, sampling_loss_packed
from .ops.sampling import (
    cast_packed_table,
    pack_bilinear_blocks,
    resolve_descent_table,
)
from .optim import adam_plateau_step, init_adam_plateau

__all__ = ["SolveResult", "solve", "descend", "evaluate_poses"]


class SolveResult(NamedTuple):
    """All candidates' final states, ordered as the input candidates."""

    t: jnp.ndarray  # (B, 3) final translations
    ypr: jnp.ndarray  # (B, 3) final yaw/pitch/roll
    rot: jnp.ndarray  # (B, 3, 3) final rotation matrices
    loss: jnp.ndarray  # (B,) final losses (evaluated BEFORE the last update,
    #                     matching the reference's returned loss)
    lr: jnp.ndarray  # (B,) final learning rates (diagnostics)


def _check_prune(prune, num_iter: int, n_cand: int, trajectory: bool):
    """Validate/normalise the descent-prune knob.

    Returns None when pruning is a no-op (off, or keeping every candidate,
    or no iterations would be saved); raises on nonsensical combinations.
    """
    if prune is None:
        return None
    k, m = int(prune[0]), int(prune[1])
    if k <= 0 or m >= n_cand or k >= num_iter:
        return None  # nothing to prune / nothing saved — run the full path
    if m < 1:
        raise ValueError(f"descent prune must keep >= 1 candidate, got {m}")
    if trajectory:
        raise ValueError(
            "trajectory=True is incompatible with descent pruning (pruned "
            "candidates have no post-prune states to visualize) — disable "
            "one of the two"
        )
    return (k, m)


def _check_multires(multires, num_iter: int, prune, trajectory: bool):
    """Validate/normalise the multi-resolution descent knob.

    Returns None when it is a no-op (off, or no low-res iterations, or all
    iterations low-res would leave no full-res refinement); raises on
    nonsensical combinations.
    """
    if multires is None:
        return None
    k, s = int(multires[0]), int(multires[1])
    if k <= 0:
        return None
    if s < 2:
        raise ValueError(f"multires stride must be >= 2, got {s}")
    if k >= num_iter:
        raise ValueError(
            f"multires low-res iterations ({k}) must leave full-res "
            f"refinement iterations (num_iter={num_iter})"
        )
    if prune is not None:
        raise ValueError(
            "descent multires and descent prune cannot combine (the prune "
            "split and the resolution split would need a shared schedule) "
            "— enable one of the two"
        )
    if trajectory:
        raise ValueError(
            "trajectory=True is incompatible with multires descent (the "
            "per-iteration losses change scale at the resolution switch, "
            "so the frames would not be comparable) — disable one"
        )
    return (k, s)


def _make_step_for(loss_fn, lo, hi, patience, factor, trajectory=False):
    """One fused loss+Adam+plateau+clamp transition for the descent scan,
    from an arbitrary differentiable pose loss.

    The ONE definition of the parity-critical per-iteration transition
    (reference omniloc.py:44-58) — shared by the staged solver, the fused
    pipeline, the pruned two-phase descent, and (with the point-sharded
    psum loss) the mesh descent in parallel.sharding.
    """
    value_and_grad = jax.value_and_grad(loss_fn)

    def step(carry, _):
        params, state = carry
        loss, grads = value_and_grad(params)
        params, state = adam_plateau_step(
            params, grads, state, loss, patience, factor
        )
        params = params._replace(t=jnp.clip(params.t, lo, hi))
        ys = (loss, params) if trajectory else loss
        return (params, state), ys

    return step


def _make_step(blocks, height, width, xyz, rgb, lo, hi, point_mask,
               patience, factor, trajectory, wrap):
    """The single-device step: the packed-neighbourhood table (built once
    by the caller) makes each loss evaluation one gather instead of four,
    bit-identically."""
    return _make_step_for(
        lambda p: sampling_loss_packed(
            p, xyz, rgb, blocks, height, width, point_mask, wrap=wrap
        ),
        lo, hi, patience, factor, trajectory,
    )


def _descend_single(
    blocks: jnp.ndarray,
    height: int,
    width: int,
    xyz: jnp.ndarray,
    rgb: jnp.ndarray,
    t0: jnp.ndarray,
    ypr0: jnp.ndarray,
    lo: jnp.ndarray,
    hi: jnp.ndarray,
    point_mask: Optional[jnp.ndarray],
    num_iter: int,
    lr: float,
    patience: int,
    factor: float,
    trajectory: bool = False,
    wrap: bool = False,
):
    params = Pose(t=t0, yaw=ypr0[0], pitch=ypr0[1], roll=ypr0[2])
    state = init_adam_plateau(params, lr)
    step = _make_step(blocks, height, width, xyz, rgb, lo, hi, point_mask,
                      patience, factor, trajectory, wrap)

    (params, state), ys = jax.lax.scan(
        step, (params, state), None, length=num_iter
    )
    if trajectory:
        losses, traj = ys
        return params, losses[-1], state.lr, traj
    return params, ys[-1], state.lr, None


def _descend_single_multires(
    blocks_lo, h_lo, w_lo, blocks, height, width, xyz, rgb,
    t0, ypr0, lo, hi, point_mask,
    k_low, num_iter, lr, patience, factor, wrap,
):
    """One candidate's multi-resolution descent (opt-in SPEED mode, no
    reference counterpart — the reference descends at one resolution,
    omniloc.py:44-58).

    The first ``k_low`` iterations sample a stride-downsampled table —
    the small-table gather regime runs ~2.4x the large-table rate
    (docs/PERFORMANCE.md "gather rate vs table size") — then the
    remaining iterations refine on the full-resolution table with the
    Adam + plateau state carried EXACTLY across the switch.  The final
    loss is evaluated at full resolution, so the caller's argmin
    compares all candidates on the same footing.
    """
    params = Pose(t=t0, yaw=ypr0[0], pitch=ypr0[1], roll=ypr0[2])
    state = init_adam_plateau(params, lr)
    step_lo = _make_step(blocks_lo, h_lo, w_lo, xyz, rgb, lo, hi,
                         point_mask, patience, factor, False, wrap)
    step_hi = _make_step(blocks, height, width, xyz, rgb, lo, hi,
                         point_mask, patience, factor, False, wrap)
    (params, state), _ = jax.lax.scan(
        step_lo, (params, state), None, length=k_low
    )
    (params, state), losses = jax.lax.scan(
        step_hi, (params, state), None, length=num_iter - k_low
    )
    return params, losses[-1], state.lr, None


def _descend_pruned(
    blocks, height, width, xyz, rgb, trans0, ypr0, lo, hi, point_mask,
    num_iter, lr, patience, factor, wrap, prune_iter: int, prune_keep: int,
    start_valid=None,
):
    """Two-phase multi-start descent: all B candidates for ``prune_iter``
    steps, then only the ``prune_keep`` lowest-loss survivors finish the
    remaining ``num_iter - prune_iter`` steps (Adam + plateau state carried
    across the split, so a survivor's trajectory is the continuation of its
    phase-1 trajectory).

    This is a SPEED MODE with no reference counterpart (the reference
    descends every candidate for the full budget, omniloc.py:44-58): by the
    prune point the eventual winner is almost always already ahead, and the
    dropped candidates' remaining iterations are the bulk of the descent's
    gather cost.  Rows that were pruned report their phase-1 state/loss in
    the result (ordered as [survivors..., pruned...]); the winner argmin is
    effectively over the survivors.  Note the scan split recompiles the
    loss reduction, so even survivors' trajectories carry f32
    reduction-order noise vs the unpruned program — the same noise class as
    the point-sharded descent's psum (docs/PERFORMANCE.md); use the
    unpruned path when torch-trajectory parity matters.
    """
    step = _make_step(blocks, height, width, xyz, rgb, lo, hi, point_mask,
                      patience, factor, False, wrap)

    def seg1(t0, y0):
        params = Pose(t=t0, yaw=y0[0], pitch=y0[1], roll=y0[2])
        state = init_adam_plateau(params, lr)
        (params, state), losses = jax.lax.scan(
            step, (params, state), None, length=prune_iter
        )
        return params, state, losses[-1]

    params1, state1, loss1 = jax.vmap(seg1)(trans0, ypr0)
    # one stable argsort gives disjoint survivor/pruned sets even on ties.
    # ``start_valid`` masks duplicate-best clone rows (the scarce-valid-pair
    # fallback duplicates the best start into invalid slots, pipeline.py) so
    # a clone's bit-identical phase-1 loss can never claim a survivor slot
    # from a genuinely distinct candidate.
    rank_loss = loss1
    if start_valid is not None:
        rank_loss = jnp.where(start_valid, loss1, jnp.inf)
    order = jnp.argsort(rank_loss)
    keep_idx = order[:prune_keep]
    take = lambda tree: jax.tree.map(lambda x: x[keep_idx], tree)

    def seg2(params, state):
        (params, state), losses = jax.lax.scan(
            step, (params, state), None, length=num_iter - prune_iter
        )
        return params, losses[-1], state.lr

    params2, loss2, lr2 = jax.vmap(seg2)(take(params1), take(state1))

    # scatter back to input-candidate order (pruned rows report their
    # frozen phase-1 state/loss, so per-candidate outputs still align with
    # the starting poses)
    drop_idx = order[prune_keep:]
    inv = jnp.argsort(order)
    cat = lambda a, b: jax.tree.map(
        lambda x, y: jnp.concatenate([x, y], axis=0)[inv], a, b
    )
    params = cat(params2, jax.tree.map(lambda x: x[drop_idx], params1))
    losses = jnp.concatenate([loss2, loss1[drop_idx]])[inv]
    lrs = jnp.concatenate([lr2, state1.lr[drop_idx]])[inv]
    return params, losses, lrs


# exported so utils.exec_cache.aot_call can split static from dynamic
# kwargs (same pattern as pipeline.LOCALIZE_QUERY_STATICS)
DESCEND_STATICS = (
    "num_iter", "lr", "patience", "factor", "masked", "trajectory",
    "table_dtype", "wrap", "prune", "multires",
)


@functools.partial(jax.jit, static_argnames=DESCEND_STATICS)
def descend(
    img: jnp.ndarray,
    xyz: jnp.ndarray,
    rgb: jnp.ndarray,
    trans0: jnp.ndarray,
    ypr0: jnp.ndarray,
    lo: jnp.ndarray,
    hi: jnp.ndarray,
    point_mask: Optional[jnp.ndarray] = None,
    *,
    num_iter: int = 100,
    lr: float = 0.1,
    patience: int = 5,
    factor: float = 0.9,
    masked: bool = False,
    trajectory: bool = False,
    table_dtype: str = "auto",
    wrap: bool = False,
    prune: Optional[Tuple[int, int]] = None,
    multires: Optional[Tuple[int, int]] = None,
    start_valid: Optional[jnp.ndarray] = None,
):
    """Descend all candidates in parallel.

    Args:
      img:    (H, W, 3) query panorama in [0, 1].
      xyz:    (N, 3) world points; rgb: (N, 3) colours.
      trans0: (B, 3) candidate translations; ypr0: (B, 3) candidate ypr.
      lo/hi:  (3,) translation clamp box (order-quantile bounds of the cloud).
      point_mask: (N,) bool or None (pass masked=True when given).
      num_iter/lr/patience/factor: optimisation budget
        (reference defaults: omniloc.py:25-30; shipped configs use
        factor=0.8).
      prune:  optional ``(prune_iter, prune_keep)`` speed mode — after
        ``prune_iter`` steps only the ``prune_keep`` lowest-loss candidates
        finish the budget (state carried exactly across the split; see
        ``_descend_pruned``).  Pruned rows report their frozen phase-1
        state.  Off (None) = reference-parity full descent.
      multires: optional ``(low_iters, stride)`` speed mode — the first
        ``low_iters`` iterations sample a stride-downsampled table (the
        ~2.4x-faster small-table gather regime), the rest refine at full
        resolution with optimizer state carried exactly across the
        switch (``_descend_single_multires``).  Off (None) =
        reference-parity single-resolution descent; incompatible with
        ``prune`` and ``trajectory``.
      start_valid: optional (B,) bool marking duplicate/clone starting rows
        False so they never claim prune survivor slots (only meaningful
        with ``prune``).

    Returns:
      SolveResult over the B candidates.
    """
    pm = point_mask if masked else None
    H, W, _ = img.shape
    # table_dtype="bfloat16"/"uint8" shrinks the gather table (the dominant
    # cost at large panoramas) 2x/4x; lerp/loss stay f32 (see
    # ops.sampling.cast_packed_table).  "auto" (default) picks bf16 only in
    # the footprint-bound large-table regime; f32 is trajectory-exact vs
    # the torch reference and stays the resolution everywhere else.
    table_arg = table_dtype
    table_dtype = resolve_descent_table(table_dtype, H, W)
    blocks = cast_packed_table(pack_bilinear_blocks(img, wrap=wrap),
                               table_dtype)

    prune = _check_prune(prune, num_iter, trans0.shape[0], trajectory)
    multires = _check_multires(multires, num_iter, prune, trajectory)
    if multires is not None:
        k_low, stride = multires
        img_lo = img[::stride, ::stride]
        h_lo, w_lo = int(img_lo.shape[0]), int(img_lo.shape[1])
        # the low-res table resolves its own dtype (small tables stay f32
        # under "auto" even when the full-res table flips to bf16)
        blocks_lo = cast_packed_table(
            pack_bilinear_blocks(img_lo, wrap=wrap),
            resolve_descent_table(table_arg, h_lo, w_lo),
        )

        def one_mr(t0, y0):
            return _descend_single_multires(
                blocks_lo, h_lo, w_lo, blocks, H, W, xyz, rgb, t0, y0,
                lo, hi, pm, k_low, num_iter, lr, patience, factor, wrap,
            )

        params, losses, lrs, traj = jax.vmap(one_mr)(trans0, ypr0)
    elif prune is not None:
        params, losses, lrs = _descend_pruned(
            blocks, H, W, xyz, rgb, trans0, ypr0, lo, hi, pm,
            num_iter, lr, patience, factor, wrap, prune[0], prune[1],
            start_valid=start_valid,
        )
        traj = None
    else:

        def one(t0, y0):
            return _descend_single(
                blocks, H, W, xyz, rgb, t0, y0, lo, hi, pm,
                num_iter, lr, patience, factor, trajectory, wrap,
            )

        params, losses, lrs, traj = jax.vmap(one)(trans0, ypr0)
    ypr = jnp.stack([params.yaw, params.pitch, params.roll], axis=-1)
    rot = pose_rotation(params)
    result = SolveResult(t=params.t, ypr=ypr, rot=rot, loss=losses, lr=lrs)
    if trajectory:
        return result, traj  # traj: Pose pytree with leading (B, num_iter)
    return result


@functools.partial(jax.jit, static_argnames=("masked",))
def evaluate_poses(
    img, xyz, rgb, trans, ypr, point_mask=None, *, masked: bool = False
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One-shot loss evaluation of candidate poses (no descent).

    The working equivalent of the reference's standalone ``sampling_loss``
    evaluator API (omniloc.py:105-157 — imported by its harness but dead);
    returns (losses (B,), rotations (B, 3, 3)).
    """
    pm = point_mask if masked else None

    def one(t, y):
        pose = Pose(t=t, yaw=y[0], pitch=y[1], roll=y[2])
        return sampling_loss(pose, xyz, rgb, img, pm)

    losses = jax.vmap(one)(trans, ypr)
    from .ops.rotation import rot_from_ypr

    return losses, rot_from_ypr(ypr)


def solve(
    img,
    xyz,
    rgb,
    trans0,
    ypr0,
    lo,
    hi,
    point_mask=None,
    **kw,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, SolveResult]:
    """Run the descent and select the minimum-loss candidate.

    Returns (t (3,), R (3,3), loss ()) of the winner plus the full
    SolveResult (the reference's argmin over results is at
    ``localize.py:231-233``).
    """
    res = descend(
        img,
        xyz,
        rgb,
        trans0,
        ypr0,
        lo,
        hi,
        point_mask,
        masked=point_mask is not None,
        **kw,
    )
    k = jnp.argmin(res.loss)
    return res.t[k], res.rot[k], res.loss[k], res

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

from ..init.refine import hist_scores_core
from ..loss import Pose
from ..ops.rotation import rot_from_ypr
from ..ops.sampling import pack_bilinear_blocks
from ..pipeline import LocalizeResult
from .sharding import _point_sharded_loss, descent_local, shard_map

__all__ = ["localize_query_sharded", "shard_cloud"]


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


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "num_intermediate", "num_input", "num_split_h", "num_split_w",
        "num_iter", "lr", "patience", "factor", "grid_chunk", "hist_chunk",
        "descent_table",
    ),
)
def _localize_query_sharded_jit(
    img_init, img_main, xyz, rgb, trans_grid, rot_grid, trans_valid,
    lo, hi, point_mask,
    *, mesh, num_intermediate, num_input, num_split_h, num_split_w,
    num_iter, lr, patience, factor, grid_chunk, hist_chunk,
    descent_table="float32",
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
        blocks = pack_bilinear_blocks(img)

        def one(t, ypr, valid):
            pose = Pose(t=t, yaw=ypr[0], pitch=ypr[1], roll=ypr[2])
            s = _point_sharded_loss(pose, xyz_l, rgb_l, blocks, H, W, pm_l)
            return jnp.where(valid, s, jnp.inf)

        k = pt_l.shape[0]
        tc = pt_l.reshape(k // grid_chunk, grid_chunk, 3)
        yc = pr_l.reshape(k // grid_chunk, grid_chunk, 3)
        vc = pv_l.reshape(k // grid_chunk, grid_chunk)
        s = jax.lax.map(
            lambda c: jax.vmap(one)(c[0], c[1], c[2]), (tc, yc, vc)
        )
        return s.reshape(-1)

    scores = shard_map(
        stage1,
        mesh=mesh,
        in_specs=cloud_specs + (P("cand", None), P("cand", None), P("cand")),
        out_specs=P("cand"),
    )(img_init, xyz, rgb, point_mask, pair_t, pair_r, pair_valid)

    k1 = min(num_intermediate, T * R)
    neg_top, idx1 = jax.lax.top_k(-scores, k1)
    # fewer than k1 valid pairs -> +inf rows slip in; carry their
    # (in)validity so stage 2 can never promote them (pipeline.py parity)
    sel_valid = jnp.isfinite(neg_top)
    t1 = jnp.take(pair_t, idx1, axis=0)
    r1 = jnp.take(pair_r, idx1, axis=0)

    # ---- stage 2: histogram intersection, 'cand'-sharded candidates,
    # 'point'-sharded render combined by pmin
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

    # ---- stage 3: sharded multi-start descent
    t2p = _pad_clone_rows(t2, n_cand)
    r2p = _pad_clone_rows(r2, n_cand)
    t, ypr, losses, lrs = shard_map(
        functools.partial(
            descent_local,
            num_iter=num_iter, lr=lr, patience=patience, factor=factor,
            table_dtype=descent_table,
        ),
        mesh=mesh,
        in_specs=cloud_specs + (P("cand", None), P("cand", None), P(), P()),
        out_specs=(P("cand", None), P("cand", None), P("cand"), P("cand")),
    )(img_main, xyz, rgb, point_mask, t2p, r2p, lo, hi)
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
    factor: float = 0.8,
    grid_chunk: int = 16,
    hist_chunk: int = 4,
    descent_table: str = "float32",
) -> LocalizeResult:
    """Localize one panorama end-to-end over a ('cand', 'point') device mesh.

    Same contract as pipeline.localize_query (candidate grids padded to
    static shapes by the caller; returns the same LocalizeResult), with the
    cloud padded here to a 'point'-axis multiple (mask=False padding) and all
    three stages executed SPMD across the mesh.
    """
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

    return _localize_query_sharded_jit(
        img_init, img_main, xyz, rgb, trans_grid, rot_grid, trans_valid,
        lo, hi, point_mask,
        mesh=mesh, num_intermediate=num_intermediate, num_input=num_input,
        num_split_h=num_split_h, num_split_w=num_split_w, num_iter=num_iter,
        lr=lr, patience=patience, factor=factor,
        grid_chunk=grid_chunk, hist_chunk=hist_chunk,
        descent_table=descent_table,
    )

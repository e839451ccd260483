"""Sorted-slab MXU kernel for stage-1 candidate-grid scoring.

The init loss table (reference ``trim_input_loss``, utils.py:462-507) is the
hottest forward in the framework: |trans|x|rot| candidate poses each sample
the init panorama at every cloud point.  As plain XLA this is a gather from
the packed sampling table, and TPU gather throughput COLLAPSES with table
size (measured: 2.7e8 rows/s at 6 MB -> 4.5e7 at 100 MB; docs/PERFORMANCE.md
"gather rate vs table size") — at OmniScenes resolution stage 1 alone costs
~2.2 s/query.

Key observation: stage-1 sample locations are ROOM-STATIC.  The candidate
grid and the cloud are fixed per room, so every (pose, point) -> (table row,
bilinear fractions) pair is known before any query arrives; only the image
CONTENT changes.  That admits a data layout XLA's gather can never reach:

  * split candidate pairs into groups of 128 and sort each group's
    (pair, point) samples by table row — group density (~128 x N / rows)
    makes every run of ~1024 sorted samples span a tiny table window;
  * pad sample runs so each block lies inside ONE 512-row aligned window
    (scatter once per room);
  * per block, the kernel DMAs the 512-row window into VMEM and gathers via
    a one-hot MXU matmul (the TPU's cross-lane router), fuses the bilinear
    lerp + color loss, and accumulates per-candidate loss/count with a
    second one-hot matmul.

Exactness: the table is pre-split into three bf16 parts whose f32 sum
reconstructs every element exactly (24-bit mantissa = 3 x 8; verified in
tests), and a one-hot times an exactly-representable operand is an exact
selection, so the gathered texels are BIT-IDENTICAL to jnp.take.  The loss
sum differs from the vmapped reduction only in f32 accumulation order
(~1e-6 relative), which ranking is insensitive to.

Measured on TPU v5e at OmniScenes scale: 749 M samples/s vs 46 M rows/s for
the XLA gather path (16x); stage-1 2.2 s -> ~0.15 s.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..loss import Pose, transform_cloud
from ..ops.projection import spherical_project
from ..ops.sampling import pack_bilinear_blocks, packed_rows_and_weights

__all__ = [
    "GridPlan",
    "PlanOverBudget",
    "make_pairs",
    "build_grid_plan",
    "slab_pair_scores",
    "slab_group_partials",
    "plan_required_blocks",
    "nb_bucket",
    "default_plan_bytes_cap",
    "plan_exact_bytes",
    "resolve_plan_geometry",
    "WINDOW",
    "BLOCK",
    "GROUP",
]

WINDOW = 512  # default table rows per aligned slab window (see resolver)
BLOCK = 1024  # default samples per kernel block (see resolver)
GROUP = 128   # candidate pairs per group (one-hot accumulator width)


def resolve_plan_geometry(n_points: int, height: int, width: int,
                          window=None, block=None):
    """(window, block) for a plan — auto-tuned to SAMPLE DENSITY when unset.

    The kernel's per-block cost is the window one-hot (WINDOW x BLOCK
    compares + 3 bf16 (12, WINDOW) @ (WINDOW, BLOCK) dots), so smaller
    windows are cheaper PER BLOCK — but sparse tables (few points per
    window row) then leave blocks underfilled and block padding blows the
    plan up.  Measured sweep on TPU v5e (round 3, exactness-checked):

      dense  (60k pts / 131k-row Stanford table, density 0.5):
        (128, 1024) 38.8 ms vs shipped (512, 1024) 57.9 ms  (-33%)
      sparse (60k pts / 2.1M-row OmniScenes table, density 0.03):
        (256, 512) 134 ms vs (512, 1024) 145 ms (-8%); 128-row windows
        REGRESS (164-208 ms) with up to 2x plan bytes.

    The density threshold 0.25 splits the measured regimes with margin
    (padded-bucket point counts put the bench at ~0.5 and every
    OmniScenes-scale workload below 0.13).  Explicit values override.
    """
    if window is None and block is None:
        density = n_points / float(_table_rows(height, width))
        return (128, 1024) if density >= 0.25 else (256, 512)
    return (int(window or WINDOW), int(block or BLOCK))

# Fallback HBM budget for a plan's sorted streams when the backend reports
# no memory stats — the harness's ``slab_bytes_cap`` default and
# eval_synth's ``--slab-cap`` default both route through
# :func:`default_plan_bytes_cap` so the auto policies can't drift apart.
# Sized for a 16 GB chip: a ~9 GB plan leaves room for the sampling tables
# (<=400 MB at 4K), stage-2 render buffers (~2 GB at 4K x 56 candidates)
# and workspace.
DEFAULT_PLAN_BYTES_CAP = 9 * 10**9

# Measured working split on a 16 GB v5e: 9 GB plan / 16 GB HBM.  The same
# fraction scales the budget to whatever the device actually reports.
_PLAN_HBM_FRACTION = 9.0 / 16.0


def default_plan_bytes_cap(device=None) -> int:
    """HBM-derived budget for a plan's sorted streams.

    9/16 of the device's reported memory limit (the measured working split
    on a 16 GB v5e: ~9 GB plan + sampling tables + stage-2 render buffers +
    workspace), falling back to :data:`DEFAULT_PLAN_BYTES_CAP` when the
    backend exposes no ``memory_stats`` (CPU, some plugin frontends).
    """
    try:
        if device is None:
            device = jax.devices()[0]
        stats = device.memory_stats()
        limit = (stats or {}).get("bytes_limit") or (stats or {}).get(
            "bytes_reservable_limit"
        )
    except Exception:
        limit = None
    if not limit:
        return DEFAULT_PLAN_BYTES_CAP
    return int(limit * _PLAN_HBM_FRACTION)


class PlanOverBudget(RuntimeError):
    """Raised by build_grid_plan when the EXACT plan size exceeds bytes_cap.

    The pre-build :func:`plan_bytes_estimate` uses a fixed 1.25 padding
    factor, but real padding is data-dependent (per-window BLOCK rounding
    plus the geometric nb bucket) and can exceed it; this check runs after
    the sizing pass, when the block count is exact, so a plan can never
    silently blow the HBM budget it was admitted under.
    """

    def __init__(self, exact_bytes: int, cap: int):
        super().__init__(
            f"slab plan needs {exact_bytes / 1e9:.2f} GB "
            f"(cap {cap / 1e9:.2f} GB)"
        )
        self.exact_bytes = exact_bytes
        self.cap = cap


def plan_exact_bytes(n_groups: int, nb: int, compact: bool,
                     block: int = BLOCK, quant: bool = False) -> int:
    """Exact HBM footprint of a plan once the padded block count is known."""
    per = 8 if quant else (16 if compact else 32)
    return n_groups * (nb * block * per + nb * 4)

# field order in the packed (8, BLOCK) sample block; _F_PID rides the spare
# sublane as an exactly-representable small int (cloud sizes < 2^24)
_F_LIDX, _F_WX1, _F_WY1, _F_TR, _F_TG, _F_TB, _F_CID, _F_PID = range(8)


class GridPlan:
    """Room-static sorted sample streams for :func:`slab_pair_scores`.

    fields:  tuple of per-group (NB, 8, BLOCK) f32 — packed per-sample
             fields (in-window row, x/y fractions, target rgb,
             pair-in-group id, source point id); padding samples carry
             lidx/cid sentinels and contribute nothing.  Kept per group
             (not stacked) so plans never need one huge contiguous HBM
             allocation and the kernel runs one pallas_call per group.
             COMPACT plans store geometry (NB, 3, BLOCK) [lidx*128+cid,
             wx1, wy1] with the payload SPLIT into ``tps`` (NB, BLOCK) —
             16 B/sample total — where ``tp`` is the target rgb packed as
             a 24-bit integer r<<16|g<<8|b (lossless for uint8-sourced
             cloud colors, the loaders' output) or, for refresh-capable
             plans (``tp_is_pid``), the source point id.  The split means
             a per-query sharpen re-bake copies ONLY the 4 B/sample
             target stream, not the whole plan (round 3; previously the
             rebake doubled the plan's working HBM).
    tps:     tuple of per-group (NB, 1, BLOCK) f32 target/pid streams
             (compact plans only; empty for f32 plans).
    windows: tuple of per-group (NB,) int32 — aligned table-window index
             per block.
    n_pairs: static int — number of leading candidate pairs the plan covers
             (callers slice grid padding off before planning; pairs beyond
             n_pairs must be masked invalid by the consumer).
    height/width: static ints — the init-image shape the plan's table rows
             were computed for (0 = unknown, for plans built before this
             field existed); consumers reject a plan whose shape disagrees
             with the image they are scoring.

    Registered as a pytree with ``n_pairs``/``compact``/``tp_is_pid``/
    ``height``/``width`` as static aux data so plans can cross jit
    boundaries while score shapes stay static.
    """

    def __init__(self, fields, windows, n_pairs: int,
                 compact: bool = False, tp_is_pid: bool = False,
                 height: int = 0, width: int = 0, wrap: bool = False,
                 window: int = WINDOW, block: int = BLOCK,
                 quant: bool = False, tps=()):
        self.fields = tuple(fields)
        self.windows = tuple(windows)
        self.tps = tuple(tps)
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
            sum(f.nbytes for f in self.fields)
            + sum(w.nbytes for w in self.windows)
            + sum(t.nbytes for t in self.tps)
        )


jax.tree_util.register_pytree_node(
    GridPlan, GridPlan.tree_flatten, GridPlan.tree_unflatten
)


def plan_bytes_estimate(
    n_pairs: int, n_points: int, compact: bool = False, quant: bool = False
) -> int:
    """Approximate HBM footprint of a plan before building it (32 B/sample
    f32, 16 B compact, 8 B quantized, plus ~25% block padding) — lets auto
    mode skip planning workloads whose streams would crowd out the rest of
    the query (e.g. 1M-point clouds with 1.4k pairs would need ~45 GB even
    compact)."""
    groups = (n_pairs + GROUP - 1) // GROUP
    per = 8 if quant else (16 if compact else 32)
    return int(groups * GROUP * n_points * per * 1.25)


def slab_worthwhile(
    n_pairs: int, n_points: int, height: int, width: int, refresh: bool,
    compact: bool = False,
) -> bool:
    """Crude per-query cost model from the measured rates (PERFORMANCE.MD):
    XLA gather stage 1 vs kernel + (optionally) the per-query target re-bake
    that sharpen_color forces.  The re-bake is three small-table gathers
    over every padded sample slot for f32 plans — which swamps the kernel
    win at small images — but only ONE packed gather for compact plans."""
    table_mb = _table_rows(height, width) * 48 / 1e6
    xla_rate = float(np.interp(table_mb, [6.0, 25.0, 100.0],
                               [2.7e8, 1.1e8, 4.5e7]))
    groups = (n_pairs + GROUP - 1) // GROUP
    samples = groups * GROUP * n_points * 1.25
    xla_cost = n_pairs * n_points / xla_rate
    refresh_gathers = (1 if compact else 3) if refresh else 0
    slab_cost = samples / 7.5e8 + refresh_gathers * samples / 2.7e8
    return slab_cost < 0.7 * xla_cost


def make_pairs(trans_grid, rot_grid):
    """Flattened trans-major (t, ypr) pairs — the stage-1 candidate order.

    One definition shared by the XLA scoring path (pipeline._grid_scores)
    and the plan builder so both score the same pair list in the same order
    (parity anchor: reference utils.py:481-499 loop order).
    """
    T, R = trans_grid.shape[0], rot_grid.shape[0]
    pair_t = jnp.repeat(trans_grid, R, axis=0)
    pair_r = jnp.tile(rot_grid, (T, 1))
    return pair_t, pair_r


def _table_rows(height: int, width: int) -> int:
    return (height + 1) * (width + 1)


def _rpad(height: int, width: int, window: int = WINDOW) -> int:
    rows = _table_rows(height, width)
    return ((rows + window - 1) // window) * window


def _nb_bucket(n: int) -> int:
    """Geometric block-count buckets (shape reuse across rooms)."""
    b = 256
    while b < n:
        if b * 3 // 2 >= n:
            return b * 3 // 2
        b *= 2
    return b


def _project_group(xyz, point_mask, t_g, ypr_g, height, width, wrap=False):
    """Packed rows + fractions for one candidate group — the exact query-path
    geometry ops, so floors and fractions match the XLA path bit-for-bit.
    Masked-out points land on row 0 (the zero border) with zero fractions."""

    def one(t, ypr):
        pose = Pose(t=t, yaw=ypr[0], pitch=ypr[1], roll=ypr[2])
        cam = transform_cloud(pose, xyz)
        coords = spherical_project(cam)
        return packed_rows_and_weights(coords, height, width, wrap=wrap)

    row, wx1, wy1 = jax.vmap(one)(t_g, ypr_g)  # (GROUP, N) each
    if point_mask is not None:
        row = jnp.where(point_mask[None], row, 0)
        wx1 = jnp.where(point_mask[None], wx1, 0.0)
        wy1 = jnp.where(point_mask[None], wy1, 0.0)
    return row, wx1, wy1


@functools.partial(jax.jit, static_argnames=("height", "width", "wrap",
                                             "window", "block"))
def _plan_sizes(xyz, point_mask, pair_t, pair_ypr, *, height, width,
                wrap=False, window=WINDOW, block=BLOCK):
    """Padded block count per group (no sort — window histograms).

    ``pair_t``/``pair_ypr`` are (n_groups, GROUP, 3); one program sizes every
    group (the projection's unused fractions dead-code-eliminate)."""
    n_win = _rpad(height, width, window) // window

    def one(t_g, ypr_g):
        row, _, _ = _project_group(xyz, point_mask, t_g, ypr_g, height, width,
                                   wrap)
        win = row.reshape(-1) // window
        counts = jnp.zeros(n_win, jnp.int32).at[win].add(1)
        return jnp.sum((counts + block - 1) // block)

    return jax.vmap(one)(pair_t, pair_ypr)


def plan_required_blocks(
    xyz, point_mask, trans_grid, rot_grid, height: int, width: int,
    wrap: bool = False, window=None, block=None,
) -> int:
    """Raw (pre-bucket) max padded block count a plan for these inputs needs.

    Used by the sharded-plan builder to size every point shard's plan to
    one common ``nb`` (bucket the max of the per-shard values with
    :func:`nb_bucket`, then pass ``nb=`` to :func:`build_grid_plan`).
    """
    pair_t, pair_r = make_pairs(trans_grid, rot_grid)
    P = pair_t.shape[0]
    pad = (-P) % GROUP
    if pad:
        pair_t = jnp.concatenate(
            [pair_t, jnp.broadcast_to(pair_t[:1], (pad, 3))]
        )
        pair_r = jnp.concatenate(
            [pair_r, jnp.broadcast_to(pair_r[:1], (pad, 3))]
        )
    n_groups = pair_t.shape[0] // GROUP
    window, block = resolve_plan_geometry(
        xyz.shape[0], height, width, window, block
    )
    totals = _plan_sizes(
        xyz, point_mask,
        pair_t.reshape(n_groups, GROUP, 3), pair_r.reshape(n_groups, GROUP, 3),
        height=height, width=width, wrap=wrap, window=window, block=block,
    )
    return int(np.max(np.asarray(totals)))


def nb_bucket(n: int) -> int:
    """Public alias of the geometric block-count bucket (shape reuse)."""
    return _nb_bucket(n)


def pack_rgb24(rgb: jnp.ndarray) -> jnp.ndarray:
    """(N, 3) colors in [0, 1] -> (N,) f32 of exact 24-bit ints r<<16|g<<8|b.

    Lossless round-trip for uint8-sourced colors (the data loaders emit
    i/255): r*255 rounds back to i exactly, and ints < 2^24 are exact in
    f32.  Arbitrary float colors quantize to 1/255 steps (clipped)."""
    q = jnp.round(jnp.clip(rgb, 0.0, 1.0) * 255.0)
    return q[:, 0] * 65536.0 + q[:, 1] * 256.0 + q[:, 2]


@functools.partial(
    jax.jit,
    static_argnames=("height", "width", "nb", "compact", "tp_is_pid", "wrap",
                     "window", "block", "quant"),
)
def _plan_group(xyz, rgb, point_mask, t_g, ypr_g, *, height, width, nb,
                compact=False, tp_is_pid=False, wrap=False,
                window=WINDOW, block=BLOCK, quant=False):
    """Sorted, window-padded sample blocks for one candidate group."""
    n_win = _rpad(height, width, window) // window
    N = xyz.shape[0]
    row, wx1, wy1 = _project_group(xyz, point_mask, t_g, ypr_g, height, width,
                                   wrap)
    cid = jnp.broadcast_to(
        jnp.arange(GROUP, dtype=jnp.float32)[:, None], (GROUP, N)
    )
    pid = jnp.broadcast_to(
        jnp.arange(N, dtype=jnp.float32)[None], (GROUP, N)
    )
    if quant:
        if not compact:
            raise ValueError("quant=True is a sub-mode of compact plans "
                             "(pass compact=True)")
        if window > 256:
            raise ValueError(
                "q8 plans need window <= 256 (the 9-bit lidx field's "
                f"sentinel 511 must never name a real row), got {window}"
            )
        # pre-pack cid|wx|wy into ONE int32 payload BEFORE the sort: the
        # device sort dominates plan-build time and its cost scales with
        # operand count, so q8 sorts (key + 2 payloads) where compact
        # sorts (key + 4) — the quantization q8 commits to anyway makes
        # the pack lossless here
        tp1 = pid if tp_is_pid else jnp.broadcast_to(
            pack_rgb24(rgb)[None], (GROUP, N)
        )
        pp = (
            (jnp.broadcast_to(
                jnp.arange(GROUP, dtype=jnp.int32)[:, None], (GROUP, N)
            ) << 16)
            | (jnp.round(wx1 * 255.0).astype(jnp.int32) << 8)
            | jnp.round(wy1 * 255.0).astype(jnp.int32)
        )
        vals = (pp.reshape(-1), tp1.reshape(-1))
    elif compact:
        # one payload slot: point id (refresh-capable) or packed target
        tp1 = pid if tp_is_pid else jnp.broadcast_to(
            pack_rgb24(rgb)[None], (GROUP, N)
        )
        vals = (wx1.reshape(-1), wy1.reshape(-1), cid.reshape(-1),
                tp1.reshape(-1))
    else:
        tgt = jnp.broadcast_to(rgb.T[:, None, :], (3, GROUP, N))
        vals = (
            wx1.reshape(-1), wy1.reshape(-1),
            tgt[0].reshape(-1), tgt[1].reshape(-1), tgt[2].reshape(-1),
            cid.reshape(-1), pid.reshape(-1),
        )

    srt = jax.lax.sort((row.reshape(-1),) + vals, num_keys=1)
    row_s = srt[0]

    win = row_s // window
    edges = jnp.arange(n_win + 1, dtype=row_s.dtype) * window
    starts = jnp.searchsorted(row_s, edges, side="left")
    counts = jnp.diff(starts)
    blocks_w = (counts + block - 1) // block
    block_off = jnp.concatenate(
        [jnp.zeros(1, blocks_w.dtype), jnp.cumsum(blocks_w)[:-1]]
    )

    i = jnp.arange(row_s.shape[0], dtype=jnp.int32)
    positions = i - starts[win] + block_off[win] * block
    lidx = (row_s - win * window).astype(jnp.float32)

    if quant:
        # q8 layout: ONE int32 per sample — lidx(9) | cid(7) | wx(8) | wy(8)
        # — plus the split 4 B target/pid stream = 8 B/sample, half the
        # compact plan.  Fractions quantize to 1/255 steps (score shift
        # ~1e-3 relative, ranking-insensitive; admission only reaches q8
        # where the alternative is the COLLAPSED XLA gather tail).  The
        # pad sentinel lidx=511 can never name a real row (window <= 256
        # enforced above), so the kernel's window one-hot selects nothing
        # and pads contribute neither loss nor count.
        _, pp_s, tp_s = srt
        li_i = (row_s - win * window).astype(jnp.int32)
        g = (li_i << 23) | pp_s
        flat = (
            jnp.full(nb * block, 511 << 23, jnp.int32)
            .at[positions].set(g)
        )
        fields = flat.reshape(nb, 1, block)
        tps = (
            jnp.zeros(nb * block, jnp.float32)
            .at[positions].set(tp_s)
            .reshape(nb, 1, block)
        )
        windows = jnp.zeros(nb, jnp.int32).at[positions // block].max(win)
        return fields, windows, tps

    if compact:
        _, wx_s, wy_s, cid_s, tp_s = srt
        # lc = lidx*128 + cid: both exact small ints in f32; the kernel
        # decodes with power-of-two scalings (exact). Pad sentinel lc=-1
        # floors to lidx=-1 (selects no table row -> s=0 -> valid=0, so the
        # decoded cid can never contribute loss OR count).  The target/pid
        # stream is kept SPLIT from the geometry so a per-query re-bake
        # copies only it (round 3).
        payload = jnp.stack(
            (lidx * float(GROUP) + cid_s, wx_s, wy_s), axis=-1
        )
        empty = jnp.array([-1, 0, 0], jnp.float32)
        width_f = 3
        # (NB, 1, BLOCK): the middle singleton keeps Mosaic's block-shape
        # rule satisfied (second-to-last block dim == array dim)
        tps = (
            jnp.zeros(nb * block, jnp.float32)
            .at[positions].set(tp_s)
            .reshape(nb, 1, block)
        )
    else:
        payload = jnp.stack((lidx,) + srt[1:], axis=-1)  # (M, 8)
        # padding slots carry lidx=-1 / cid=-1 sentinels: both one-hots in
        # the kernel then select nothing, so pads can never contribute (a
        # pad inside a non-zero window would otherwise read that window's
        # first row at full tap00 weight and pollute pair 0)
        empty = jnp.array([-1, 0, 0, 0, 0, 0, -1, 0], jnp.float32)
        width_f = 8
        tps = None
    flat = (
        jnp.broadcast_to(empty, (nb * block, width_f))
        .at[positions].set(payload)
    )
    fields = flat.reshape(nb, block, width_f).transpose(0, 2, 1)
    windows = jnp.zeros(nb, jnp.int32).at[positions // block].max(win)
    return fields, windows, tps


def build_grid_plan(
    xyz: jnp.ndarray,
    rgb: jnp.ndarray,
    point_mask: Optional[jnp.ndarray],
    trans_grid: jnp.ndarray,
    rot_grid: jnp.ndarray,
    height: int,
    width: int,
    compact: bool = False,
    tp_is_pid: bool = False,
    bytes_cap: Optional[int] = None,
    nb: Optional[int] = None,
    wrap: bool = False,
    window: Optional[int] = None,
    block: Optional[int] = None,
    quant: bool = False,
) -> GridPlan:
    """Build the room-static sorted sample streams (once per room+image size).

    Callers should slice grid-shape padding off ``trans_grid`` first (dead
    pairs cost plan memory and kernel time); the consumer masks any pairs
    beyond ``plan.n_pairs`` itself.

    ``bytes_cap``: raise :class:`PlanOverBudget` if the EXACT plan size
    (known after the sizing pass, before any stream is materialised)
    exceeds this — the auto policy's pre-build estimate uses a fixed
    padding factor that data-dependent padding can exceed.

    ``nb``: force the padded block count (must cover this plan's sizing —
    callers building per-shard plans for the mesh pass the bucketed global
    maximum so all shards share one static shape; see
    parallel.fused.shard_grid_plan).

    ``window``/``block``: kernel geometry (table rows per VMEM window /
    samples per kernel block).  Default None auto-tunes to sample density
    (:func:`resolve_plan_geometry` — measured 8-33%% faster stage 1 than
    one fixed geometry); when forcing ``nb`` the caller must pass the same
    geometry its sizing used.

    Host driver around two jitted phases: a histogram-only sizing pass whose
    scalar result (max padded block count, bucketed) fixes the static shapes,
    then one sort+scatter program per candidate group — groups are built
    sequentially so peak memory stays ~one group's intermediates above the
    plan itself.
    """
    pair_t, pair_r = make_pairs(trans_grid, rot_grid)
    P = pair_t.shape[0]
    pad = (-P) % GROUP
    if pad:
        pair_t = jnp.concatenate([pair_t, jnp.broadcast_to(pair_t[:1], (pad, 3))])
        pair_r = jnp.concatenate([pair_r, jnp.broadcast_to(pair_r[:1], (pad, 3))])
    n_groups = pair_t.shape[0] // GROUP
    window, block = resolve_plan_geometry(
        xyz.shape[0], height, width, window, block
    )

    def group_args(g):
        return (
            pair_t[g * GROUP:(g + 1) * GROUP],
            pair_r[g * GROUP:(g + 1) * GROUP],
        )

    if nb is None:
        totals = _plan_sizes(
            xyz, point_mask,
            pair_t.reshape(n_groups, GROUP, 3),
            pair_r.reshape(n_groups, GROUP, 3),
            height=height, width=width, wrap=wrap,
            window=window, block=block,
        )
        nb = _nb_bucket(int(np.max(np.asarray(totals))))
    if quant and not compact:
        raise ValueError("quant=True is a sub-mode of compact plans")
    if bytes_cap is not None:
        exact = plan_exact_bytes(n_groups, nb, compact, block, quant=quant)
        if exact > bytes_cap:
            raise PlanOverBudget(exact, bytes_cap)

    fields, windows, tps = [], [], []
    for g in range(n_groups):
        f, w, t = _plan_group(
            xyz, rgb, point_mask, *group_args(g),
            height=height, width=width, nb=nb,
            compact=compact, tp_is_pid=tp_is_pid, wrap=wrap,
            window=window, block=block, quant=quant,
        )
        fields.append(f)
        windows.append(w)
        if t is not None:
            tps.append(t)
    return GridPlan(fields=fields, windows=windows, n_pairs=P,
                    compact=compact, tp_is_pid=tp_is_pid,
                    height=height, width=width, wrap=wrap,
                    window=window, block=block, quant=quant, tps=tps)


def _score_core(t1, t2, t3, li, x1, y1, tgt, cidf, *, window):
    """Shared scoring core of both kernel variants (exactness-critical).

    (li, x1, y1, tgt, cidf) are (1|3, block) f32 rows; returns the (8, GROUP)
    output block: per-pair loss sum + valid count (+ zero padding rows).
    """
    block = li.shape[-1]
    oh = (
        jax.lax.broadcasted_iota(jnp.int32, (window, block), 0)
        == li.astype(jnp.int32)
    ).astype(jnp.bfloat16)
    dn = (((1,), (0,)), ((), ()))
    # exact f32 gather: 3-way bf16 table split, one-hot selection per part
    v = (jax.lax.dot_general(t1[:], oh, dn, preferred_element_type=jnp.float32)
         + jax.lax.dot_general(t2[:], oh, dn, preferred_element_type=jnp.float32)
         + jax.lax.dot_general(t3[:], oh, dn, preferred_element_type=jnp.float32))
    x0 = 1.0 - x1
    y0 = 1.0 - y1
    # same tap/term order as ops.sampling.bilinear_sample_packed
    s = (v[0:3] * (x0 * y0) + v[3:6] * (x1 * y0)
         + v[6:9] * (x0 * y1) + v[9:12] * (x1 * y1))       # (3, BLOCK)
    valid = jnp.sum((s == 0.0).astype(jnp.int32), axis=0, keepdims=True) != 3
    d = s - tgt
    sq = jnp.sum(d * d, axis=0, keepdims=True)
    pos = sq > 0
    per = jnp.sqrt(jnp.where(pos, sq, 1.0)) * pos          # safe_norm
    contrib = per * valid
    ohc = (
        jax.lax.broadcasted_iota(jnp.int32, (GROUP, block), 0)
        == cidf.astype(jnp.int32)
    ).astype(jnp.bfloat16)
    dnc = (((1,), (1,)), ((), ()))
    # exact accumulation: 3-way bf16 split of the contributions
    c1 = contrib.astype(jnp.bfloat16)
    c2 = (contrib - c1.astype(jnp.float32)).astype(jnp.bfloat16)
    c3 = (contrib - c1.astype(jnp.float32) - c2.astype(jnp.float32)).astype(jnp.bfloat16)
    acc = (jax.lax.dot_general(c1, ohc, dnc, preferred_element_type=jnp.float32)
           + jax.lax.dot_general(c2, ohc, dnc, preferred_element_type=jnp.float32)
           + jax.lax.dot_general(c3, ohc, dnc, preferred_element_type=jnp.float32))
    cnt = jax.lax.dot_general(
        valid.astype(jnp.bfloat16), ohc, dnc, preferred_element_type=jnp.float32
    )
    return jnp.concatenate(
        [acc, cnt, jnp.zeros((6, GROUP), jnp.float32)], axis=0
    )


def _kernel(w_ref, t1, t2, t3, f_ref, out_ref, *, window):
    f = f_ref[0]                         # (8, block) f32
    out_ref[0] = _score_core(
        t1, t2, t3,
        f[_F_LIDX:_F_LIDX + 1],
        f[_F_WX1:_F_WX1 + 1], f[_F_WY1:_F_WY1 + 1],
        f[_F_TR:_F_TB + 1],
        f[_F_CID:_F_CID + 1],
        window=window,
    )


def _kernel_compact(w_ref, t1, t2, t3, f_ref, tp_ref, out_ref, *, window):
    """Compact-plan variant: decode [lc, wx1, wy1] + split tp, same core.

    All decodes are EXACT f32 arithmetic: lc/tp are ints < 2^24, the
    scalings are powers of two, and the final /255 divisions round the same
    way the loaders' i/255 did, so unpacked targets equal the f32-plan
    targets bit-for-bit for uint8-sourced colors.
    """
    f = f_ref[0]                         # (3, BLOCK) f32
    lc = f[0:1]
    li = jnp.floor(lc * (1.0 / GROUP))
    cidf = lc - li * float(GROUP)
    tp = tp_ref[0]                       # (1, BLOCK) f32 split stream
    tr = jnp.floor(tp * (1.0 / 65536.0))
    rem = tp - tr * 65536.0
    tg = jnp.floor(rem * (1.0 / 256.0))
    tb = rem - tg * 256.0
    tgt = jnp.concatenate([tr, tg, tb], axis=0) / 255.0    # (3, block)
    out_ref[0] = _score_core(t1, t2, t3, li, f[1:2], f[2:3], tgt, cidf,
                             window=window)


def _kernel_q8(w_ref, t1, t2, t3, g_ref, tp_ref, out_ref, *, window):
    """Quantized-plan variant: unpack lidx|cid|wx|wy bitfields + split tp.

    Integer unpacks are exact; the /255 fraction decode reproduces the
    builder's round(w*255) quantization (±1/510 per fraction — the ONLY
    approximation in the q8 path; targets decode exactly as in
    _kernel_compact).  The pad sentinel lidx=511 exceeds every real
    window row, so the window one-hot selects nothing and pads contribute
    neither loss nor count.
    """
    g = g_ref[0]                         # (1, BLOCK) int32
    li = (g >> 23) & 0x1FF
    cidf = ((g >> 16) & 0x7F).astype(jnp.float32)
    x1 = ((g >> 8) & 0xFF).astype(jnp.float32) * (1.0 / 255.0)
    y1 = (g & 0xFF).astype(jnp.float32) * (1.0 / 255.0)
    tp = tp_ref[0]                       # (1, BLOCK) f32 split stream
    tr = jnp.floor(tp * (1.0 / 65536.0))
    rem = tp - tr * 65536.0
    tg = jnp.floor(rem * (1.0 / 256.0))
    tb = rem - tg * 256.0
    tgt = jnp.concatenate([tr, tg, tb], axis=0) / 255.0    # (3, block)
    out_ref[0] = _score_core(t1, t2, t3, li, x1, y1, tgt, cidf,
                             window=window)


def _slab_tables(img: jnp.ndarray, height: int, width: int,
                 wrap: bool = False, window: int = WINDOW):
    """Packed sampling table, transposed and exactly split into 3 bf16 parts."""
    blocks = pack_bilinear_blocks(img, wrap=wrap)           # (rows, 12)
    rp = _rpad(height, width, window)
    pad = rp - blocks.shape[0]
    if pad:
        blocks = jnp.concatenate([blocks, jnp.zeros((pad, 12), blocks.dtype)])
    tT = blocks.T                                           # (12, rp)
    t1 = tT.astype(jnp.bfloat16)
    r = tT - t1.astype(jnp.float32)
    t2 = r.astype(jnp.bfloat16)
    t3 = (r - t2.astype(jnp.float32)).astype(jnp.bfloat16)
    return t1, t2, t3


def _check_refresh(compact: bool, tp_is_pid: bool, rgb) -> None:
    if compact and tp_is_pid and rgb is None:
        raise ValueError(
            "compact plan was built refresh-capable (tp_is_pid=True); "
            "pass the cloud colors so targets can be baked"
        )
    if compact and rgb is not None and not tp_is_pid:
        raise ValueError(
            "per-query color refresh needs a compact plan built with "
            "tp_is_pid=True (this one stores packed targets, not point ids)"
        )


def slab_group_partials(tables, fields, windows, compact: bool,
                        rgb: Optional[jnp.ndarray] = None,
                        tps: Optional[jnp.ndarray] = None,
                        window: int = WINDOW, quant: bool = False):
    """(loss_sum, valid_count) per pair of ONE candidate group.

    ``tables``: the 3-way bf16 split from :func:`_slab_tables`;
    ``fields``/``windows``: one group's plan streams ((NB, nf, BLOCK) /
    (NB,)); ``tps``: the split (NB, 1, BLOCK) target/pid stream (compact
    plans).  Returning the raw accumulators (instead of the mean) is what
    lets the sharded path psum partials across point shards before the
    mean — exactness carries over because the mean's numerator and
    denominator are both plain sums over samples.

    NOTE: inside ``shard_map`` this must run under ``check_vma=False``
    (the sanctioned slab stage-1 exception — pallas_call cannot yet
    propagate varying-axis metadata; see CLAUDE.md / parallel/fused.py).
    """
    t1, t2, t3 = tables
    nf = 1 if quant else (3 if compact else 8)
    if rgb is not None:
        if compact:
            # one packed gather re-bakes ONLY the split target stream
            # (4 B/sample) — the geometry streams are untouched, so the
            # per-query copy is 1/4 of the plan, not all of it
            pids = tps.astype(jnp.int32)
            tps = jnp.take(pack_rgb24(rgb), pids, axis=0)
        else:
            pids = fields[:, _F_PID, :].astype(jnp.int32)
            # channel-at-a-time keeps BLOCK as the trailing (lane) dim —
            # a (..., 3)-shaped gather would tile-pad 3 -> 128 lanes (42x)
            tgt = jnp.stack(
                [jnp.take(rgb[:, c], pids, axis=0) for c in range(3)],
                axis=1,
            )  # (NB, 3, BLOCK)
            fields = fields.at[:, _F_TR:_F_TB + 1, :].set(tgt)
    nb, block = fields.shape[0], fields.shape[-1]
    table_spec = lambda: pl.BlockSpec(
        (12, window), lambda b, wr: (0, wr[b]), memory_space=pltpu.VMEM
    )
    in_specs = [table_spec(), table_spec(), table_spec(),
                pl.BlockSpec((1, nf, block), lambda b, wr: (b, 0, 0),
                             memory_space=pltpu.VMEM)]
    args = [windows, t1, t2, t3, fields]
    if compact:
        in_specs.append(
            pl.BlockSpec((1, 1, block), lambda b, wr: (b, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(tps)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 8, GROUP), lambda b, wr: (b, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out_shape = jax.ShapeDtypeStruct((nb, 8, GROUP), jnp.float32)
    out = pl.pallas_call(
        functools.partial(
            _kernel_q8 if quant else
            (_kernel_compact if compact else _kernel),
            window=window,
        ),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=jax.default_backend() == "cpu",
    )(*args)
    tot = jnp.sum(out[:, 0], axis=0)                        # (GROUP,)
    cnt = jnp.sum(out[:, 1], axis=0)
    return tot, cnt


def slab_pair_scores(
    img: jnp.ndarray,
    plan: GridPlan,
    rgb: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Stage-1 sampling losses for all planned pairs (jittable).

    Pass ``rgb`` when per-query color processing rebound the cloud colors
    (sharpen_color): targets are re-baked from ``plan.pids`` with one
    small-table gather.  Returns (n_groups*GROUP,) f32 with the
    empty-candidate +inf convention of loss._masked_color_loss.
    """
    H, W, _ = img.shape
    if plan.height and (plan.height, plan.width) != (H, W):
        raise ValueError(
            f"plan was built for a {plan.height}x{plan.width} init image "
            f"but the query image is {H}x{W} — its table rows index a "
            "different sampling table (stale plan?)"
        )
    tables = _slab_tables(img, H, W, wrap=plan.wrap, window=plan.window)
    _check_refresh(plan.compact, plan.tp_is_pid, rgb)

    def group_scores(fields, windows, tps):
        tot, cnt = slab_group_partials(tables, fields, windows,
                                       plan.compact, rgb, tps=tps,
                                       window=plan.window,
                                       quant=plan.quant)
        mean = tot / jnp.maximum(cnt, 1.0)
        return jnp.where(cnt > 0, mean, jnp.inf)

    tps_seq = plan.tps if plan.compact else (None,) * len(plan.fields)
    scores = jnp.concatenate([
        group_scores(f, w, t)
        for f, w, t in zip(plan.fields, plan.windows, tps_seq)
    ])
    return scores[: plan.n_pairs]

"""Pallas TPU kernel: masked histograms via one-hot compare + MXU dot.

XLA lowers histogramming (``zeros.at[idx].add(mask)``) to a serialized
scatter-add that runs at the TPU's ~270M scatter-ops/s ceiling.  This kernel
reformulates the histogram as dense linear algebra, which is what the
hardware is actually good at:

    onehot[i, b] = (bin_id[i] == b)           # VPU compare vs an iota
    hist[b]      = mask[i] @ onehot[:, b]      # MXU (1 x N) @ (N x B) dot

No scatters, no gathers — only compares and a matmul, both of which map
onto full-width vector/matrix units.  Used by
:func:`piccolo_tpu.ops.histogram.masked_histogram` when
``use_pallas=True`` (histograms are small relative to the renders in the
init stage, so the default stays on the XLA path; see docs/PERFORMANCE.md
for measurements).

Layout: bin ids arrive as (N,) int32 with N a multiple of the tile size;
the kernel tiles N on the grid and accumulates per-tile partial histograms
into the single (1, B) output block (grid iterations over the same output
block run sequentially on TPU, so the read-modify-write accumulate is
race-free).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["histogram_pallas", "block_histogram_pallas"]

_TILE = 2048  # points per grid step; (TILE, B) one-hot tile lives in VMEM


def _hist_kernel(ids_ref, mask_ref, out_ref, *, num_bins: int):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    ids = ids_ref[:].reshape(_TILE, 1)
    mask = mask_ref[:].reshape(1, _TILE)
    bins = jax.lax.broadcasted_iota(jnp.int32, (_TILE, num_bins), 1)
    onehot = (ids == bins).astype(jnp.float32)  # (TILE, B)
    # (1, TILE) @ (TILE, B) on the MXU
    partial = jnp.dot(mask, onehot, preferred_element_type=jnp.float32)
    out_ref[:] = out_ref[:] + partial


@functools.partial(jax.jit, static_argnames=("num_bins",))
def histogram_pallas(
    bin_ids: jnp.ndarray, mask: jnp.ndarray, num_bins: int = 512
) -> jnp.ndarray:
    """Masked histogram of (N,) int32 bin ids -> (num_bins,) float32 counts.

    N is padded to the tile size internally (padding gets mask 0).
    """
    n = bin_ids.shape[0]
    pad = (-n) % _TILE
    if pad:
        bin_ids = jnp.concatenate([bin_ids, jnp.zeros(pad, jnp.int32)])
        mask = jnp.concatenate([mask, jnp.zeros(pad, mask.dtype)])
    n_tiles = bin_ids.shape[0] // _TILE

    out = pl.pallas_call(
        functools.partial(_hist_kernel, num_bins=num_bins),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((_TILE,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE,), lambda i: (i,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, num_bins), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((1, num_bins), jnp.float32),
        # CPU (tests) has no Mosaic backend; fall back to the interpreter.
        interpret=jax.default_backend() == "cpu",
    )(bin_ids.astype(jnp.int32), mask.astype(jnp.float32))
    return out.reshape(num_bins)


def _block_hist_kernel(ids_ref, mask_ref, out_ref, *, num_bins: int,
                       num_blocks: int):
    tile = pl.program_id(0)

    @pl.when(tile == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    ids = ids_ref[:]  # (TILE, num_blocks)
    mask = mask_ref[:]  # (TILE, num_blocks)
    bins = jax.lax.broadcasted_iota(jnp.int32, (_TILE, num_bins), 1)
    # one (1, TILE) @ (TILE, num_bins) dot per block column (num_blocks is
    # small and static — the loop unrolls; the one-hot tile is reused VMEM)
    rows = []
    for b in range(num_blocks):
        onehot = (ids[:, b : b + 1] == bins).astype(jnp.float32)
        rows.append(
            jnp.dot(
                mask[:, b].reshape(1, _TILE),
                onehot,
                preferred_element_type=jnp.float32,
            )
        )
    out_ref[:] = out_ref[:] + jnp.concatenate(rows, axis=0)


@functools.partial(jax.jit, static_argnames=("num_bins",))
def block_histogram_pallas(
    bin_ids: jnp.ndarray, mask: jnp.ndarray, num_bins: int = 512
) -> jnp.ndarray:
    """Batched masked histograms: (B, N) int32 ids -> (B, num_bins) counts.

    Pixels are laid out (N, B) on the wire — Pallas TPU block shapes must
    tile the last two dims, and (TILE, B) with B equal to the full minor
    dim satisfies that for any small block count. Grid steps over N tiles
    accumulate into the (B, num_bins) output (sequential on TPU,
    race-free). Counting is exact: the one-hot is 0/1 in f32 and the MXU
    accumulates in f32 (counts < 2^24).

    This is the large-image fast path for the init histogram trim: the XLA
    scatter-add formulation is row-count-bound (~1.1e8 rows/s at 2M-pixel
    images), while the one-hot compare runs at VPU width
    (docs/PERFORMANCE.md).
    """
    B, n = bin_ids.shape
    pad = (-n) % _TILE
    if pad:
        bin_ids = jnp.concatenate(
            [bin_ids, jnp.zeros((B, pad), jnp.int32)], axis=1
        )
        mask = jnp.concatenate([mask, jnp.zeros((B, pad), mask.dtype)], axis=1)
    n_tiles = bin_ids.shape[1] // _TILE

    return pl.pallas_call(
        functools.partial(
            _block_hist_kernel, num_bins=num_bins, num_blocks=B
        ),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((_TILE, B), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE, B), lambda t: (t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (B, num_bins), lambda t: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, num_bins), jnp.float32),
        interpret=jax.default_backend() == "cpu",
    )(bin_ids.astype(jnp.int32).T, mask.astype(jnp.float32).T)

"""Pallas TPU kernels for hot ops.

See docs/PERFORMANCE.md for the engineering analysis of which ops benefit
from hand-written kernels on this workload.  Mosaic's lane-local addressing
rules out direct gather/scatter kernels, so the two that live here both
reformulate an irregular op as MXU matmuls:

  * histogram_mxu — histogramming as one-hot compare + dot (wins at
    large-image block histograms);
  * slab_sampling — stage-1 candidate scoring over room-static sorted
    sample streams: per-block one-hot gather from a VMEM-resident table
    window + fused lerp/loss + one-hot per-candidate accumulation (16x the
    XLA gather rate at OmniScenes scale).
"""

from .histogram_mxu import block_histogram_pallas, histogram_pallas
from .slab_sampling import (
    GridPlan,
    build_grid_plan,
    make_pairs,
    slab_pair_scores,
)

__all__ = [
    "histogram_pallas",
    "block_histogram_pallas",
    "GridPlan",
    "build_grid_plan",
    "make_pairs",
    "slab_pair_scores",
]

"""Pallas TPU kernels for hot ops.

See docs/PERFORMANCE.md for the engineering analysis of which ops benefit
from hand-written kernels on this workload (short version: the
gather/scatter-bound ops hit Mosaic's lane-local addressing constraints, so
the winning moves were data-layout redesigns consumed by XLA — e.g. packed
one-gather bilinear sampling — while dense reformulations like the MXU
histogram live here).
"""

from .histogram_mxu import block_histogram_pallas, histogram_pallas

__all__ = ["histogram_pallas", "block_histogram_pallas"]

"""piccolo_tpu — a TPU-native omnidirectional camera localization framework.

A from-scratch JAX/XLA re-design with the capabilities of PICCOLO
(82magnolia/piccolo, ICCV 2021): given one equirectangular panorama and a
colored 3-D point cloud of the same space, recover the 6-DoF camera pose by
gradient descent on the sampling loss, from multi-start candidate poses.

Layering (all compute-path code is pure JAX, jit/vmap/pjit-safe):

  ops/      spherical projection, bilinear sampling, rotations, pano
            rendering (scatter-min z-buffer), histograms, quantiles
  loss      the sampling loss as a pure differentiable function
  optim     Adam + ReduceLROnPlateau as vmappable state transitions
  solver    multi-start descent: lax.scan over iterations, vmap over starts
  init/     pose-candidate generation and the two-stage trim
  color     color harmonization (histogram equalization / CDF matching)
  data/     Stanford2D-3D-S and OmniScenes loaders + GT pose conventions
  config    ini-compatible typed config with CLI override grammar
  harness/  dataset evaluation loops, metrics, CSV/TensorBoard/image outputs
  parallel/ multi-chip sharding (candidate x point mesh) via shard_map
  kernels/  Pallas TPU kernels for hot ops
  native/   C++ fast-path IO (point-cloud text parsing)
"""

__version__ = "0.1.0"

from .loss import Pose, sampling_loss
from .solver import SolveResult, descend, solve
from .tracking import Tracker, TrackResult, track_step

__all__ = [
    "Pose", "sampling_loss", "SolveResult", "descend", "solve",
    "Tracker", "TrackResult", "track_step",
]

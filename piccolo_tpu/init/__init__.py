"""Pose-candidate initialization: grids + two-stage trim."""

from .candidates import (
    adaptive_trans_num,
    compute_sampling_grid,
    default_init_dict,
    generate_rot_points,
    generate_trans_points,
)
from .refine import (
    HistPlan,
    build_hist_plan,
    hist_scores,
    hist_scores_from_planes,
    make_input,
    score_pose_grid,
    trim_by_hist,
    trim_by_loss,
)

__all__ = [
    "adaptive_trans_num",
    "compute_sampling_grid",
    "default_init_dict",
    "generate_rot_points",
    "generate_trans_points",
    "HistPlan",
    "build_hist_plan",
    "hist_scores",
    "hist_scores_from_planes",
    "make_input",
    "score_pose_grid",
    "trim_by_hist",
    "trim_by_loss",
]

"""Evaluation harnesses, metrics, and output artifacts."""

from .localize import get_init_dict, localize_omniscenes, localize_stanford
from .metrics import (
    AccuracyTracker,
    rotation_error_deg,
    translation_error,
)

__all__ = [
    "get_init_dict",
    "localize_omniscenes",
    "localize_stanford",
    "AccuracyTracker",
    "rotation_error_deg",
    "translation_error",
]

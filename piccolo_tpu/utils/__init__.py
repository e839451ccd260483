"""Utilities: profiling, timing, debug switches."""

from .profiling import (
    Timer,
    enable_compilation_cache,
    enable_nan_debug,
    maybe_trace,
)

__all__ = ["Timer", "enable_compilation_cache", "enable_nan_debug", "maybe_trace"]

"""Profiling / tracing hooks.

The reference has no profiling subsystem beyond wall-clock pairs and tqdm
(SURVEY §5).  Here: per-query wall timing stays in the harness CSV (parity),
plus an optional ``jax.profiler.trace`` context activated by the
``profile_dir`` config key, and a NaN-debug switch standing in for the
reference's always-on ``torch.autograd.set_detect_anomaly``.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax

__all__ = ["Timer", "maybe_trace", "enable_nan_debug", "enable_compilation_cache"]


def enable_compilation_cache(path: Optional[str] = None) -> None:
    """Persist XLA compilations across processes.

    First-compile of the init+descent pipeline costs minutes; the cache
    brings warm-start runs down to seconds. Safe to call repeatedly.

    ``PICCOLO_XLA_CACHE_DIR`` overrides the default location (explicit
    ``path`` still wins).  tests/conftest.py points it at a per-session
    temp dir: the default dir is shared machine-wide state, and a stale
    entry from a run killed mid-write can SEGFAULT jax's cache read
    (observed on the CPU backend) — CI must not depend on it.
    """
    import os

    path = path or os.environ.get("PICCOLO_XLA_CACHE_DIR") or os.path.join(
        os.path.expanduser("~"), ".cache", "piccolo_tpu", "xla"
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


class Timer:
    """Context-manager wall timer: ``with Timer() as t: ...; t.elapsed``."""

    def __enter__(self):
        self._start = time.time()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.time() - self._start
        return False


@contextlib.contextmanager
def maybe_trace(profile_dir: Optional[str]):
    """jax.profiler trace when a directory is configured, no-op otherwise."""
    if profile_dir:
        with jax.profiler.trace(profile_dir):
            yield
    else:
        yield


def enable_nan_debug(enable: bool = True) -> None:
    """Raise on NaNs produced inside jitted code (debug runs only — it
    forces per-op checking and disables some fusions)."""
    jax.config.update("jax_debug_nans", enable)

"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding tests use XLA's host
platform device count instead (the JAX analog of a fake process group).
Must run before jax initializes, hence the env mutation at import time.
"""

import os

# PICCOLO_TEST_TPU=1 keeps the real accelerator so the few TPU-gated tests
# (e.g. the exec-cache disk round trip, CPU-unsafe by design) can run on
# hardware: run ONLY those tests under it — the virtual 8-device mesh
# tests require the CPU platform.
_KEEP_TPU = bool(os.environ.get("PICCOLO_TEST_TPU"))

if not _KEEP_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
# f64 stays off: the framework is f32 end-to-end like the reference.

# Isolate the persistent XLA compilation cache from the machine-wide
# default dir: in-process CLI tests enable it process-wide
# (utils.enable_compilation_cache), and a corrupt entry left by any
# earlier killed run segfaults jax's cache READ mid-suite (observed:
# zstd/deserialize crash in compilation_cache.get_executable_and_time).
import tempfile

os.environ.setdefault(
    "PICCOLO_XLA_CACHE_DIR",
    tempfile.mkdtemp(prefix="piccolo_test_xla_cache_"),
)

import jax  # noqa: E402

# Some environments register an accelerator plugin at interpreter start and
# force jax_platforms through jax.config (ignoring the env var) — override it
# back to CPU here, before any computation runs.
if not _KEEP_TPU:
    jax.config.update("jax_platforms", "cpu")
    # The persistent cache's native paths have segfaulted on the CPU
    # backend in BOTH directions now: reads of a stale/corrupt entry
    # (the reason for the dir isolation above) and, observed later, a
    # mid-suite crash inside compilation_cache.put_executable_and_time
    # while serializing a large tracked-frame program.  Its value in CI
    # is marginal (jax_persistent_cache_min_compile_time_secs filters
    # most test programs); its crash risk is not.  Keep the isolated dir
    # (the CLI code path still configures it) but turn the cache
    # machinery itself off for the whole CPU session.  The real-TPU
    # session (PICCOLO_TEST_TPU) keeps production behavior.
    jax.config.update("jax_enable_compilation_cache", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _fresh_jax_caches():
    """Bound in-process XLA:CPU compiler state at module boundaries.

    Deep into a single-process run of the full suite (~285 tests in),
    XLA:CPU has segfaulted while COMPILING a large tracked-frame program
    — observed twice at the same test, once inside
    ``backend_compile_and_load`` and once inside the persistent-cache
    write; every test file passes in isolation and every multi-file
    subset tried passes too, so the trigger is accumulated in-process
    compiler/executable state, not any specific precursor.  Dropping the
    jit caches at each module boundary keeps that accumulation bounded;
    within-file caching (what the fixtures rely on) is unchanged.
    """
    jax.clear_caches()
    yield
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(2)

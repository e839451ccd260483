"""The driver's multi-chip contract: __graft_entry__.dryrun_multichip.

These tests run in FRESH subprocesses with the mesh-provisioning env vars
stripped — no conftest help — so the entry point must provision the virtual
device mesh itself, exactly as the driver invokes it.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _clean_env():
    """Env as the driver would have it: no virtual-mesh flags pre-set."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    flags = env.pop("XLA_FLAGS", "")
    # keep unrelated XLA flags, drop only the device-count provisioning
    kept = " ".join(
        f for f in flags.split()
        if "xla_force_host_platform_device_count" not in f
    )
    if kept:
        env["XLA_FLAGS"] = kept
    return env


def _run(code: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, "-c", code],
        env=_clean_env(),
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=540,
    )


def test_dryrun_multichip_fresh_process():
    """Straight call in a clean process: must self-provision 8 devices."""
    proc = _run(
        f"import sys; sys.path.insert(0, {REPO!r})\n"
        # Keep the test off real accelerators: fresh-process JAX not yet
        # initialized, so dryrun's own provisioning must do the rest.
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(8)\n"
    )
    assert proc.returncode == 0, proc.stderr
    assert "dryrun_multichip OK" in proc.stdout, (proc.stdout, proc.stderr)


def test_dryrun_multichip_after_jax_initialized():
    """JAX already initialized with 1 device: must fall back to a subprocess."""
    proc = _run(
        f"import sys; sys.path.insert(0, {REPO!r})\n"
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "assert len(jax.devices()) == 1, jax.devices()\n"  # commit the backend
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(8)\n"
    )
    assert proc.returncode == 0, proc.stderr

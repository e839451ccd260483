"""AOT executable cache (utils/exec_cache.py) — the serving cold-start
mitigation (docs/ROUND4.md §3).

The disk LOAD path cannot run on the CPU backend (XLA:CPU AOT executables
embed host machine features and fail at runtime after deserialization —
the module disables its disk layer there by design), so these tests pin:
the static/dynamic kwarg split, in-process memoization, the CPU disk
gate, corrupt-entry fallback, LRU eviction, and the harness integration
switch.  The TPU load path itself is measured by
scripts/measure_coldstart.py --exec-cache (real-chip numbers in
docs/ROUND4.md §3)."""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from piccolo_tpu.utils import exec_cache
from piccolo_tpu.utils.exec_cache import aot_call, clear_memo, evict_lru


@functools.partial(jax.jit, static_argnames=("scale", "bias"))
def _toy(x, y=None, *, scale=2.0, bias=0.0):
    r = x * scale + bias
    if y is not None:
        r = r + y
    return r


_TOY_STATICS = ("scale", "bias")


@pytest.fixture(autouse=True)
def _fresh_memo():
    clear_memo()
    yield
    clear_memo()


def test_matches_direct_jit_call(tmp_path):
    x = jnp.arange(8.0)
    y = jnp.ones(8)
    want = _toy(x, y=y, scale=3.0, bias=1.0)
    got = aot_call(_toy, _TOY_STATICS, str(tmp_path), x, y=y,
                   scale=3.0, bias=1.0)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


class _CountingJit:
    """Wrapper counting .lower() calls (jit wrappers are C objects whose
    attributes cannot be monkeypatched)."""

    __name__ = "counting_toy"

    def __init__(self, fn):
        self.fn = fn
        self.lowers = []

    def lower(self, *a, **k):
        self.lowers.append((k.get("scale"), a[0].shape[0]))
        return self.fn.lower(*a, **k)


def test_memoizes_per_variant(tmp_path):
    counting = _CountingJit(_toy)
    x = jnp.arange(4.0)
    for _ in range(3):
        aot_call(counting, _TOY_STATICS, str(tmp_path), x, scale=2.0)
    assert counting.lowers == [(2.0, 4)]  # one lower per variant
    aot_call(counting, _TOY_STATICS, str(tmp_path), x, scale=5.0)
    assert counting.lowers == [(2.0, 4), (5.0, 4)]  # new static => variant
    # a new SHAPE is a new variant too
    aot_call(counting, _TOY_STATICS, str(tmp_path), jnp.arange(6.0),
             scale=2.0)
    assert counting.lowers == [(2.0, 4), (5.0, 4), (2.0, 6)]


def test_disk_layer_gated_off_on_cpu(tmp_path):
    assert jax.default_backend() == "cpu"  # conftest forces CPU
    aot_call(_toy, _TOY_STATICS, str(tmp_path), jnp.arange(4.0), scale=2.0)
    assert not any(
        n.endswith(".jaxexec") for n in os.listdir(tmp_path)
    ), "CPU backend must not persist executables (runtime-unsafe AOT)"


def test_corrupt_entry_falls_back_to_compile(tmp_path, monkeypatch):
    # force the disk layer on (CPU), but make every entry garbage: the
    # load must fail cleanly, drop the entry, and recompile
    monkeypatch.setattr(exec_cache, "_disk_enabled", lambda: True)
    x = jnp.arange(4.0)
    want = np.asarray(_toy(x, scale=2.0))
    got = aot_call(_toy, _TOY_STATICS, str(tmp_path), x, scale=2.0)
    np.testing.assert_array_equal(np.asarray(got), want)
    entries = [n for n in os.listdir(tmp_path) if n.endswith(".jaxexec")]
    assert len(entries) == 1  # the compile stored an entry
    path = os.path.join(tmp_path, entries[0])
    with open(path, "wb") as f:
        f.write(b"not a pickle")
    clear_memo()  # simulate a process restart
    got = aot_call(_toy, _TOY_STATICS, str(tmp_path), x, scale=2.0)
    np.testing.assert_array_equal(np.asarray(got), want)
    # the corrupt entry was dropped and rewritten by the fresh compile
    with open(path, "rb") as f:
        assert f.read(12) != b"not a pickle"


def test_evict_lru(tmp_path):
    paths = []
    for i in range(4):
        p = tmp_path / f"{i:032x}.jaxexec"
        p.write_bytes(b"x" * 100)
        os.utime(p, (1000 + i, 1000 + i))
        paths.append(p)
    (tmp_path / "unrelated.txt").write_bytes(b"y" * 1000)
    removed = evict_lru(str(tmp_path), max_bytes=250)
    assert removed == 2
    assert not paths[0].exists() and not paths[1].exists()
    assert paths[2].exists() and paths[3].exists()
    assert (tmp_path / "unrelated.txt").exists()


def test_harness_exec_cache_switch(tmp_path):
    """_run_fused with exec_cache_dir set must answer identically to the
    plain jit path (on CPU the disk layer is off — this pins the call-path
    switch and the static split on the REAL localize_query program)."""
    from piccolo_tpu.config import make_config
    from piccolo_tpu.harness.localize import (
        _FusedGrids,
        _order_bounds,
        _pad_cloud,
        _run_fused,
    )
    from piccolo_tpu.init import default_init_dict
    from piccolo_tpu.testing import make_room, random_pose_inside, render_at

    rng = np.random.default_rng(5)
    size = (4.0, 3.0, 2.5)
    xyz, rgb = make_room(rng, n_per_wall=1200, size=size, texture="checker")
    xyz_d, rgb_d, mask_d = _pad_cloud(
        xyz.astype(np.float32), rgb.astype(np.float32)
    )
    lo, hi = _order_bounds(xyz, 0.05)
    init_dict = default_init_dict(
        xy_only=True, yaw_only=True, num_yaw=4, num_trans=12, z_prior=None,
        num_split_h=4, num_split_w=4,
    )
    grids = _FusedGrids(xyz.astype(np.float32), init_dict)
    gt_t, gt_ypr = random_pose_inside(np.random.default_rng(9), size)
    img = np.asarray(render_at(xyz, rgb, gt_t, gt_ypr, (64, 128)))
    cache = dict(
        xyz=xyz_d, rgb=rgb_d, mask=mask_d,
        lo=jnp.asarray(lo), hi=jnp.asarray(hi),
    )
    base_kw = dict(
        num_intermediate=8, num_input=3, num_iter=20, slab_init=False,
        hist_planes=False,
    )
    cfg_plain = make_config(dataset="Stanford2D-3D-S", **base_kw)
    cfg_aot = make_config(
        dataset="Stanford2D-3D-S", exec_cache_dir=str(tmp_path), **base_kw
    )
    res_plain = _run_fused(img, img, cache, cache["rgb"], cfg_plain,
                           init_dict, grids)
    res_aot = _run_fused(img, img, cache, cache["rgb"], cfg_aot,
                         init_dict, grids)
    np.testing.assert_array_equal(
        np.asarray(res_plain.t), np.asarray(res_aot.t)
    )
    np.testing.assert_array_equal(
        np.asarray(res_plain.loss), np.asarray(res_aot.loss)
    )


def test_sharded_exec_cache_identical_and_mesh_keyed(tmp_path):
    """The multi-chip path (parallel.localize_query_sharded) routes through
    the executable cache too (round-5): results must equal the direct jit
    call bit-for-bit, and DIFFERENT mesh factorizations must occupy
    DIFFERENT memo variants (the lowered programs differ; sharing one
    entry would run the wrong collective layout)."""
    from piccolo_tpu.parallel import localize_query_sharded, make_mesh
    from piccolo_tpu.testing import make_room, random_pose_inside, render_at
    from piccolo_tpu.init import default_init_dict
    from piccolo_tpu.harness.localize import _FusedGrids

    rng = np.random.default_rng(7)
    size = (4.0, 3.0, 2.5)
    xyz, rgb = make_room(rng, n_per_wall=1200, size=size, texture="checker")
    xyz = xyz.astype(np.float32)
    rgb = rgb.astype(np.float32)
    init_dict = default_init_dict(
        xy_only=True, yaw_only=True, num_yaw=4, num_trans=12, z_prior=None,
        num_split_h=4, num_split_w=4,
    )
    grids = _FusedGrids(xyz, init_dict)
    gt_t, gt_ypr = random_pose_inside(np.random.default_rng(11), size)
    img = np.asarray(render_at(xyz, rgb, gt_t, gt_ypr, (64, 128)))
    lo = xyz.min(0)
    hi = xyz.max(0)
    kw = dict(
        num_intermediate=8, num_input=3, num_iter=5, grid_chunk=8,
        hist_chunk=4,
    )
    n_variants = 0
    for n_cand, n_point in [(2, 4), (4, 2)]:
        mesh = make_mesh(n_cand, n_point)
        want = localize_query_sharded(
            mesh, img, img, xyz, rgb, grids.trans, grids.rot, grids.valid,
            lo, hi, **kw,
        )
        got = localize_query_sharded(
            mesh, img, img, xyz, rgb, grids.trans, grids.rot, grids.valid,
            lo, hi, exec_cache_dir=str(tmp_path), **kw,
        )
        np.testing.assert_array_equal(np.asarray(want.t), np.asarray(got.t))
        np.testing.assert_array_equal(
            np.asarray(want.loss), np.asarray(got.loss)
        )
        assert int(want.winner) == int(got.winner)
        n_variants += 1
        assert len(exec_cache._memo) == n_variants  # new mesh => new entry


def test_disk_round_trip_on_tpu(tmp_path, monkeypatch):
    """The serialize -> restart -> deserialize -> answer round trip, pinned
    IN THE SUITE on real hardware (round-4 verdict: the happy path's only
    evidence was a measurement script — a jax upgrade breaking
    serialize_executable must fail CI, not a production restart).

    Auto-skips on the CPU backend (the disk layer is CPU-gated by design);
    run it on the chip with:

        PICCOLO_TEST_TPU=1 python -m pytest \
            tests/test_exec_cache.py::test_disk_round_trip_on_tpu -q
    """
    if jax.default_backend() == "cpu":
        pytest.skip("disk layer is disabled on CPU (runtime-unsafe AOT)")
    x = jnp.arange(128.0)
    want = np.asarray(
        aot_call(_toy, _TOY_STATICS, str(tmp_path), x, scale=3.0, bias=1.0)
    )
    entries = [n for n in os.listdir(tmp_path) if n.endswith(".jaxexec")]
    assert len(entries) == 1, "first call must serialize an entry"
    clear_memo()  # simulate a process restart
    loads = []
    real_load = exec_cache._load

    def spy(path):
        r = real_load(path)
        loads.append(r is not None)
        return r

    monkeypatch.setattr(exec_cache, "_load", spy)
    got = np.asarray(
        aot_call(_toy, _TOY_STATICS, str(tmp_path), x, scale=3.0, bias=1.0)
    )
    assert loads == [True], "restart did not deserialize from disk"
    np.testing.assert_array_equal(got, want)


def test_entry_path_separates_device_assignments(tmp_path):
    """Per-device program variants lower to IDENTICAL StableHLO text, so
    the disk key must also hash the argument device assignment — otherwise
    serving ``query_devices`` / CLI ``device_index`` variants would share
    one entry and the loaded executable would be pinned to whichever
    device compiled first (round-4 review finding)."""
    from piccolo_tpu.utils.exec_cache import _entry_path

    x = jnp.ones((4,), jnp.float32)
    lowered = _toy.lower(x, scale=2.0)
    avals0 = (("arr", (4,), "float32", (0,)),)
    avals1 = (("arr", (4,), "float32", (1,)),)
    p0 = _entry_path(str(tmp_path), lowered, avals0)
    p1 = _entry_path(str(tmp_path), lowered, avals1)
    assert p0 != p1
    # and the key is stable for the same assignment
    assert p0 == _entry_path(str(tmp_path), lowered, avals0)

"""Sorted-slab stage-1 kernel: parity with the XLA scoring path.

Runs in Pallas interpret mode on the CPU test mesh (validated on real TPU —
see docs/PERFORMANCE.md for measured rates).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from piccolo_tpu.init.refine import score_pose_grid
from piccolo_tpu.kernels.slab_sampling import (
    build_grid_plan,
    make_pairs,
    slab_pair_scores,
    _slab_tables,
)
from piccolo_tpu.ops.sampling import pack_bilinear_blocks
from piccolo_tpu.testing import make_room, render_at


@pytest.fixture(scope="module")
def scene():
    rng = np.random.default_rng(3)
    xyz, rgb = make_room(rng, n_per_wall=128, size=(4.0, 3.0, 2.5))
    n = xyz.shape[0]
    m = 1024
    xyz_p = np.concatenate([xyz, rng.normal(size=(m - n, 3)).astype(np.float32)])
    rgb_p = np.concatenate([rgb, rng.random((m - n, 3)).astype(np.float32)])
    mask = np.arange(m) < n
    img = np.asarray(
        render_at(xyz, rgb, np.zeros(3, np.float32),
                  np.array([0.4, 0.1, 0.0], np.float32), (32, 64))
    )
    trans = rng.uniform(-1.0, 1.0, (4, 3)).astype(np.float32)
    rot = np.stack(
        [np.linspace(0, 2 * np.pi, 8, endpoint=False).astype(np.float32),
         np.zeros(8, np.float32), np.zeros(8, np.float32)], axis=1,
    )
    return dict(
        xyz=jnp.asarray(xyz_p), rgb=jnp.asarray(rgb_p), mask=jnp.asarray(mask),
        img=jnp.asarray(img), trans=jnp.asarray(trans), rot=jnp.asarray(rot),
    )


def test_slab_tables_split_is_exact(scene):
    H, W, _ = scene["img"].shape
    t1, t2, t3 = _slab_tables(scene["img"], H, W)
    rec = (t1.astype(jnp.float32) + t2.astype(jnp.float32)
           + t3.astype(jnp.float32))
    blocks = pack_bilinear_blocks(scene["img"])
    assert np.array_equal(np.asarray(rec)[:, : blocks.shape[0]],
                          np.asarray(blocks).T)


def test_slab_scores_match_xla_path(scene):
    H, W, _ = scene["img"].shape
    plan = build_grid_plan(
        scene["xyz"], scene["rgb"], scene["mask"],
        scene["trans"], scene["rot"], H, W,
    )
    got = np.asarray(slab_pair_scores(scene["img"], plan))

    want = np.asarray(score_pose_grid(
        scene["img"], scene["xyz"], scene["rgb"],
        scene["trans"], scene["rot"], scene["mask"],
    ))
    P = want.shape[0]
    np.testing.assert_allclose(got[:P], want, rtol=2e-5, atol=1e-6)
    # identical stage-1 selection
    k = 6
    assert list(np.argsort(got[:P])[:k]) == list(np.argsort(want)[:k])
    # group-padding clones of pair 0 score exactly like pair 0
    np.testing.assert_allclose(got[P:], got[0], rtol=2e-5, atol=1e-6)


def test_slab_scores_rgb_refresh(scene):
    """Per-query color rebinds (sharpen_color) re-bake the targets."""
    H, W, _ = scene["img"].shape
    plan = build_grid_plan(
        scene["xyz"], scene["rgb"], scene["mask"],
        scene["trans"], scene["rot"], H, W,
    )
    rng = np.random.default_rng(11)
    rgb2 = jnp.asarray(rng.random(scene["rgb"].shape, dtype=np.float32))
    got = np.asarray(slab_pair_scores(scene["img"], plan, rgb=rgb2))
    want = np.asarray(score_pose_grid(
        scene["img"], scene["xyz"], rgb2,
        scene["trans"], scene["rot"], scene["mask"],
    ))
    P = want.shape[0]
    np.testing.assert_allclose(got[:P], want, rtol=2e-5, atol=1e-6)


def test_make_pairs_order_matches_grid_score_layout(scene):
    """Pair order = trans-major flattening (reference utils.py:481-499)."""
    pair_t, pair_r = make_pairs(scene["trans"], scene["rot"])
    T, R = scene["trans"].shape[0], scene["rot"].shape[0]
    assert pair_t.shape == (T * R, 3)
    np.testing.assert_array_equal(
        np.asarray(pair_t[:R]), np.tile(np.asarray(scene["trans"][0]), (R, 1))
    )
    np.testing.assert_array_equal(np.asarray(pair_r[:R]), np.asarray(scene["rot"]))


def test_compact_plan_matches_f32_plan(scene):
    """16 B/sample compact plan: same scores as the f32 plan to <=1 ulp of
    the target decode (u8-sourced colors round-trip losslessly; the only
    deviation is double-rounding in the /255)."""
    H, W, _ = scene["img"].shape
    # u8-source the colors like the data loaders do
    rgb_u8 = jnp.asarray(
        np.round(np.clip(np.asarray(scene["rgb"]), 0, 1) * 255) / 255.0,
        jnp.float32,
    )
    base = build_grid_plan(
        scene["xyz"], rgb_u8, scene["mask"],
        scene["trans"], scene["rot"], H, W,
    )
    comp = build_grid_plan(
        scene["xyz"], rgb_u8, scene["mask"],
        scene["trans"], scene["rot"], H, W, compact=True,
    )
    assert comp.nbytes * 2 <= base.nbytes + 1024
    s0 = np.asarray(slab_pair_scores(scene["img"], base))
    s1 = np.asarray(slab_pair_scores(scene["img"], comp))
    np.testing.assert_allclose(s1, s0, rtol=0, atol=2e-6)
    assert list(np.argsort(s1)) == list(np.argsort(s0))


def test_compact_plan_rgb_refresh(scene):
    """Refresh-capable compact plan (tp_is_pid): one packed gather re-bakes
    the targets; scores match the XLA path at u8 target quantization."""
    H, W, _ = scene["img"].shape
    plan = build_grid_plan(
        scene["xyz"], scene["rgb"], scene["mask"],
        scene["trans"], scene["rot"], H, W, compact=True, tp_is_pid=True,
    )
    rng = np.random.default_rng(11)
    # u8-quantized rebind (color_mod outputs arbitrary floats; compact
    # quantizes targets to 1/255 steps)
    rgb2 = jnp.asarray(
        np.round(rng.random(scene["rgb"].shape) * 255) / 255.0, jnp.float32
    )
    got = np.asarray(slab_pair_scores(scene["img"], plan, rgb=rgb2))
    from piccolo_tpu.init.refine import score_pose_grid

    want = np.asarray(score_pose_grid(
        scene["img"], scene["xyz"], rgb2,
        scene["trans"], scene["rot"], scene["mask"],
    ))
    P = want.shape[0]
    np.testing.assert_allclose(got[:P], want, rtol=2e-5, atol=2e-6)


def test_compact_plan_usage_guards(scene):
    """Mismatched compact plan/usage combinations fail loudly."""
    H, W, _ = scene["img"].shape
    packed = build_grid_plan(
        scene["xyz"], scene["rgb"], scene["mask"],
        scene["trans"], scene["rot"], H, W, compact=True,
    )
    pid = build_grid_plan(
        scene["xyz"], scene["rgb"], scene["mask"],
        scene["trans"], scene["rot"], H, W, compact=True, tp_is_pid=True,
    )
    with pytest.raises(ValueError, match="tp_is_pid"):
        slab_pair_scores(scene["img"], packed, rgb=scene["rgb"])
    with pytest.raises(ValueError, match="refresh-capable"):
        slab_pair_scores(scene["img"], pid)


def test_plan_records_image_shape_and_rejects_mismatch(scene):
    plan = build_grid_plan(
        scene["xyz"], scene["rgb"], scene["mask"],
        scene["trans"], scene["rot"], 32, 64,
    )
    assert (plan.height, plan.width) == (32, 64)
    wrong = jnp.zeros((64, 128, 3), jnp.float32)
    with pytest.raises(ValueError, match="stale plan"):
        slab_pair_scores(wrong, plan)


def test_plan_exact_budget_check(scene):
    """The post-sizing EXACT size check trips even when the pre-build
    estimate would admit the plan (ADVICE r2: data-dependent padding can
    exceed the estimate's fixed 1.25 factor)."""
    from piccolo_tpu.kernels.slab_sampling import PlanOverBudget

    with pytest.raises(PlanOverBudget):
        build_grid_plan(
            scene["xyz"], scene["rgb"], scene["mask"],
            scene["trans"], scene["rot"], 32, 64, bytes_cap=1024,
        )
    # a generous cap builds fine and the exact accounting bounds reality
    plan = build_grid_plan(
        scene["xyz"], scene["rgb"], scene["mask"],
        scene["trans"], scene["rot"], 32, 64, bytes_cap=10**9,
    )
    from piccolo_tpu.kernels.slab_sampling import plan_exact_bytes

    n_groups = len(plan.fields)
    nb = plan.fields[0].shape[0]
    assert plan_exact_bytes(
        n_groups, nb, compact=False, block=plan.block
    ) == plan.nbytes


def test_default_plan_bytes_cap_from_device_stats():
    from piccolo_tpu.kernels.slab_sampling import (
        DEFAULT_PLAN_BYTES_CAP,
        default_plan_bytes_cap,
    )

    class FakeDev:
        def __init__(self, stats):
            self._stats = stats

        def memory_stats(self):
            return self._stats

    # 16 GB chip reproduces the measured 9 GB working split
    cap = default_plan_bytes_cap(FakeDev({"bytes_limit": 16 * 2**30}))
    assert cap == int(16 * 2**30 * 9 / 16)
    # 32 GB chip scales up
    assert default_plan_bytes_cap(
        FakeDev({"bytes_limit": 32 * 2**30})
    ) == 2 * cap
    # no stats (CPU/plugin frontends): the measured 16 GB constant
    assert default_plan_bytes_cap(FakeDev(None)) == DEFAULT_PLAN_BYTES_CAP
    assert default_plan_bytes_cap(FakeDev({})) == DEFAULT_PLAN_BYTES_CAP

    class Broken:
        def memory_stats(self):
            raise RuntimeError("unsupported")

    assert default_plan_bytes_cap(Broken()) == DEFAULT_PLAN_BYTES_CAP


def test_plan_geometry_resolver_and_overrides(scene):
    """Auto geometry follows sample density (dense -> small windows);
    explicit overrides build plans whose scores match the default exactly
    (selection is one-hot-exact at ANY window/block)."""
    from piccolo_tpu.kernels.slab_sampling import (
        build_grid_plan,
        resolve_plan_geometry,
        slab_pair_scores,
    )

    # density >= 0.25 -> (128, 1024); sparse -> (256, 512)
    # (bench Stanford: 65k pts / 257x513-row table ~ 0.5 -> dense;
    #  bench OmniScenes: 65k pts / 2.1M rows ~ 0.03 -> sparse)
    assert resolve_plan_geometry(65536, 256, 512) == (128, 1024)
    assert resolve_plan_geometry(65536, 1024, 2048) == (256, 512)
    assert resolve_plan_geometry(1, 31, 63, window=512, block=256) == (512, 256)

    base = build_grid_plan(
        scene["xyz"], scene["rgb"], scene["mask"],
        scene["trans"], scene["rot"], 32, 64,
    )
    s0 = np.asarray(slab_pair_scores(scene["img"], base))
    for window, block in ((512, 1024), (256, 512)):
        plan = build_grid_plan(
            scene["xyz"], scene["rgb"], scene["mask"],
            scene["trans"], scene["rot"], 32, 64,
            window=window, block=block,
        )
        assert (plan.window, plan.block) == (window, block)
        s = np.asarray(slab_pair_scores(scene["img"], plan))
        np.testing.assert_allclose(s, s0, atol=2e-6)


def test_q8_plan_matches_f32_plan_within_quantization(scene):
    """8 B/sample q8 plan: half the compact bytes; scores match the exact
    plan to the 1/255 fraction-quantization bound and preserve the
    stage-1 ranking on separated candidates."""
    H, W, _ = scene["img"].shape
    rgb_u8 = jnp.asarray(
        np.round(np.clip(np.asarray(scene["rgb"]), 0, 1) * 255) / 255.0,
        jnp.float32,
    )
    comp = build_grid_plan(
        scene["xyz"], rgb_u8, scene["mask"],
        scene["trans"], scene["rot"], H, W, compact=True,
    )
    q8 = build_grid_plan(
        scene["xyz"], rgb_u8, scene["mask"],
        scene["trans"], scene["rot"], H, W, compact=True, quant=True,
    )
    assert q8.quant and q8.compact
    assert q8.nbytes * 2 <= comp.nbytes + 2048
    s0 = np.asarray(slab_pair_scores(scene["img"], comp))
    s1 = np.asarray(slab_pair_scores(scene["img"], q8))
    # fraction quantization to 1/255: per-sample bilinear-weight error
    # <= ~2/255; the masked mean averages it far down
    np.testing.assert_allclose(s1, s0, rtol=0.02, atol=5e-3)
    # the stage-1 selection the pipeline consumes (top-k) is unchanged
    k = 6
    assert list(np.argsort(s1)[:k]) == list(np.argsort(s0)[:k])


def test_q8_plan_rgb_refresh(scene):
    """Refresh-capable q8 plan: the 4 B target stream re-bakes per query
    exactly like the compact plan's."""
    H, W, _ = scene["img"].shape
    plan = build_grid_plan(
        scene["xyz"], scene["rgb"], scene["mask"],
        scene["trans"], scene["rot"], H, W, compact=True, tp_is_pid=True,
        quant=True,
    )
    rng = np.random.default_rng(11)
    rgb2 = jnp.asarray(
        np.round(rng.random(scene["rgb"].shape) * 255) / 255.0, jnp.float32
    )
    got = np.asarray(slab_pair_scores(scene["img"], plan, rgb=rgb2))
    want = np.asarray(score_pose_grid(
        scene["img"], scene["xyz"], rgb2,
        scene["trans"], scene["rot"], scene["mask"],
    ))
    P = want.shape[0]
    np.testing.assert_allclose(got[:P], want, rtol=0.02, atol=5e-3)


def test_q8_plan_guards(scene):
    """q8 needs compact=True and window <= 256 (9-bit lidx sentinel)."""
    H, W, _ = scene["img"].shape
    with pytest.raises(ValueError, match="compact"):
        build_grid_plan(
            scene["xyz"], scene["rgb"], scene["mask"],
            scene["trans"], scene["rot"], H, W, quant=True,
        )
    with pytest.raises(ValueError, match="window"):
        build_grid_plan(
            scene["xyz"], scene["rgb"], scene["mask"],
            scene["trans"], scene["rot"], H, W, compact=True, quant=True,
            window=512, block=1024,
        )

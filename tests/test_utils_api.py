"""Tests for the auxiliary API surface: warp, bounds, one-shot evaluation,
query sharding, debug visualization."""

import jax.numpy as jnp
import matplotlib

matplotlib.use("Agg")

import numpy as np
import torch
import torch.nn.functional as F

from piccolo_tpu.config import make_config
from piccolo_tpu.harness.localize import _shard_queries
from piccolo_tpu.loss import Pose, sampling_loss
from piccolo_tpu.ops import pose_search_bounds, warp_from_img
from piccolo_tpu.solver import evaluate_poses
from piccolo_tpu.utils.debug import debug_visualize


def test_warp_matches_grid_sample(rng):
    img = rng.random((20, 40, 3)).astype(np.float32)
    grid = (rng.random((8, 16, 2)).astype(np.float32) * 2.2) - 1.1
    ours = np.asarray(warp_from_img(jnp.asarray(img), jnp.asarray(grid)))
    timg = torch.from_numpy(img).permute(2, 0, 1).unsqueeze(0)
    tg = torch.clip(torch.from_numpy(grid).unsqueeze(0), -0.99, 0.99)
    ref = (
        F.grid_sample(timg, tg, align_corners=False, padding_mode="zeros")
        .squeeze(0).permute(1, 2, 0).numpy()
    )
    np.testing.assert_allclose(ours, ref, atol=2e-6)


def test_pose_search_bounds(rng):
    xyz = (rng.random((2000, 3)) * [6, 4, 3] - [3, 2, 0]).astype(np.float32)
    b = pose_search_bounds(jnp.asarray(xyz))
    assert set(b) == {"x", "y", "z", "yaw", "pitch", "roll"}
    assert b["x"][0] < b["x"][1]
    # the box excludes the 5% tails
    assert b["x"][0] > xyz[:, 0].min() - 1e-6
    sl = pose_search_bounds(jnp.asarray(xyz), as_slices=True)
    assert len(sl) == 6 and all(isinstance(s, slice) for s in sl)


def test_evaluate_poses_matches_loss(rng):
    img = rng.random((32, 64, 3)).astype(np.float32)
    xyz = rng.normal(size=(500, 3)).astype(np.float32)
    rgb = rng.random((500, 3)).astype(np.float32)
    trans = rng.normal(size=(3, 3)).astype(np.float32) * 0.2
    ypr = rng.random((3, 3)).astype(np.float32)
    losses, rots = evaluate_poses(
        jnp.asarray(img), jnp.asarray(xyz), jnp.asarray(rgb),
        jnp.asarray(trans), jnp.asarray(ypr),
    )
    assert losses.shape == (3,) and rots.shape == (3, 3, 3)
    for i in range(3):
        pose = Pose(jnp.asarray(trans[i]), jnp.asarray(ypr[i, 0]),
                    jnp.asarray(ypr[i, 1]), jnp.asarray(ypr[i, 2]))
        single = sampling_loss(pose, jnp.asarray(xyz), jnp.asarray(rgb),
                               jnp.asarray(img))
        np.testing.assert_allclose(float(losses[i]), float(single), rtol=1e-6)


def test_query_sharding_partitions():
    files = [f"q{i}" for i in range(10)]
    shards = [
        _shard_queries(make_config(query_shards=3, query_shard_index=i), files)
        for i in range(3)
    ]
    joined = sorted(sum(shards, []))
    assert joined == sorted(files)  # exact partition
    assert all(len(s) >= 3 for s in shards)
    # default: no sharding
    assert _shard_queries(make_config(), files) == files


def test_debug_visualize_shapes(rng):
    for shape in [(8, 8), (8, 8, 3), (8, 8, 1), (8, 8, 4), (2, 8, 8, 3)]:
        fig = debug_visualize(rng.random(shape), show=False)
        assert fig is not None
    # torch input and [0,255] range
    fig = debug_visualize(torch.rand(4, 4, 3) * 255, show=False)
    assert fig is not None

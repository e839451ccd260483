"""Golden tests: bilinear_sample vs torch F.grid_sample (the reference's
native sampling kernel, utils.py:64-103)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from piccolo_tpu.ops.sampling import bilinear_sample


def _torch_sample(img: np.ndarray, coords: np.ndarray) -> np.ndarray:
    """Reference sample_from_img semantics."""
    timg = torch.from_numpy(img).permute(2, 0, 1).unsqueeze(0)
    grid = torch.from_numpy(coords).reshape(1, -1, 1, 2)
    grid = torch.clip(grid, min=-0.99, max=0.99)
    out = F.grid_sample(timg, grid, align_corners=False, padding_mode="zeros")
    return out.squeeze(0).squeeze(-1).T.numpy()


def test_matches_grid_sample_random(rng):
    img = rng.random((37, 53, 3)).astype(np.float32)
    coords = (rng.random((5000, 2)).astype(np.float32) * 2.4) - 1.2  # incl. OOB
    ours = np.asarray(bilinear_sample(jnp.asarray(img), jnp.asarray(coords)))
    ref = _torch_sample(img, coords)
    np.testing.assert_allclose(ours, ref, atol=2e-6)


def test_matches_grid_sample_large_image(rng):
    img = rng.random((512, 1024, 3)).astype(np.float32)
    coords = (rng.random((20000, 2)).astype(np.float32) * 2.0) - 1.0
    ours = np.asarray(bilinear_sample(jnp.asarray(img), jnp.asarray(coords)))
    ref = _torch_sample(img, coords)
    np.testing.assert_allclose(ours, ref, atol=2e-6)


def test_exact_pixel_centers():
    img = np.arange(12, dtype=np.float32).reshape(2, 2, 3)
    H, W = 2, 2
    # align_corners=False: pixel (i, j) center is at
    # x = (2*j + 1)/W - 1, y = (2*i + 1)/H - 1
    coords = []
    for i in range(H):
        for j in range(W):
            coords.append([(2 * j + 1) / W - 1, (2 * i + 1) / H - 1])
    out = np.asarray(bilinear_sample(jnp.asarray(img), jnp.asarray(coords)))
    np.testing.assert_allclose(out, img.reshape(4, 3), atol=1e-6)


def test_gradient_matches_torch(rng):
    img = rng.random((16, 32, 3)).astype(np.float32)
    coords = (rng.random((200, 2)).astype(np.float32) * 1.8) - 0.9

    def f(c):
        return jnp.sum(bilinear_sample(jnp.asarray(img), c) ** 2)

    g_jax = np.asarray(jax.grad(f)(jnp.asarray(coords)))

    timg = torch.from_numpy(img).permute(2, 0, 1).unsqueeze(0)
    tc = torch.from_numpy(coords).requires_grad_()
    grid = torch.clip(tc.reshape(1, -1, 1, 2), min=-0.99, max=0.99)
    out = F.grid_sample(timg, grid, align_corners=False, padding_mode="zeros")
    (out**2).sum().backward()
    np.testing.assert_allclose(g_jax, tc.grad.numpy(), atol=1e-4)


def test_packed_bit_identical(rng):
    """One-gather packed sampling must be bit-identical (values + grads)."""
    from piccolo_tpu.ops.sampling import (
        bilinear_sample_packed,
        pack_bilinear_blocks,
    )

    img = rng.random((37, 53, 3)).astype(np.float32)
    coords = (rng.random((4000, 2)).astype(np.float32) * 2.4) - 1.2
    blocks = pack_bilinear_blocks(jnp.asarray(img))
    a = np.asarray(bilinear_sample(jnp.asarray(img), jnp.asarray(coords)))
    b = np.asarray(
        bilinear_sample_packed(blocks, 37, 53, jnp.asarray(coords))
    )
    np.testing.assert_array_equal(a, b)

    ga = jax.grad(
        lambda c: (bilinear_sample(jnp.asarray(img), c) ** 2).sum()
    )(jnp.asarray(coords))
    gb = jax.grad(
        lambda c: (bilinear_sample_packed(blocks, 37, 53, c) ** 2).sum()
    )(jnp.asarray(coords))
    np.testing.assert_array_equal(np.asarray(ga), np.asarray(gb))


def test_vmap_batched_matches_loop(rng):
    img = rng.random((8, 16, 3)).astype(np.float32)
    coords = (rng.random((4, 50, 2)).astype(np.float32) * 2) - 1
    batched = jax.vmap(lambda c: bilinear_sample(jnp.asarray(img), c))(
        jnp.asarray(coords)
    )
    flat = bilinear_sample(jnp.asarray(img), jnp.asarray(coords.reshape(-1, 2)))
    np.testing.assert_allclose(
        np.asarray(batched).reshape(-1, 3), np.asarray(flat), atol=1e-7
    )


def test_cast_packed_table_u8(rng):
    """uint8 tables: exact for uint8-sourced images, <=1/510-bounded else,
    zero border (the loss's pure-black mask) preserved exactly."""
    from piccolo_tpu.ops.sampling import (
        bilinear_sample_packed,
        cast_packed_table,
        pack_bilinear_blocks,
    )

    # uint8-sourced image (the real data path: panos decode to uint8/255)
    img = (rng.integers(0, 256, (37, 53, 3)) / 255.0).astype(np.float32)
    coords = (rng.random((4000, 2)).astype(np.float32) * 2.4) - 1.2
    blocks = pack_bilinear_blocks(jnp.asarray(img))
    ref = np.asarray(
        bilinear_sample_packed(blocks, 37, 53, jnp.asarray(coords))
    )
    u8 = cast_packed_table(blocks, "uint8")
    assert u8.dtype == jnp.uint8
    out = np.asarray(bilinear_sample_packed(u8, 37, 53, jnp.asarray(coords)))
    np.testing.assert_allclose(out, ref, atol=3e-7)

    # arbitrary float image: per-texel error <= 1/510, lerp can't exceed it
    img2 = rng.random((37, 53, 3)).astype(np.float32)
    blocks2 = pack_bilinear_blocks(jnp.asarray(img2))
    ref2 = np.asarray(
        bilinear_sample_packed(blocks2, 37, 53, jnp.asarray(coords))
    )
    out2 = np.asarray(
        bilinear_sample_packed(
            cast_packed_table(blocks2, "uint8"), 37, 53, jnp.asarray(coords)
        )
    )
    assert np.max(np.abs(out2 - ref2)) <= 1.0 / 510 + 1e-6

    # zero border survives the cast: fully out-of-image sample stays 0
    far = jnp.asarray(np.full((5, 2), 0.999, np.float32))
    # (x, y) = (+0.99, +0.99) clips inside; use the padded border row instead
    border = np.asarray(cast_packed_table(blocks, "uint8"))[0]
    assert (border[:3] == 0).all()  # row 0 = (y0, x0) = (-1, -1) border taps


def test_resolve_descent_table_auto_policy():
    """auto -> f32 in the row-count-bound small-table regime (also the
    torch-trajectory parity mode), bf16 once the packed f32 table is
    footprint-bound (docs/PERFORMANCE.md 'gather rate vs table size')."""
    from piccolo_tpu.ops.sampling import (
        AUTO_BF16_TABLE_BYTES,
        resolve_descent_table,
    )

    assert resolve_descent_table("auto", 512, 1024) == "float32"  # 25 MB
    assert resolve_descent_table("auto", 1024, 2048) == "bfloat16"  # 100 MB
    assert resolve_descent_table("auto", 2048, 4096) == "bfloat16"  # 400 MB
    # explicit dtypes pass through at any size
    for d in ("float32", "bfloat16", "uint8"):
        assert resolve_descent_table(d, 1024, 2048) == d
        assert resolve_descent_table(d, 64, 128) == d
    # the threshold sits strictly between the measured regimes
    assert (513 * 1025) * 48 < AUTO_BF16_TABLE_BYTES < (1025 * 2049) * 48


def test_wrap_mode_blends_across_seam():
    """wrap=True: the left neighbour of column 0 is column W-1 (and vice
    versa); default (clip) mode is bit-unchanged and never crosses."""
    from piccolo_tpu.ops.sampling import (
        bilinear_sample,
        bilinear_sample_packed,
        pack_bilinear_blocks,
    )

    rng = np.random.default_rng(0)
    H, W = 8, 16
    img = jnp.asarray(rng.random((H, W, 3)), jnp.float32)
    # x just past the last pixel centre: x_pix in (W-1, W-0.5) blends
    # columns W-1 and (wrapped) 0
    x_n = 2.0 * ((W - 0.75) + 0.5) / W - 1.0  # x_pix = W - 0.75
    y_n = 0.0
    coords = jnp.asarray([[x_n, y_n]], jnp.float32)

    out_wrap = np.asarray(bilinear_sample(img, coords, wrap=True))[0]
    # analytic: wx1 = 0.25 toward wrapped column 0
    y = ((y_n + 1.0) * H - 1.0) / 2.0
    y0 = int(np.floor(y)); wy1 = y - y0
    expect = (
        (np.asarray(img)[y0, W - 1] * (1 - wy1)
         + np.asarray(img)[y0 + 1, W - 1] * wy1) * 0.75
        + (np.asarray(img)[y0, 0] * (1 - wy1)
           + np.asarray(img)[y0 + 1, 0] * wy1) * 0.25
    )
    np.testing.assert_allclose(out_wrap, expect, atol=1e-6)

    # default mode clips at +-0.99 and cannot see column 0 from the right
    out_clip = np.asarray(bilinear_sample(img, coords))[0]
    assert not np.allclose(out_wrap, out_clip, atol=1e-4)

    # packed wrap table reproduces the direct wrap sampler exactly
    blocks_w = pack_bilinear_blocks(img, wrap=True)
    out_packed = np.asarray(
        bilinear_sample_packed(blocks_w, H, W, coords, wrap=True)
    )[0]
    np.testing.assert_array_equal(out_wrap, out_packed)

    # golden: default tables are bit-identical to the pre-wrap layout
    np.testing.assert_array_equal(
        np.asarray(pack_bilinear_blocks(img)),
        np.asarray(pack_bilinear_blocks(img, wrap=False)),
    )
    # and a batch of interior coords samples identically in both modes
    interior = jnp.asarray(rng.uniform(-0.9, 0.9, (64, 2)), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(bilinear_sample(img, interior)),
        np.asarray(bilinear_sample(img, interior, wrap=True)),
    )


def test_seam_crossing_query_improves_under_wrap():
    """Points projecting into the clipped band near phi=+-pi sample the
    WRONG columns under the reference clip; wrap recovers the true colors
    (SURVEY §7(e) motivation).  Dense analytic image (no splat sparsity):
    column color is a smooth function of azimuth, cloud colors are the
    exact continuous values, so wrap loss ~ interpolation noise while clip
    loss carries the seam-band distortion."""
    from piccolo_tpu.loss import Pose, sampling_loss
    from piccolo_tpu.ops.projection import spherical_project

    H, W = 64, 128
    cols = np.arange(W, dtype=np.float32)
    # periodic column colors (continuous across the seam)
    ang = 2 * np.pi * (cols + 0.5) / W
    img = np.zeros((H, W, 3), np.float32)
    img[:] = np.stack(
        [0.5 + 0.4 * np.sin(ang), 0.5 + 0.4 * np.cos(ang),
         np.full(W, 0.7, np.float32)], axis=-1
    )[None]

    # ring of points around the camera, concentrated near the seam
    # (x < 0 direction maps to x_n ~ +-1 under the projection convention)
    rng = np.random.default_rng(0)
    phi_world = np.pi + rng.uniform(-0.12, 0.12, 512)  # behind the camera
    xyz = np.stack(
        [np.cos(phi_world), np.sin(phi_world),
         rng.uniform(-0.1, 0.1, 512)], axis=-1
    ).astype(np.float32)
    pose = Pose(
        t=jnp.zeros(3), yaw=jnp.asarray(0.0), pitch=jnp.asarray(0.0),
        roll=jnp.asarray(0.0),
    )
    # ground-truth colors = the image sampled WITH wrap (the physically
    # continuous value at each point's azimuth)
    from piccolo_tpu.ops.sampling import bilinear_sample

    coords = spherical_project(jnp.asarray(xyz))
    assert float(jnp.max(jnp.abs(coords[:, 0]))) > 0.995  # hits the band
    rgb = bilinear_sample(jnp.asarray(img), coords, wrap=True)

    loss_clip = float(sampling_loss(pose, jnp.asarray(xyz), rgb,
                                    jnp.asarray(img)))
    loss_wrap = float(sampling_loss(pose, jnp.asarray(xyz), rgb,
                                    jnp.asarray(img), wrap=True))
    assert loss_wrap == 0.0
    assert loss_clip > 1e-4, loss_clip

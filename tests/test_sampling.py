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

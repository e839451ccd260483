"""Golden tests: render_pano vs the reference make_pano semantics
(utils.py:134-205), reimplemented with torch's sequential index_put_."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from piccolo_tpu.ops.pano import render_pano


def _torch_make_pano(xyz, rgb, resolution):
    """Reference make_pano: far-to-near sort + 9-tap last-write-wins splat."""
    xyz = torch.from_numpy(xyz)
    rgb = torch.from_numpy(rgb)
    H, W = resolution
    dist = torch.norm(xyz, dim=-1)
    order = torch.flip(torch.argsort(dist), dims=[0])
    mx = xyz[order]
    mr = rgb[order]

    theta = torch.atan2(torch.norm(mx[:, :2], dim=-1), mx[:, 2] + 1e-6)
    phi = torch.atan2(mx[:, 1], mx[:, 0] + 1e-6) + np.pi
    u = 2 * (1.0 - phi / (2 * np.pi)) - 1
    v = 2 * (theta / np.pi) - 1
    px = (u + 1) / 2 * (W - 1)
    py = (v + 1) / 2 * (H - 1)
    r = py.long()
    c = px.long()

    img = torch.zeros(H, W, 3)
    one = torch.ones_like(r)
    taps = [
        (torch.clamp(r - one, min=0), torch.clamp(c - one, min=0)),  # idx6
        (torch.clamp(r - one, min=0), c),  # idx5
        (torch.clamp(r - one, min=0), torch.clamp(c + one, max=W - 1)),  # idx4
        (torch.clamp(r + one, max=H - 1), torch.clamp(c - one, min=0)),  # idx3
        (torch.clamp(r + one, max=H - 1), c),  # idx2
        (torch.clamp(r + one, max=H - 1), torch.clamp(c + one, max=W - 1)),  # 1
        (r, c),  # centre — painted last
    ]
    # Reference paint order: idx8, idx7, idx6..idx1, centre (utils.py:190-198)
    ordered = [
        (r, torch.clamp(c - one, min=0)),  # idx8
        (r, torch.clamp(c + one, max=W - 1)),  # idx7
        taps[0],  # idx6
        taps[1],  # idx5
        taps[2],  # idx4
        taps[3],  # idx3
        taps[4],  # idx2
        taps[5],  # idx1
        taps[6],  # centre
    ]
    for rr, cc in ordered:
        img.index_put_((rr, cc), mr, accumulate=False)
    return (img * 255).numpy()


def test_matches_reference_splat(rng):
    xyz = rng.normal(size=(800, 3)).astype(np.float32) * 2 + 0.1
    rgb = rng.random((800, 3)).astype(np.float32)
    ref = _torch_make_pano(xyz, rgb, (48, 96))
    ours = np.asarray(render_pano(jnp.asarray(xyz), jnp.asarray(rgb), (48, 96)))
    # Distances are random floats: ties are measure-zero, so the z-buffer
    # winner per (pixel, tap-priority) is unique and the outputs must match.
    np.testing.assert_allclose(ours, ref, atol=1e-3)


def test_point_mask_drops_points(rng):
    xyz = rng.normal(size=(200, 3)).astype(np.float32) + 0.05
    rgb = np.ones((200, 3), np.float32)
    full = np.asarray(render_pano(jnp.asarray(xyz), jnp.asarray(rgb), (16, 32)))
    mask = jnp.zeros(200, dtype=bool)
    empty = np.asarray(
        render_pano(jnp.asarray(xyz), jnp.asarray(rgb), (16, 32), mask)
    )
    assert full.sum() > 0
    assert empty.sum() == 0


def test_masked_equals_subset(rng):
    xyz = rng.normal(size=(300, 3)).astype(np.float32) + 0.05
    rgb = rng.random((300, 3)).astype(np.float32)
    sub = np.asarray(
        render_pano(jnp.asarray(xyz[:120]), jnp.asarray(rgb[:120]), (20, 40))
    )
    mask = jnp.arange(300) < 120
    masked = np.asarray(
        render_pano(jnp.asarray(xyz), jnp.asarray(rgb), (20, 40), mask)
    )
    np.testing.assert_allclose(masked, sub, atol=1e-5)


def test_vmap_batched_render(rng):
    xyz = rng.normal(size=(4, 150, 3)).astype(np.float32) + 0.05
    rgb = rng.random((4, 150, 3)).astype(np.float32)
    batched = jax.vmap(lambda x, r: render_pano(x, r, (16, 32)))(
        jnp.asarray(xyz), jnp.asarray(rgb)
    )
    for i in range(4):
        single = render_pano(jnp.asarray(xyz[i]), jnp.asarray(rgb[i]), (16, 32))
        np.testing.assert_allclose(
            np.asarray(batched[i]), np.asarray(single), atol=1e-5
        )

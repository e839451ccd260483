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


def test_attr_min_matches_pairwise_bruteforce(rng):
    """The dense tap-dilation z-buffer (center scatter + shifted mins) must
    equal a brute-force min over ALL (point, tap) pairs — including the
    clipped-border folds, where border pixels absorb extra taps."""
    from piccolo_tpu.ops.pano import attr_min_keys, attr_min_decode
    from piccolo_tpu.ops.projection import spherical_project

    H, W = 12, 24  # tiny: borders dominate
    N, bits = 600, 10
    xyz = rng.normal(size=(N, 3)).astype(np.float32) * 2 + 0.05
    attr = rng.integers(0, 1 << 9, size=N).astype(np.int32)
    mask = rng.random(N) > 0.1

    got = np.asarray(
        attr_min_decode(
            attr_min_keys(jnp.asarray(xyz), jnp.asarray(attr), bits, (H, W),
                          jnp.asarray(mask)),
            bits,
        )
    ).reshape(H, W)

    # brute force over (point, tap) pairs with the exact packed-key order
    coords = np.asarray(spherical_project(jnp.asarray(xyz)))
    px = (coords[:, 0] + 1) / 2 * (W - 1)
    py = (coords[:, 1] + 1) / 2 * (H - 1)
    c0 = np.floor(px).astype(int)
    r0 = np.floor(py).astype(int)
    dist = np.linalg.norm(xyz, axis=-1)
    dist_bits = (
        np.asarray(dist, np.float32).view(np.uint32) >> (32 - (28 - bits))
    ).astype(np.uint64)
    taps = [(0, 0, 0), (1, 1, 1), (2, 1, 0), (3, 1, -1), (4, -1, 1),
            (5, -1, 0), (6, -1, -1), (7, 0, 1), (8, 0, -1)]
    best = np.full((H, W), np.iinfo(np.uint64).max, np.uint64)
    best_attr = np.full((H, W), -1, np.int64)
    for i in range(N):
        if not mask[i]:
            continue
        for p, dr, dc in taps:
            r = min(max(r0[i] + dr, 0), H - 1)
            c = min(max(c0[i] + dc, 0), W - 1)
            key = (
                (np.uint64(p) << np.uint64(28))
                | (dist_bits[i] << np.uint64(bits))
                | np.uint64(attr[i])
            )
            if key < best[r, c]:
                best[r, c] = key
                best_attr[r, c] = attr[i]
    np.testing.assert_array_equal(got, best_attr)

"""Pallas kernel tests (interpret mode on the CPU test mesh)."""

import jax
import jax.numpy as jnp
import numpy as np

from piccolo_tpu.kernels import histogram_pallas
from piccolo_tpu.ops.histogram import masked_histogram


def test_histogram_pallas_matches_scatter(rng):
    ids = jnp.asarray(rng.integers(0, 512, size=(10000,)), jnp.int32)
    mask = jnp.asarray(rng.random(10000) > 0.4)
    ref = jnp.zeros(512).at[ids].add(mask.astype(jnp.float32))
    out = histogram_pallas(ids, mask, 512)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_histogram_pallas_padding_inert(rng):
    # N not a multiple of the tile size: padding must not add counts
    ids = jnp.asarray(rng.integers(0, 512, size=(3001,)), jnp.int32)
    mask = jnp.ones(3001, bool)
    out = histogram_pallas(ids, mask, 512)
    assert float(out.sum()) == 3001


def test_masked_histogram_use_pallas_path(rng):
    img = (rng.random((30, 60, 3)) * 255).astype(np.float32)
    mask = rng.random((30, 60)) > 0.3
    a = masked_histogram(jnp.asarray(img), jnp.asarray(mask))
    b = masked_histogram(jnp.asarray(img), jnp.asarray(mask), use_pallas=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_block_histogram_pallas_matches_scatter(rng):
    from piccolo_tpu.kernels import block_histogram_pallas

    B, N, nb = 6, 5000, 512
    ids = rng.integers(0, nb, size=(B, N)).astype(np.int32)
    mask = (rng.random((B, N)) > 0.3).astype(np.float32)
    ref = np.zeros((B, nb), np.float32)
    for b in range(B):
        np.add.at(ref[b], ids[b], mask[b])
    out = np.asarray(
        block_histogram_pallas(jnp.asarray(ids), jnp.asarray(mask), nb)
    )
    np.testing.assert_array_equal(out, ref)


def test_block_histogram_pallas_ragged_bins(rng):
    # num_bins not a multiple of the factored lo digit (16): the hi side
    # rounds up and the caller-side slice must drop the phantom bins.
    from piccolo_tpu.kernels import block_histogram_pallas

    B, N, nb = 3, 4097, 100
    ids = rng.integers(0, nb, size=(B, N)).astype(np.int32)
    mask = (rng.random((B, N)) > 0.5).astype(np.float32)
    ref = np.zeros((B, nb), np.float32)
    for b in range(B):
        np.add.at(ref[b], ids[b], mask[b])
    out = np.asarray(
        block_histogram_pallas(jnp.asarray(ids), jnp.asarray(mask), nb)
    )
    np.testing.assert_array_equal(out, ref)


def test_hist_scores_mxu_path_matches_scatter(rng):
    """hist_scores_core with the MXU block-hist must be bit-identical to the
    scatter-add formulation (interpret mode on CPU; validated on real TPU
    at 2M-pixel scale — docs/PERFORMANCE.md)."""
    import jax

    from piccolo_tpu.init.refine import hist_scores_core
    from piccolo_tpu.testing import make_room, render_at

    xyz, rgb = make_room(rng, n_per_wall=400, texture="checker")
    img = render_at(xyz, rgb, np.zeros(3, np.float32),
                    np.array([0.7, 0, 0], np.float32), (32, 64))
    trans = jnp.asarray(rng.normal(size=(4, 3)) * 0.3, jnp.float32)
    yprs = jnp.zeros((4, 3), jnp.float32).at[:, 0].set(
        jnp.asarray(rng.random(4) * 6.28, jnp.float32)
    )
    xyz_j, rgb_j = jnp.asarray(xyz), jnp.asarray(rgb)
    a = hist_scores_core(img, xyz_j, rgb_j, trans, yprs, None, 4, 4, 4,
                         use_mxu_hist=False)
    b = hist_scores_core(img, xyz_j, rgb_j, trans, yprs, None, 4, 4, 4,
                         use_mxu_hist=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

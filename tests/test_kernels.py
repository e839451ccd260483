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

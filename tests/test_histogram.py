"""Golden tests: masked histograms vs the reference color_utils.histogram
(color_utils.py:68-119) and blockwise consistency."""

import jax.numpy as jnp
import numpy as np
import torch

from piccolo_tpu.ops.histogram import (
    block_histograms,
    histogram_intersection,
    masked_histogram,
)


def _torch_histogram(img255, mask, channels=(8, 8, 8)):
    """Reference unbatched histogram branch."""
    tgt = torch.from_numpy(img255).clone()
    m = torch.from_numpy(mask)
    max_rgb = torch.LongTensor([255] * 3)
    bin_size = torch.ceil(max_rgb.float() / torch.tensor(channels).float()).long()
    tgt_rgb = tgt[torch.nonzero(m.long(), as_tuple=True)].long()
    tgt_rgb = tgt_rgb // bin_size.reshape(-1, 3)
    flat = tgt_rgb[:, 0] + channels[0] * tgt_rgb[:, 1] + channels[0] * channels[1] * tgt_rgb[:, 2]
    hist = torch.bincount(flat, minlength=np.prod(channels)).float()
    hist = hist / hist.sum()
    return hist.numpy()


def test_histogram_matches_reference(rng):
    img = (rng.random((30, 60, 3)) * 255).astype(np.float32)
    mask = rng.random((30, 60)) > 0.3
    ref = _torch_histogram(img, mask)
    ours = np.asarray(masked_histogram(jnp.asarray(img), jnp.asarray(mask)))
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_intersection_matches_reference(rng):
    h1 = rng.random(512).astype(np.float32)
    h2 = rng.random(512).astype(np.float32)
    h1 /= h1.sum()
    h2 /= h2.sum()
    ref = float(torch.min(torch.from_numpy(h1), torch.from_numpy(h2)).sum())
    ours = float(histogram_intersection(jnp.asarray(h1), jnp.asarray(h2)))
    np.testing.assert_allclose(ours, ref, rtol=1e-6)
    # identical histograms intersect to 1
    same = float(histogram_intersection(jnp.asarray(h1), jnp.asarray(h1)))
    np.testing.assert_allclose(same, 1.0, rtol=1e-5)


def test_block_histograms_sum_to_global(rng):
    img = (rng.random((32, 64, 3)) * 255).astype(np.float32)
    mask = rng.random((32, 64)) > 0.5
    hists, counts = block_histograms(jnp.asarray(img), jnp.asarray(mask), (8, 8, 8), 4, 4)
    assert hists.shape == (16, 512)
    # every masked pixel lands in exactly one block (dims divide evenly here)
    np.testing.assert_allclose(float(counts.sum()), float(mask.sum()), atol=0)
    # block (0,0) equals a direct histogram of that region
    sub = np.asarray(
        masked_histogram(
            jnp.asarray(img[:8, :16]), jnp.asarray(mask[:8, :16]), normalize=False
        )
    )
    np.testing.assert_allclose(np.asarray(hists[0]), sub, atol=0)


def test_block_histograms_remainder_ignored(rng):
    # H=33 not divisible by 4: the trailing row falls outside every block
    img = (rng.random((33, 64, 3)) * 255).astype(np.float32)
    mask = np.ones((33, 64), bool)
    _, counts = block_histograms(jnp.asarray(img), jnp.asarray(mask), (8, 8, 8), 4, 4)
    assert float(counts.sum()) == 32 * 64

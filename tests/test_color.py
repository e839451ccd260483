"""Golden tests: color harmonization vs the reference semantics
(color_utils.py:7-65, 146-234) reimplemented with torch/cv2."""

import numpy as np
import pytest
import torch

from piccolo_tpu.color import color_match, color_mod, rgb_to_ycrcb, ycrcb_to_rgb

cv2 = pytest.importorskip("cv2")


def _ref_color_mod(img, rgb, num_bins):
    """Reference color_mod semantics (torch + cv2)."""
    timg = torch.from_numpy(img).reshape(-1, 3).clone()
    trgb = torch.from_numpy(rgb).clone()
    H, W, _ = img.shape

    sel = (timg * 255).long().sum(-1) > 0
    tgt = timg[sel]
    tgt = cv2.cvtColor(
        (tgt * 255.0).numpy().astype(np.uint8).reshape(1, -1, 3),
        cv2.COLOR_RGB2YCR_CB,
    ).squeeze()
    mod_rgb = cv2.cvtColor(
        (trgb * 255.0).numpy().astype(np.uint8).reshape(1, -1, 3),
        cv2.COLOR_RGB2YCR_CB,
    ).squeeze()
    tgt = torch.from_numpy(tgt) / 255.0
    mod_rgb = torch.from_numpy(mod_rgb) / 255.0

    ih = torch.bincount((tgt[:, 0] * (num_bins - 1)).long(), minlength=num_bins).float()
    rh = torch.bincount((mod_rgb[:, 0] * (num_bins - 1)).long(), minlength=num_bins).float()
    tot = ih + rh
    tot /= tot.sum()
    tot = torch.cumsum(tot, 0)

    tgt[:, 0] = torch.take(tot, (tgt[:, 0] * (num_bins - 1)).long())
    tgt = cv2.cvtColor((tgt * 255.0).numpy().astype(np.uint8).reshape(1, -1, 3), cv2.COLOR_YCR_CB2RGB)
    tgt = torch.from_numpy(tgt).reshape(-1, 3) / 255.0
    timg[sel] = tgt
    out_img = timg.reshape(H, W, 3)

    mod_rgb[:, 0] = torch.take(tot, (mod_rgb[:, 0] * (num_bins - 1)).long())
    mod_rgb = cv2.cvtColor((mod_rgb * 255.0).numpy().astype(np.uint8).reshape(1, -1, 3), cv2.COLOR_YCR_CB2RGB)
    out_rgb = torch.from_numpy(mod_rgb).reshape(-1, 3) / 255.0
    return out_img.numpy(), out_rgb.numpy()


def test_ycrcb_roundtrip_matches_cv2(rng):
    vals = (rng.random((1000, 3)) * 255).astype(np.uint8)
    ours = rgb_to_ycrcb(vals)
    ref = cv2.cvtColor(vals.reshape(1, -1, 3), cv2.COLOR_RGB2YCR_CB).reshape(-1, 3)
    np.testing.assert_array_equal(ours, ref)
    back = ycrcb_to_rgb(ours)
    ref_back = cv2.cvtColor(ours.reshape(1, -1, 3), cv2.COLOR_YCR_CB2RGB).reshape(-1, 3)
    np.testing.assert_array_equal(back, ref_back)


def test_color_mod_matches_reference(rng):
    img = (rng.random((24, 48, 3)).astype(np.float32) * 255).astype(np.uint8) / 255.0
    img = img.astype(np.float32)
    img[:4, :4] = 0.0  # black patch stays untouched
    rgb = (rng.random((3000, 3)).astype(np.float32) * 255).astype(np.uint8) / 255.0
    rgb = rgb.astype(np.float32)

    ref_img, ref_rgb = _ref_color_mod(img, rgb, 256)
    our_img, our_rgb = color_mod(img, rgb, 256)
    np.testing.assert_allclose(our_img, ref_img, atol=1e-6)
    np.testing.assert_allclose(our_rgb, ref_rgb, atol=1e-6)
    # black pixels untouched
    assert np.all(our_img[:4, :4] == 0)


def test_color_match_statistics(rng):
    """color_match shifts the image CDF toward the cloud's colors."""
    img = np.clip(rng.random((32, 64, 3)) * 0.5, 0, 1).astype(np.float32)  # dark image
    img = (img * 255).astype(np.uint8) / 255.0
    img = img.astype(np.float32)
    rgb = np.clip(0.5 + rng.random((5000, 3)) * 0.5, 0, 1).astype(np.float32)  # bright cloud

    out = color_match(img, rgb)
    assert out.shape == img.shape
    assert out.dtype == np.float32
    # matched image mean moves toward the (brighter) cloud mean
    assert out.mean() > img.mean()
    # output values live within the template's value range
    assert out.max() <= rgb.max() + 1e-6


def test_color_match_preserves_black(rng):
    img = (rng.random((16, 32, 3)) * 255).astype(np.uint8) / 255.0
    img = img.astype(np.float32)
    img[:8] = 0.0
    rgb = rng.random((1000, 3)).astype(np.float32)
    out = color_match(img, rgb)
    assert np.all(out[:8] == 0)


def test_color_match_device_matches_host(rng):
    """The tracking fast path's device CDF matching (color_match_device +
    cloud_color_cdf) reproduces the host color_match to f32 quantile noise
    (the image-side CDF accumulates in f32 on-device vs f64 on host)."""
    import jax.numpy as jnp

    from piccolo_tpu.color import cloud_color_cdf, color_match_device

    img = (rng.random((64, 128, 3)) * 255).astype(np.uint8).astype(np.float32) / 255.0
    img[5:9, 10:20] = 0.0  # black patch must pass through untouched
    rgb = rng.random((5000, 3)).astype(np.float32)

    host = color_match(img.copy(), rgb)
    vals, qnt = cloud_color_cdf(rgb)
    dev = np.asarray(
        color_match_device(jnp.asarray(img), jnp.asarray(vals), jnp.asarray(qnt))
    )
    assert np.abs(host - dev).max() < 1e-5
    assert np.all(dev[5:9, 10:20] == 0.0)


def test_cloud_color_cdf_padding_inert(rng):
    """Channels with fewer unique values pad with strictly increasing
    quant > 1 — jnp.interp over the padded arrays equals np.interp over
    the unpadded per-channel CDFs for any query in [0, 1]."""
    import jax.numpy as jnp

    from piccolo_tpu.color import cloud_color_cdf

    rgb = rng.random((2000, 3)).astype(np.float32)
    rgb[:, 2] = np.round(rgb[:, 2] * 7) / 7  # few unique values -> heavy pad
    vals, qnt = cloud_color_cdf(rgb)
    q = np.linspace(0, 1, 513).astype(np.float32)
    for c in range(3):
        v, cnt = np.unique(rgb[:, c], return_counts=True)
        ref = np.interp(q, np.cumsum(cnt) / rgb.shape[0], v)
        got = np.asarray(jnp.interp(jnp.asarray(q), jnp.asarray(qnt[c]),
                                    jnp.asarray(vals[c])))
        np.testing.assert_allclose(got, ref, atol=1e-6)

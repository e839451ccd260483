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


def test_ycrcb_int32_exhaustive_vs_cv2():
    """The int32 fixed-point YCrCb conversions (the no-cv2 host fallback
    AND the device sharpen's math) equal cv2 BIT-FOR-BIT over all 256^3
    uint8 triples, in both directions (chunked to bound peak memory)."""
    from piccolo_tpu.color import _rgb2ycrcb_i32, _ycrcb2rgb_i32

    n = 256 ** 3
    step = 1 << 22
    base = np.arange(step, dtype=np.int64)
    for lo in range(0, n, step):
        v = lo + base
        tri = np.stack([v >> 16, (v >> 8) & 255, v & 255], -1).astype(np.uint8)
        ref = cv2.cvtColor(tri.reshape(1, -1, 3), cv2.COLOR_RGB2YCR_CB)
        got = _rgb2ycrcb_i32(tri.astype(np.int32)).astype(np.uint8)
        np.testing.assert_array_equal(got, ref.reshape(-1, 3))
        ref_b = cv2.cvtColor(tri.reshape(1, -1, 3), cv2.COLOR_YCR_CB2RGB)
        got_b = _ycrcb2rgb_i32(tri.astype(np.int32)).astype(np.uint8)
        np.testing.assert_array_equal(got_b, ref_b.reshape(-1, 3))


def test_color_mod_device_matches_host(rng):
    """The tracking fast path's device sharpen (cloud_sharpen_state +
    color_mod_device) reproduces the host color_mod: the YCrCb math and
    the LUT are integer-exact, so the only permitted delta is the
    documented f64-vs-int32 truncation boundary — at most ONE uint8 level
    (a Y-level shift moves every RGB channel by exactly that level), at a
    tiny per-pixel rate.  Black pixels and padding rows stay exact black."""
    import jax.numpy as jnp

    from piccolo_tpu.color import (
        SharpenState,
        cloud_sharpen_state,
        color_mod_device,
    )

    img = (rng.random((48, 96, 3)) * 255).astype(np.uint8)
    imgf = img.astype(np.float32) / 255.0
    imgf[:6, :6] = 0.0
    rgb = (rng.random((3000, 3)) * 255).astype(np.uint8).astype(np.float32) / 255.0

    h_img, h_rgb = color_mod(imgf.copy(), rgb, 256)
    st = cloud_sharpen_state(rgb, pad_to=3300)
    st_j = SharpenState(*(jnp.asarray(a) for a in st))
    d_img, d_rgb = color_mod_device(jnp.asarray(imgf), st_j)
    d_img, d_rgb = np.asarray(d_img), np.asarray(d_rgb)

    tol = 1.001 / 255.0
    assert np.abs(d_img - h_img).max() <= tol
    assert np.abs(d_rgb[:3000] - h_rgb).max() <= tol
    assert (np.abs(d_img - h_img) > 1e-7).mean() < 1e-3
    assert np.all(d_img[:6, :6] == 0.0)
    assert np.all(d_rgb[3000:] == 0.0)


def test_cloud_sharpen_state_validation(rng):
    from piccolo_tpu.color import cloud_sharpen_state

    rgb = rng.random((100, 3)).astype(np.float32)
    with pytest.raises(ValueError, match="num_bins"):
        cloud_sharpen_state(rgb, num_bins=128)
    with pytest.raises(ValueError, match="pad_to"):
        cloud_sharpen_state(rgb, pad_to=50)


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

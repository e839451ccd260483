"""Golden tests: sampling loss value/gradients vs the reference semantics
(torch reimplementation of omniloc.py SamplingLoss:160-202)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from piccolo_tpu.loss import Pose, sampling_loss


def _torch_loss(img, xyz, rgb, t, yaw, pitch, roll):
    timg = torch.from_numpy(img)
    txyz = torch.from_numpy(xyz)
    trgb = torch.from_numpy(rgb)
    tt = torch.tensor(t.reshape(3, 1), requires_grad=True)
    ty = torch.tensor([yaw], requires_grad=True)
    tp = torch.tensor([pitch], requires_grad=True)
    tr = torch.tensor([roll], requires_grad=True)

    t0 = torch.zeros(1)
    t1 = torch.ones(1)
    RX = torch.stack(
        [
            torch.stack([t1, t0, t0]),
            torch.stack([t0, torch.cos(tr), -torch.sin(tr)]),
            torch.stack([t0, torch.sin(tr), torch.cos(tr)]),
        ]
    ).reshape(3, 3)
    RY = torch.stack(
        [
            torch.stack([torch.cos(tp), t0, torch.sin(tp)]),
            torch.stack([t0, t1, t0]),
            torch.stack([-torch.sin(tp), t0, torch.cos(tp)]),
        ]
    ).reshape(3, 3)
    RZ = torch.stack(
        [
            torch.stack([torch.cos(ty), -torch.sin(ty), t0]),
            torch.stack([torch.sin(ty), torch.cos(ty), t0]),
            torch.stack([t0, t0, t1]),
        ]
    ).reshape(3, 3)
    R = RZ @ RY @ RX

    new_xyz = (R @ (txyz.T - tt)).T
    theta = torch.atan2(torch.norm(new_xyz[:, :2], dim=-1), new_xyz[:, 2] + 1e-6)
    phi = torch.atan2(new_xyz[:, 1], new_xyz[:, 0] + 1e-6) + np.pi
    coord = torch.stack(
        [1.0 - phi / (2 * np.pi), theta / np.pi], dim=-1
    ) * 2 - 1

    grid = torch.clip(coord.reshape(1, -1, 1, 2), -0.99, 0.99)
    sample = F.grid_sample(
        timg.permute(2, 0, 1).unsqueeze(0),
        grid,
        align_corners=False,
        padding_mode="zeros",
    )
    sample = sample.squeeze(0).squeeze(-1).T
    mask = torch.sum(sample == 0, dim=1) != 3
    loss = torch.norm(sample[mask] - trgb[mask], dim=-1).mean()
    loss.backward()
    return (
        loss.item(),
        tt.grad.numpy().reshape(3),
        float(ty.grad),
        float(tp.grad),
        float(tr.grad),
    )


def _fixture(rng, n=4000, h=64, w=128):
    img = rng.random((h, w, 3)).astype(np.float32)
    xyz = rng.normal(size=(n, 3)).astype(np.float32) * 2.0
    rgb = rng.random((n, 3)).astype(np.float32)
    return img, xyz, rgb


def test_loss_value_matches_torch(rng):
    img, xyz, rgb = _fixture(rng)
    t = np.array([0.2, -0.1, 0.05], np.float32)
    yaw, pitch, roll = 0.3, -0.2, 0.1
    ref, *_ = _torch_loss(img, xyz, rgb, t, yaw, pitch, roll)
    pose = Pose(
        jnp.asarray(t), jnp.float32(yaw), jnp.float32(pitch), jnp.float32(roll)
    )
    ours = float(
        sampling_loss(pose, jnp.asarray(xyz), jnp.asarray(rgb), jnp.asarray(img))
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_loss_gradients_match_torch(rng):
    img, xyz, rgb = _fixture(rng, n=2000)
    t = np.array([-0.3, 0.2, 0.1], np.float32)
    yaw, pitch, roll = -0.5, 0.15, 0.4
    ref_loss, g_t, g_y, g_p, g_r = _torch_loss(img, xyz, rgb, t, yaw, pitch, roll)

    pose = Pose(
        jnp.asarray(t), jnp.float32(yaw), jnp.float32(pitch), jnp.float32(roll)
    )
    loss, grads = jax.value_and_grad(
        lambda p: sampling_loss(
            p, jnp.asarray(xyz), jnp.asarray(rgb), jnp.asarray(img)
        )
    )(pose)
    np.testing.assert_allclose(float(loss), ref_loss, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(grads.t), g_t, rtol=2e-3, atol=1e-6)
    np.testing.assert_allclose(float(grads.yaw), g_y, rtol=2e-3, atol=1e-6)
    np.testing.assert_allclose(float(grads.pitch), g_p, rtol=2e-3, atol=1e-6)
    np.testing.assert_allclose(float(grads.roll), g_r, rtol=2e-3, atol=1e-6)


def test_point_mask_equals_subset(rng):
    """Masked padded cloud == loss on the unpadded subset."""
    img, xyz, rgb = _fixture(rng, n=1000)
    pose = Pose(jnp.zeros(3), jnp.float32(0.1), jnp.float32(0.0), jnp.float32(0.0))
    full = sampling_loss(
        pose, jnp.asarray(xyz[:700]), jnp.asarray(rgb[:700]), jnp.asarray(img)
    )
    mask = jnp.arange(1000) < 700
    padded = sampling_loss(
        pose, jnp.asarray(xyz), jnp.asarray(rgb), jnp.asarray(img), mask
    )
    np.testing.assert_allclose(float(full), float(padded), rtol=1e-6)


def test_grads_finite_with_black_pixels(rng):
    """Exact-zero samples (masked out) must not poison gradients with NaN."""
    img, xyz, rgb = _fixture(rng)
    img = img.copy()
    img[:, :40] = 0.0  # big black region
    rgb[:50] = 0.0  # some points match sampled zeros exactly
    pose = Pose(jnp.zeros(3), jnp.float32(0.0), jnp.float32(0.0), jnp.float32(0.0))
    grads = jax.grad(
        lambda p: sampling_loss(
            p, jnp.asarray(xyz), jnp.asarray(rgb), jnp.asarray(img)
        )
    )(pose)
    for leaf in jax.tree.leaves(grads):
        assert np.all(np.isfinite(np.asarray(leaf)))

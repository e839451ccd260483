"""Golden tests: spherical projection vs the reference math (torch impl)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from piccolo_tpu.ops.projection import spherical_project


def _torch_cloud2idx(xyz: torch.Tensor) -> torch.Tensor:
    """Reference cloud2idx semantics (utils.py:16-61), reimplemented for
    testing only."""
    theta = torch.unsqueeze(
        torch.atan2(torch.norm(xyz[:, :2], dim=-1), xyz[:, 2] + 1e-6), 1
    )
    phi = torch.atan2(xyz[:, 1:2], xyz[:, 0:1] + 1e-6)
    phi += np.pi
    sphere = torch.cat([phi, theta], dim=-1)
    coord = torch.stack(
        [1.0 - sphere[:, 0] / (np.pi * 2), sphere[:, 1] / np.pi], dim=-1
    )
    return 2 * coord - 1


def test_matches_reference_formula(rng):
    pts = rng.normal(size=(2000, 3)).astype(np.float32) * 3.0
    ours = np.asarray(spherical_project(jnp.asarray(pts)))
    ref = _torch_cloud2idx(torch.from_numpy(pts)).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_analytic_directions():
    # +x axis: phi = pi -> u = 0 ; equator -> v = 0
    pts = jnp.array(
        [
            [1.0, 0.0, 0.0],  # forward
            [0.0, 0.0, 1.0],  # up (theta=0 -> v=-1)
            [0.0, 0.0, -1.0],  # down (theta=pi -> v=+1)
        ]
    )
    c = np.asarray(spherical_project(pts))
    np.testing.assert_allclose(c[0], [0.0, 0.0], atol=1e-5)
    assert c[1][1] < -0.999
    assert c[2][1] > 0.999


def test_batched_via_vmap(rng):
    pts = rng.normal(size=(4, 100, 3)).astype(np.float32)
    single = spherical_project(jnp.asarray(pts.reshape(-1, 3))).reshape(4, 100, 2)
    batched = jax.vmap(spherical_project)(jnp.asarray(pts))
    np.testing.assert_allclose(np.asarray(batched), np.asarray(single), atol=1e-7)


def test_grad_finite_at_origin():
    # The safe norm keeps gradients finite at x=y=0.
    g = jax.grad(lambda p: spherical_project(p).sum())(
        jnp.array([[0.0, 0.0, 1.0]])
    )
    assert np.all(np.isfinite(np.asarray(g)))

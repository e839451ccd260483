"""Dense ray-cast oracle: projection consistency, occlusion, pose recovery.

The ray caster inverts the exact spherical_project + grid_sample
(align_corners=False) conventions, so a visible cloud point must bilinearly
sample (approximately) its own color from the rendered panorama — the
property the sampling loss relies on.
"""

import jax.numpy as jnp
import numpy as np

from piccolo_tpu.init import default_init_dict
from piccolo_tpu.init.candidates import generate_rot_points, generate_trans_points
from piccolo_tpu.loss import Pose, sampling_loss
from piccolo_tpu.ops.projection import spherical_project
from piccolo_tpu.ops.quantile import cloud_bounds
from piccolo_tpu.ops.rotation import rot_from_ypr
from piccolo_tpu.ops.sampling import bilinear_sample
from piccolo_tpu.pipeline import localize_query
from piccolo_tpu.testing import (
    RoomScene,
    _occluder_color,
    make_scene,
    raycast_pano,
    scene_cloud,
    scene_pose,
)


def _cam(xyz, t, ypr):
    R = rot_from_ypr(jnp.asarray(ypr, jnp.float32))
    return jnp.einsum(
        "nj,kj->nk",
        jnp.asarray(xyz, jnp.float32) - jnp.asarray(t, jnp.float32),
        R,
        precision="highest",
    )


def test_every_pixel_lit(rng):
    scene = make_scene(rng, n_occluders=2)
    img = raycast_pano(scene, np.zeros(3), np.array([0.7, 0.1, -0.05]), (64, 128))
    assert img.shape == (64, 128, 3)
    assert np.isfinite(img).all()
    # textures clip to >= 0.05 per channel: a dense render has no black
    assert img.min() >= 0.05 - 1e-6
    assert img.max() <= 1.0 + 1e-6


def test_visible_points_sample_their_own_color(rng):
    # smooth texture (no checker edges) so the per-pixel color variation
    # bounds the expected bilinear error
    scene = make_scene(rng, texture="gradient")
    xyz, rgb = scene_cloud(scene, rng, 4000)
    t = np.array([0.4, -0.2, 0.1], np.float32)
    ypr = np.array([1.1, 0.0, 0.0], np.float32)
    img = raycast_pano(scene, t, ypr, (256, 512))
    cam = _cam(xyz, t, ypr)
    sampled = np.asarray(
        bilinear_sample(jnp.asarray(img), spherical_project(cam))
    )
    err = np.abs(sampled - rgb).max(axis=1)
    # no occluders -> every point is visible; tolerance covers bilinear
    # blending across the texture gradient at this resolution
    assert np.median(err) < 0.02
    assert np.quantile(err, 0.95) < 0.08


def test_gt_loss_beats_perturbed_loss(rng):
    scene = make_scene(rng, n_occluders=2, texture="checker")
    xyz, rgb = scene_cloud(scene, rng, 6000)
    t = np.array([-0.5, 0.3, -0.2], np.float32)
    ypr = np.array([2.0, 0.0, 0.0], np.float32)
    img = jnp.asarray(raycast_pano(scene, t, ypr, (128, 256)))
    xyz_j, rgb_j = jnp.asarray(xyz), jnp.asarray(rgb)

    def loss_at(tt, yy):
        yy = jnp.asarray(yy, jnp.float32)
        pose = Pose(t=jnp.asarray(tt, jnp.float32), yaw=yy[0], pitch=yy[1],
                    roll=yy[2])
        return float(sampling_loss(pose, xyz_j, rgb_j, img))

    gt = loss_at(t, ypr)
    far = loss_at(t + np.array([0.8, 0.0, 0.0], np.float32), ypr)
    rot = loss_at(t, ypr + np.array([0.5, 0.0, 0.0], np.float32))
    assert gt < 0.5 * far
    assert gt < 0.5 * rot


def test_occlusion_is_geometric():
    # deterministic scene: a box between the camera (origin) and the +x wall
    box = np.array([[1.5, -0.5, -1.5], [2.5, 0.5, 0.5]], np.float32)
    hue = np.array([0.8, 0.4, 0.05], np.float32)
    scene = RoomScene(
        size=(6.0, 4.0, 3.0),
        texture="gradient",
        occluders=box[None],
        occluder_hues=hue[None],
    )
    img = raycast_pano(scene, np.zeros(3), np.zeros(3), (256, 512))
    # the ray along +x (theta=pi/2, phi-pi=0) hits the box face x=1.5
    # instead of the wall at x=3
    coords = spherical_project(jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32))
    front = np.asarray(bilinear_sample(jnp.asarray(img), coords))[0]
    expect = _occluder_color(np.array([1.5, 0.0, 0.0]), 0, hue)
    np.testing.assert_allclose(front, expect, atol=0.05)
    # the ray along -x sees the unobstructed x=-3 wall (base red 0.25)
    coords = spherical_project(jnp.asarray([[-1.0, 0.0, 0.0]], jnp.float32))
    back = np.asarray(bilinear_sample(jnp.asarray(img), coords))[0]
    # wall color at u=v=0.5: base + 0.5*[0.5, 0.5, 0.25]
    np.testing.assert_allclose(back, [0.5, 0.25, 0.125], atol=0.05)


def test_floor_referenced_scene(rng):
    # floor at z=0: cloud spans [0, h], camera height band honored, and the
    # projection-consistency property holds with the nonzero scene center
    scene = make_scene(rng, size=(5.0, 4.0, 3.0), n_occluders=1,
                       texture="gradient", floor_at_zero=True)
    xyz, rgb = scene_cloud(scene, rng, 4000)
    assert xyz[:, 2].min() > -1e-5 and xyz[:, 2].max() < 3.0 + 1e-5
    t, ypr = scene_pose(scene, rng, z_range=(1.3, 1.7))
    assert 1.3 <= t[2] <= 1.7
    img = raycast_pano(scene, t, ypr, (128, 256))
    assert img.min() >= 0.05 - 1e-6
    cam = _cam(xyz, t, ypr)
    sampled = np.asarray(
        bilinear_sample(jnp.asarray(img), spherical_project(cam))
    )
    err = np.abs(sampled - rgb).max(axis=1)
    # occluded wall points sample occluder colors — median over all points
    # still tracks (one small occluder), tail is the occlusion shadow
    assert np.median(err) < 0.04


def test_pipeline_recovers_pose_from_raycast_pano(rng):
    scene = make_scene(rng, n_occluders=1, texture="checker")
    xyz, rgb = scene_cloud(scene, rng, 7000)
    gt_t = np.array([0.5, -0.3, 0.2], np.float32)
    gt_ypr = np.array([1.2, 0.0, 0.0], np.float32)
    img = jnp.asarray(raycast_pano(scene, gt_t, gt_ypr, (128, 256)))
    d = default_init_dict(
        xy_only=True, num_trans=20, yaw_only=True, num_yaw=4, z_prior=None,
        num_split_h=4, num_split_w=4,
    )
    trans = generate_trans_points(xyz, d)
    rot = generate_rot_points(d)
    lo, hi = cloud_bounds(jnp.asarray(xyz), 0.05)
    res = localize_query(
        img, img, jnp.asarray(xyz), jnp.asarray(rgb),
        jnp.asarray(trans), jnp.asarray(rot),
        jnp.ones(trans.shape[0], bool), lo, hi,
        num_intermediate=10, num_input=4, num_iter=80,
    )
    assert float(jnp.linalg.norm(res.t - jnp.asarray(gt_t))) < 0.2


def test_realism_degradations():
    """Capture-realism arms: image arms keep shape/dtype and actually
    change the capture; cloud arms perturb/remove points as specified."""
    from piccolo_tpu.testing import (
        apply_cloud_realism,
        apply_image_realism,
        make_scene,
        raycast_pano,
        scene_cloud,
    )

    rng = np.random.default_rng(9)
    scene = make_scene(rng, size=(4.0, 3.0, 2.5), n_occluders=1)
    u8 = (raycast_pano(scene, np.zeros(3, np.float32),
                       np.zeros(3, np.float32), (64, 128)) * 255
          ).astype(np.uint8)
    for arm, val in (("noise", 0.02), ("jpeg", 60), ("blur", 9),
                     ("vignette", 0.4)):
        out = apply_image_realism(u8, arm, val, rng)
        assert out.shape == u8.shape and out.dtype == np.uint8
        assert not np.array_equal(out, u8), arm
    # vignette darkens top/bottom rows, keeps the equator untouched
    vig = apply_image_realism(u8, "vignette", 0.4, rng)
    assert vig[0].sum() <= u8[0].sum()
    assert np.array_equal(vig[32], u8[32])

    xyz, rgb = scene_cloud(scene, rng, 5000)
    x2, r2 = apply_cloud_realism(xyz, rgb, "depth-noise", 0.01, rng)
    assert x2.shape == xyz.shape and r2.shape == rgb.shape
    d = np.linalg.norm(x2 - xyz, axis=1)
    assert 0.005 < float(d.mean()) < 0.05
    x3, r3 = apply_cloud_realism(xyz, rgb, "holes", 0.10, rng)
    kept = x3.shape[0] / xyz.shape[0]
    assert 0.85 < kept < 0.95 and r3.shape[0] == x3.shape[0]

    import pytest

    with pytest.raises(ValueError, match="unknown"):
        apply_image_realism(u8, "fog", 1.0, rng)
    with pytest.raises(ValueError, match="uint8"):
        apply_image_realism(u8.astype(np.float32), "noise", 0.02, rng)

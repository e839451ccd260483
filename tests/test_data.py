"""Data layer: txt loaders (native + pandas parity), GT pose conventions."""

import json
import os

import numpy as np
import pytest
import torch
from scipy.spatial.transform import Rotation

from piccolo_tpu.data import (
    load_txt_pointcloud,
    obtain_gt_omniscenes,
    obtain_gt_stanford,
)
from piccolo_tpu.native import txt_loader


def _write_cloud(path, n, rng):
    xyz = rng.normal(size=(n, 3)) * 3
    rgb = (rng.random((n, 3)) * 255).astype(np.int64)
    with open(path, "w") as f:
        for p, c in zip(xyz, rgb):
            f.write(f"{p[0]:.6f} {p[1]:.6f} {p[2]:.6f} {c[0]} {c[1]} {c[2]}\n")
    return xyz, rgb


def test_native_loader_matches_pandas(tmp_path, rng):
    path = str(tmp_path / "cloud.txt")
    _write_cloud(path, 5000, rng)
    if not txt_loader.available():
        pytest.skip("native toolchain unavailable")
    native = txt_loader.load(path)
    import pandas as pd

    ref = pd.read_table(path, header=None, sep=r"\s+").values
    assert native.shape == ref.shape
    np.testing.assert_allclose(native, ref, rtol=1e-12, atol=1e-9)


def test_native_loader_formats(tmp_path, rng):
    """Exponent notation, CRLF line endings, blank lines, signed values."""
    if not txt_loader.available():
        pytest.skip("native toolchain unavailable")
    path = str(tmp_path / "tricky.txt")
    with open(path, "wb") as f:
        f.write(b"1.5e-3 -2.75 +3.25e2 255 0 128\r\n")
        f.write(b"\r\n")
        f.write(b"  -0.001 4e1 5 1 2 3\n")
        f.write(b"7 8 9 10 11 12")  # no trailing newline
    out = txt_loader.load(path)
    exp = np.array([
        [1.5e-3, -2.75, 3.25e2, 255, 0, 128],
        [-0.001, 40.0, 5, 1, 2, 3],
        [7, 8, 9, 10, 11, 12],
    ])
    assert out.shape == (3, 6)
    np.testing.assert_allclose(out, exp, rtol=1e-12)


def test_load_txt_pointcloud_scaling(tmp_path, rng):
    path = str(tmp_path / "cloud.txt")
    xyz, rgb = _write_cloud(path, 1000, rng)
    X, C = load_txt_pointcloud(path)
    np.testing.assert_allclose(X, xyz, atol=1e-5)
    np.testing.assert_allclose(C, rgb / 255.0, atol=1e-9)
    assert C.min() >= 0 and C.max() <= 1


def test_subsample_rate(tmp_path, rng):
    path = str(tmp_path / "cloud.txt")
    _write_cloud(path, 1000, rng)
    np.random.seed(2)
    X, C = load_txt_pointcloud(path, sample_rate=4)
    assert X.shape[0] == 250
    # seeded global stream -> reproducible subset
    np.random.seed(2)
    X2, _ = load_txt_pointcloud(path, sample_rate=4)
    np.testing.assert_array_equal(X, X2)


def _ref_gt_stanford_small(pose, torch_like=True):
    """Reference GT convention for areas < 10 (data_utils.py:59-90)."""
    cam_loc = np.array(pose["camera_location"])
    r = Rotation.from_euler("xyz", pose["final_camera_rotation"]).as_matrix()
    rot = np.zeros((3, 3))
    rot[:, 0] = r[:, 2]
    rot[:, 1] = r[:, 0]
    rot[:, 2] = r[:, 1]
    rot = np.linalg.inv(rot)
    flip = np.array([[-1, 0, 0], [0, -1, 0], [0, 0, 1]])
    return cam_loc.reshape(3, 1), flip @ rot


def test_gt_stanford_small_area(tmp_path, rng):
    pose = {
        "camera_location": [1.5, -2.0, 1.2],
        "final_camera_rotation": [0.1, -0.3, 2.0],
    }
    d = tmp_path / "stanford" / "pose" / "area_3"
    d.mkdir(parents=True)
    img_name = "camera_abc123_office_12_frame_equirectangular_domain_rgb.png"
    (d / "camera_abc123_office_12_frame_equirectangular_domain_pose.json").write_text(
        json.dumps(pose)
    )
    t, R = obtain_gt_stanford(str(tmp_path), 3, img_name)
    rt, rR = _ref_gt_stanford_small(pose)
    np.testing.assert_allclose(t, rt, atol=1e-12)
    np.testing.assert_allclose(R, rR, atol=1e-12)


def test_gt_stanford_aligned_area(tmp_path, rng):
    pose = {
        "camera_location": [0.5, 1.0, 1.4],
        "final_camera_rotation": [0.0, 0.2, -1.0],
    }
    base = tmp_path / "stanford" / "pose" / "area_3"
    base.mkdir(parents=True)
    aligned = tmp_path / "stanford" / "pose" / "area_35"
    aligned.mkdir(parents=True)
    img_name = "camera_xyz_office_7_frame_equirectangular_domain_rgb.png"
    (base / "camera_xyz_office_7_frame_equirectangular_domain_pose.json").write_text(
        json.dumps(pose)
    )
    align_rot = Rotation.from_euler("z", 0.7).as_matrix()
    align_trans = np.array([[0.3], [0.1], [0.0]])
    np.savetxt(aligned / "office_7.txt", np.hstack([align_rot, align_trans]))

    t, R = obtain_gt_stanford(str(tmp_path), 35, img_name)

    # reference composition (data_utils.py:126-133)
    rt, _ = _ref_gt_stanford_small(pose)
    r = Rotation.from_euler("xyz", pose["final_camera_rotation"]).as_matrix()
    rot = np.zeros((3, 3))
    rot[:, 0] = r[:, 2]
    rot[:, 1] = r[:, 0]
    rot[:, 2] = r[:, 1]
    rot = np.linalg.inv(rot)
    flip = np.array([[-1, 0, 0], [0, -1, 0], [0, 0, 1]])
    exp_R = flip @ (rot @ np.linalg.inv(align_rot))
    exp_t = align_rot @ (rt - align_trans)
    np.testing.assert_allclose(R, exp_R, atol=1e-10)
    np.testing.assert_allclose(t, exp_t, atol=1e-10)


def test_gt_omniscenes(tmp_path):
    pano_dir = tmp_path / "extreme_pano" / "room_pyebang_1_scene_2"
    pose_dir = tmp_path / "extreme_pose" / "room_pyebang_1_scene_2"
    pano_dir.mkdir(parents=True)
    pose_dir.mkdir(parents=True)
    R = Rotation.from_euler("zyx", [0.5, 0.1, -0.2]).as_matrix()
    t = np.array([[1.0], [2.0], [0.5]])
    np.savetxt(pose_dir / "000123.txt", np.hstack([R, t]))
    (pano_dir / "000123.jpg").write_bytes(b"")
    gt_t, gt_R = obtain_gt_omniscenes(str(pano_dir / "000123.jpg"))
    np.testing.assert_allclose(gt_t, t, atol=1e-10)
    np.testing.assert_allclose(gt_R, R, atol=1e-10)

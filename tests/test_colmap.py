"""COLMAP loader tests: bin/txt round-trips, pose conversion, near/far, bbox."""
import struct
from pathlib import Path

import numpy as np
import pytest

from nerfpp_tpu.data import colmap as C


def _write_synthetic_model_bin(d: Path, cams, images, points):
    with open(d / "cameras.bin", "wb") as f:
        f.write(struct.pack("<Q", len(cams)))
        for cam in cams:
            f.write(struct.pack("<ii", cam.camera_id,
                                C.MODEL_NAME_TO_ID[cam.model]))
            f.write(struct.pack("<QQ", cam.width, cam.height))
            f.write(np.asarray(cam.params, "<f8").tobytes())
    with open(d / "images.bin", "wb") as f:
        f.write(struct.pack("<Q", len(images)))
        for im in images:
            f.write(struct.pack("<i", im.image_id))
            f.write(np.asarray(im.qvec, "<f8").tobytes())
            f.write(np.asarray(im.tvec, "<f8").tobytes())
            f.write(struct.pack("<i", im.camera_id))
            f.write(im.name.encode() + b"\x00")
            f.write(struct.pack("<Q", len(im.point3d_ids)))
            for xy, pid in zip(im.xys, im.point3d_ids):
                f.write(struct.pack("<dd", xy[0], xy[1]))
                f.write(struct.pack("<q", pid))
    with open(d / "points3D.bin", "wb") as f:
        f.write(struct.pack("<Q", len(points)))
        for pid, xyz in points:
            f.write(struct.pack("<q", pid))
            f.write(np.asarray(xyz, "<f8").tobytes())
            f.write(struct.pack("<BBB", 128, 128, 128))
            f.write(struct.pack("<d", 0.5))
            f.write(struct.pack("<Q", 0))


def _synthetic_model(tmp_path):
    rng = np.random.RandomState(0)
    cam = C.ColmapCamera(1, "OPENCV", 64, 48,
                         np.array([60.0, 61.0, 32.0, 24.0,
                                   0.01, -0.002, 0.0, 0.0]))
    points = [(i + 10, rng.randn(3) * 0.5) for i in range(50)]
    images = []
    for iid in range(1, 4):
        q = rng.randn(4)
        q /= np.linalg.norm(q)
        t = rng.randn(3)
        pids = np.array([p[0] for p in points[:30]] + [-1] * 5, np.int64)
        xys = rng.rand(35, 2) * 10
        images.append(C.ColmapImage(iid, q, t, 1, f"img_{iid}.png", xys, pids))
    _write_synthetic_model_bin(tmp_path, [cam], images, points)
    return cam, images, points


def test_read_model_bin_roundtrip(tmp_path):
    cam, images, points = _synthetic_model(tmp_path)
    rec = C.read_model(tmp_path)
    assert rec.cameras[1].model == "OPENCV"
    assert rec.cameras[1].width == 64 and rec.cameras[1].height == 48
    np.testing.assert_allclose(rec.cameras[1].params, cam.params)
    assert len(rec.images) == 3
    im = rec.images[2]
    np.testing.assert_allclose(im.qvec, images[1].qvec)
    np.testing.assert_allclose(im.tvec, images[1].tvec)
    assert im.name == "img_2.png"
    assert (im.point3d_ids[-5:] == -1).all()
    assert rec.points_xyz.shape == (50, 3)


def test_read_model_txt(tmp_path):
    (tmp_path / "cameras.txt").write_text(
        "# comment\n1 PINHOLE 64 48 60.0 61.0 32.0 24.0\n")
    (tmp_path / "images.txt").write_text(
        "# comment\n1 1 0 0 0 0.5 0.5 0.5 1 img.png\n"
        "1.0 2.0 15 3.0 4.0 -1\n")
    (tmp_path / "points3D.txt").write_text(
        "# comment\n15 1.0 2.0 3.0 128 128 128 0.5\n")
    rec = C.read_model(tmp_path)
    assert rec.cameras[1].model == "PINHOLE"
    assert rec.images[1].name == "img.png"
    assert rec.images[1].point3d_ids.tolist() == [15, -1]
    np.testing.assert_allclose(rec.points_xyz[0], [1, 2, 3])


def test_qvec_rotmat_identity_and_orthogonality():
    np.testing.assert_allclose(C.qvec_to_rotmat(np.array([1.0, 0, 0, 0])),
                               np.eye(3), atol=1e-12)
    q = np.array([0.8, 0.1, -0.3, 0.5])
    r = C.qvec_to_rotmat(q)
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-12)
    np.testing.assert_allclose(np.linalg.det(r), 1.0, atol=1e-12)


def test_pose_conversion_roundtrip():
    """c2w from (q, t) must invert the w2c transform; the y/z column flip is
    its own inverse on the OpenGL side."""
    rng = np.random.RandomState(3)
    q = rng.randn(4)
    q /= np.linalg.norm(q)
    t = rng.randn(3)
    pose = C.colmap_w2c_to_nerf_c2w(q, t)
    # undo the OpenGL flip, then verify w2c composition
    c2w = pose.copy()
    c2w[:3, 1:3] *= -1
    r = C.qvec_to_rotmat(q)
    # camera center: w2c maps center -> 0
    center = c2w[:3, 3]
    np.testing.assert_allclose(r @ center + t, 0.0, atol=1e-6)
    np.testing.assert_allclose(c2w[:3, :3], r.T, atol=1e-6)


def test_near_far_percentiles(tmp_path):
    _synthetic_model(tmp_path)
    rec = C.read_model(tmp_path)
    near, far = C.compute_near_far_for_image(rec.images[1], rec)
    assert 0 < near < far
    # distances measured from the true camera center
    im = rec.images[1]
    r = C.qvec_to_rotmat(im.qvec)
    center = -r.T @ im.tvec
    id_to_row = {pid: i for i, pid in enumerate(rec.points_ids)}
    rows = [id_to_row[p] for p in im.point3d_ids if p >= 0]
    dists = np.sort(np.linalg.norm(rec.points_xyz[rows] - center, axis=-1))
    assert abs(near - dists[int(0.01 * len(dists))]) < 1e-5
    assert abs(far - dists[min(int(0.99 * len(dists)), len(dists) - 1)]) < 1e-5


def test_bounding_box_margin(tmp_path):
    _synthetic_model(tmp_path)
    rec = C.read_model(tmp_path)
    bbox = C.compute_bounding_box(rec)
    assert bbox.shape == (6,)
    assert (bbox[3:] > bbox[:3]).all()
    inside = ((rec.points_xyz >= bbox[:3]) & (rec.points_xyz <= bbox[3:])).all(1)
    assert inside.mean() > 0.9  # percentile box covers the bulk of points


def test_load_scene_from_workspace(tmp_path):
    sparse = tmp_path / "sparse" / "0"
    sparse.mkdir(parents=True)
    _synthetic_model(sparse)
    scene = C.load_from_colmap_reconstruction(tmp_path, image_path=tmp_path,
                                              undistort=False)
    assert len(scene.views) == 3
    assert scene.splits_idx == [3, 0, 0]
    v = scene.views[0]
    assert v.h == 48 and v.w == 64
    assert v.d is not None  # OPENCV distortion retained when undistort=False
    np.testing.assert_allclose(v.k[0, 0], 60.0)
    assert np.isfinite(scene.bounding_box).all()

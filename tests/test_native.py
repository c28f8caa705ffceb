"""Native C++ library tests: build, COLMAP parsing parity, pyramid lookup."""
import numpy as np
import pytest

from nerfpp_tpu import native


def _lib_or_skip():
    lib = native.load()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def test_native_builds_and_loads():
    lib = _lib_or_skip()
    assert lib.nerfpp_native_version() == 1


def test_native_colmap_parity(tmp_path):
    """Native parser must agree with the pure-Python parser bit for bit."""
    _lib_or_skip()
    from nerfpp_tpu.data import colmap as C
    from tests.test_colmap import _synthetic_model
    _synthetic_model(tmp_path)

    native_rec = C._read_model_native(tmp_path)
    assert native_rec is not None
    py_cams = C._read_cameras_bin(tmp_path / "cameras.bin")
    py_images = C._read_images_bin(tmp_path / "images.bin")
    py_xyz, py_ids = C._read_points3d_bin(tmp_path / "points3D.bin")

    assert set(native_rec.cameras) == set(py_cams)
    for cid in py_cams:
        a, b = native_rec.cameras[cid], py_cams[cid]
        assert a.model == b.model and a.width == b.width and a.height == b.height
        np.testing.assert_allclose(a.params, b.params)
    assert set(native_rec.images) == set(py_images)
    for iid in py_images:
        a, b = native_rec.images[iid], py_images[iid]
        np.testing.assert_allclose(a.qvec, b.qvec)
        np.testing.assert_allclose(a.tvec, b.tvec)
        assert a.name == b.name and a.camera_id == b.camera_id
        np.testing.assert_allclose(a.xys, b.xys)
        np.testing.assert_array_equal(a.point3d_ids, b.point3d_ids)
    np.testing.assert_allclose(native_rec.points_xyz, py_xyz)
    np.testing.assert_array_equal(native_rec.points_ids, py_ids)


def test_native_near_far_matches_python(tmp_path):
    _lib_or_skip()
    rng = np.random.RandomState(0)
    q = rng.randn(4)
    q /= np.linalg.norm(q)
    t = rng.randn(3)
    pts = rng.randn(500, 3) * 2.0

    got = native.compute_near_far(q, t, pts)
    assert got is not None
    near, far = got

    from nerfpp_tpu.data.colmap import qvec_to_rotmat
    r = qvec_to_rotmat(q)
    center = -r.T @ t
    d = np.sort(np.linalg.norm(pts - center, axis=-1).astype(np.float32))
    assert abs(near - d[int(0.01 * len(d))]) < 1e-4
    assert abs(far - d[min(int(0.99 * len(d)), len(d) - 1)]) < 1e-4


def test_native_pyramid_lookup_matches_python():
    _lib_or_skip()
    from nerfpp_tpu.data.pyramid_clip import (PyramidEmbedder,
                                              PyramidEmbedderProperties,
                                              RandomProjectionPatchEncoder)
    props = PyramidEmbedderProperties(img_size=16, overlap=0.5, max_zoom_out=1)
    rng = np.random.RandomState(0)
    images = rng.rand(1, 64, 64, 3).astype(np.float32)
    enc = RandomProjectionPatchEncoder(embed_dim=16, input_size=8)
    emb = PyramidEmbedder(enc, props)(images)

    xs = rng.rand(50).astype(np.float32) * 63
    ys = rng.rand(50).astype(np.float32) * 63
    py = emb.get_pixel_values(0, xs, ys, scale=0.5)

    zooms = props.zooms_for(64, 64)
    grids = {z: emb.grids[(0, z)] for z in zooms}
    nat = native.pyramid_lookup(grids, zooms[0], zooms[-1], 16,
                                props.img_size, props.overlap, xs, ys, 0.5)
    assert nat is not None
    np.testing.assert_allclose(nat, py, atol=1e-5)

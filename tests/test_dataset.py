"""Dataset layer tests: View/SceneData JSON, sampler semantics, synthetic GT."""
import json

import jax
import jax.numpy as jnp
import numpy as np

from nerfpp_tpu.core import rays as R
from nerfpp_tpu.data.dataset import RayBatchSampler, SceneData, View
from nerfpp_tpu.data.synthetic import make_synthetic_scene, render_gt_rays


def _tiny_scene():
    return make_synthetic_scene(n_train=3, n_val=1, n_test=1, image_hw=16,
                                n_samples=64)


def test_scene_json_roundtrip(tmp_path):
    scene = _tiny_scene()
    f = tmp_path / "data.json"
    scene.save(f)
    loaded = SceneData.load(f)
    assert len(loaded.views) == len(scene.views)
    assert loaded.splits_idx == scene.splits_idx
    np.testing.assert_allclose(loaded.bounding_box, scene.bounding_box)
    np.testing.assert_allclose(loaded.views[0].pose, scene.views[0].pose,
                               atol=1e-6)
    np.testing.assert_allclose(loaded.views[2].k, scene.views[2].k, atol=1e-4)


def test_split_indices():
    scene = _tiny_scene()
    assert list(scene.split_indices("train")) == [0, 1, 2]
    assert list(scene.split_indices("val")) == [3]
    assert list(scene.split_indices("test")) == [4]


def test_sampler_targets_match_rays():
    """Sampled target pixels must correspond to the rays through them: render
    the GT field along the sampled rays and compare with the stored pixel."""
    scene = _tiny_scene()
    sampler = RayBatchSampler.from_scene(scene, batch_size=64)
    batch = sampler.sample(jax.random.PRNGKey(0), jnp.int32(1))
    v = scene.views[1]
    rendered = render_gt_rays(batch["rays_o"], batch["rays_d"],
                              v.near, v.far, n_samples=64,
                              white_bkgr=scene.white_bkgr)
    np.testing.assert_allclose(np.asarray(rendered),
                               np.asarray(batch["target_rgb"]), atol=0.08)


def test_sampler_cycles_images():
    scene = _tiny_scene()
    sampler = RayBatchSampler.from_scene(scene, batch_size=8)
    b0 = sampler.sample(jax.random.PRNGKey(0), jnp.int32(0))
    b3 = sampler.sample(jax.random.PRNGKey(0), jnp.int32(3))  # 3 % 3 == 0
    np.testing.assert_allclose(np.asarray(b0["rays_o"]),
                               np.asarray(b3["rays_o"]), atol=1e-6)
    b1 = sampler.sample(jax.random.PRNGKey(0), jnp.int32(1))
    assert not np.allclose(np.asarray(b0["rays_o"]), np.asarray(b1["rays_o"]))


def test_sampler_precrop():
    """While step < precrop_iters, pixels come from the center crop
    (NeRFDataset.cpp:44-65)."""
    scene = _tiny_scene()
    sampler = RayBatchSampler.from_scene(scene, batch_size=256,
                                         precrop_iters=10, precrop_frac=0.5)
    h0, h1, w0, w1 = sampler.bounds(jnp.int32(5))
    assert (int(h0), int(h1), int(w0), int(w1)) == (4, 12, 4, 12)
    h0, h1, w0, w1 = sampler.bounds(jnp.int32(50))
    assert (int(h0), int(h1), int(w0), int(w1)) == (0, 16, 0, 16)


def test_sampler_under_jit():
    scene = _tiny_scene()
    sampler = RayBatchSampler.from_scene(scene, batch_size=32)

    @jax.jit
    def f(s, key, step):
        return s.sample(key, step)["target_rgb"].mean()

    v1 = f(sampler, jax.random.PRNGKey(0), jnp.int32(0))
    v2 = f(sampler, jax.random.PRNGKey(1), jnp.int32(0))
    assert np.isfinite(float(v1)) and float(v1) != float(v2)


def test_synthetic_gt_consistency():
    """Rendering the same view twice is deterministic; different poses differ."""
    scene = _tiny_scene()
    assert scene.images.shape == (5, 16, 16, 3)
    assert np.isfinite(scene.images).all()
    assert (scene.images >= 0).all() and (scene.images <= 1).all()
    # different views are actually different
    assert not np.allclose(scene.images[0], scene.images[1])


def test_synthetic_variants():
    """The thin/textured variant builds and genuinely differs from the
    default; the default field is unchanged by the anisotropic refactor
    (regression: the anisotropic prim table must reduce to the legacy
    scalar-size formula when sizes are isotropic)."""
    import jax
    import jax.numpy as jnp
    from nerfpp_tpu.data.synthetic import _PRIMS, scene_field

    thin = make_synthetic_scene(n_train=3, n_val=1, n_test=1, image_hw=16,
                                n_samples=32, variant="thin", textured=True)
    base = _tiny_scene()
    assert np.isfinite(thin.images).all()
    assert not np.allclose(thin.images, base.images)

    pts = jnp.asarray(np.random.RandomState(0)
                      .uniform(-1.2, 1.2, (512, 3)).astype(np.float32))
    sig, rgb = scene_field(pts)
    prims = jnp.asarray(_PRIMS)
    rel = pts[:, None, :] - prims[:, 0:3]
    d_s = jnp.linalg.norm(rel, axis=-1) / prims[:, 3]
    d_b = jnp.max(jnp.abs(rel), axis=-1) / prims[:, 3]
    d = jnp.where(prims[:, 8] > 0.5, d_b, d_s)
    inside = jax.nn.sigmoid((1.0 - d) * 40.0)
    sig0 = jnp.sum(prims[:, 7] * inside, axis=-1)
    w = inside + 1e-8
    rgb0 = jnp.clip(jnp.sum(w[..., None] * prims[:, 4:7], axis=-2)
                    / jnp.sum(w, -1)[..., None], 0, 1)
    np.testing.assert_allclose(np.asarray(sig), np.asarray(sig0),
                               atol=1e-3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(rgb), np.asarray(rgb0), atol=1e-5)


def test_view_json_distortion_roundtrip():
    v = View(id=0, h=4, w=4, focal=2.0, near=0.1, far=2.0,
             k=np.eye(3, dtype=np.float32), pose=np.eye(4, dtype=np.float32),
             d=np.array([0.1, -0.05, 0.001, 0.002], np.float32))
    v2 = View.from_json(v.to_json())
    np.testing.assert_allclose(v2.d, v.d)
    v_no_d = View(id=1, h=4, w=4, focal=2.0, near=0.1, far=2.0,
                  k=np.eye(3, dtype=np.float32),
                  pose=np.eye(4, dtype=np.float32))
    assert View.from_json(v_no_d.to_json()).d is None


def test_sampler_tile_mode():
    """Tile-coherent sampling: every 128-pixel run is one 8x16 tile (rows
    contiguous), pixels stay in bounds, targets match the image."""
    scene = _tiny_scene()
    s = RayBatchSampler.from_scene(scene, 256, tile_h=8, tile_w=16)
    batch = s.sample(jax.random.PRNGKey(3), jnp.int32(1))
    assert batch["rays_o"].shape == (256, 3)
    # reconstruct pixel coords from the known enumeration to check bounds:
    # resample coords with the same key/logic
    img_idx = 1 % s.images.shape[0]
    kh, kw = jax.random.split(jax.random.PRNGKey(3))
    oy = (jax.random.uniform(kh, (2,)) * (16 - 8 + 1)).astype(jnp.int32)
    ox = (jax.random.uniform(kw, (2,)) * (16 - 16 + 1)).astype(jnp.int32)
    ys = (oy[:, None, None] + jnp.arange(8)[None, :, None]
          + 0 * jnp.arange(16)[None, None, :]).reshape(-1)
    xs = (ox[:, None, None] + 0 * jnp.arange(8)[None, :, None]
          + jnp.arange(16)[None, None, :]).reshape(-1)
    np.testing.assert_allclose(np.asarray(batch["target_rgb"]),
                               np.asarray(s.images[img_idx][ys, xs]))
    # tile contiguity: first 128 pixels share one 8x16 rectangle
    assert int(ys[:128].max() - ys[:128].min()) == 7
    assert int(xs[:128].max() - xs[:128].min()) == 15


def test_sampler_tile_mode_precrop():
    scene = _tiny_scene()
    s = RayBatchSampler.from_scene(scene, 128, precrop_iters=5,
                                   precrop_frac=0.9, tile_h=8, tile_w=16)
    b = s.sample(jax.random.PRNGKey(0), jnp.int32(0))  # precrop active
    assert np.isfinite(np.asarray(b["target_rgb"])).all()


def test_sampler_tile_smaller_precrop_window_stays_in_image():
    """Precrop window smaller than a tile: origins clamp so every sampled
    pixel stays inside the IMAGE (round-2 advisor finding: the negative span
    used to push origins below the crop and rely on gather clamping)."""
    h = w = 16
    # encode pixel coords in the image so targets reveal what was sampled
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    img = np.stack([yy / h, xx / w, np.zeros_like(yy)], -1).astype(np.float32)
    s = RayBatchSampler(
        images=jnp.asarray(img[None]), poses=jnp.eye(4)[None],
        intrinsics=jnp.asarray(np.array(
            [[8.0, 0, 8], [0, 8.0, 8], [0, 0, 1]], np.float32))[None],
        h=h, w=w, batch_size=128, precrop_iters=5, precrop_frac=0.2,
        tile_h=8, tile_w=16)
    b = s.sample(jax.random.PRNGKey(0), jnp.int32(0))  # crop is 2x2 < tile
    ys = np.asarray(b["target_rgb"][:, 0]) * h
    xs = np.asarray(b["target_rgb"][:, 1]) * w
    assert ys.min() >= 0 and ys.max() <= h - 1
    assert xs.min() >= 0 and xs.max() <= w - 1
    # the 128 pixels are one full 8x16 tile: all distinct coordinates
    coords = {(int(round(y)), int(round(x))) for y, x in zip(ys, xs)}
    assert len(coords) == 128


def test_sampler_per_view_sizes_scaled_intrinsics():
    """Scenes with per-view image sizes (COLMAP multi-camera): from_scene
    resizes to view 0's size and scales each view's K so rays stay correct."""
    scene = _tiny_scene()
    # pretend view 1 was captured by a 2x camera: double its size + K
    v1 = scene.views[1]
    big = np.kron(scene.images[1], np.ones((2, 2, 1), np.float32))
    imgs = [scene.images[i] for i in range(len(scene.views))]
    imgs[1] = None  # replaced below via per-view images path
    v1.h, v1.w = v1.h * 2, v1.w * 2
    v1.k = v1.k.copy()
    v1.k[0, :] *= 2
    v1.k[1, :] *= 2
    # SceneData.images must be uniform; emulate per-view content via a list
    scene.images = None
    import cv2, tempfile, os
    d = tempfile.mkdtemp()
    for i, v in enumerate(scene.views):
        img = big if i == 1 else imgs[i]
        path = os.path.join(d, f"{i}.png")
        cv2.imwrite(path, (img[..., ::-1] * 255).astype(np.uint8))
        v.image_path = path
    s = RayBatchSampler.from_scene(scene, 32)
    assert s.images.shape[1:3] == (16, 16)
    # view 1's K must be scaled back to the 16x16 frame ~= original K
    np.testing.assert_allclose(np.asarray(s.intrinsics[1]),
                               np.asarray(scene.views[0].k), rtol=1e-5)
    b = s.sample(jax.random.PRNGKey(0), jnp.int32(1))
    assert np.isfinite(np.asarray(b["rays_o"])).all()

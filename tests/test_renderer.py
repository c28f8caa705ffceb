"""Renderer tests: shape contracts, coarse/fine population, image rendering."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from nerfpp_tpu.core import rays as R
from nerfpp_tpu.render.renderer import (RenderConfig, make_nerf_integrate_fn,
                                        make_nerf_network_fn, render_image,
                                        render_ray_batch, render_rays)
from nerfpp_tpu.render import lerf as LR

BBOX = jnp.array([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0])


def _toy_network(params, pts, viewdirs):
    """Analytic field: a sphere of radius 0.5, red."""
    n_rays, n_samples, _ = pts.shape
    d = jnp.linalg.norm(pts, axis=-1)
    sigma = jnp.where(d < 0.5, 50.0, 0.0)
    rgb = jnp.stack([jnp.full_like(sigma, 5.0), jnp.full_like(sigma, -5.0),
                     jnp.full_like(sigma, -5.0)], axis=-1)
    return jnp.concatenate([rgb, sigma[..., None]], axis=-1)


def _make_rays(n):
    # rays from z=2 pointing at origin-ish
    o = jnp.tile(jnp.array([[0.0, 0.0, 2.0]]), (n, 1))
    d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (n, 1))
    return o, d


def test_render_rays_coarse_only_outputs_populated():
    """The reference leaves Outputs empty for n_importance == 0
    (NeRFRenderer.h:423/448) — we fix that: coarse results ARE the outputs."""
    cfg = RenderConfig(n_samples=32, n_importance=0, use_viewdirs=False,
                       thin_ray=True)
    o, d = _make_rays(4)
    near = jnp.full((4, 1), 0.5)
    far = jnp.full((4, 1), 3.5)
    res = render_rays({}, _toy_network, make_nerf_integrate_fn(cfg), o, d,
                      near, far, None, None, jax.random.PRNGKey(0), cfg,
                      bounding_box=BBOX)
    assert res.outputs.rgb.shape == (4, 3)
    np.testing.assert_allclose(np.asarray(res.outputs.rgb),
                               np.asarray(res.coarse.rgb))
    # sphere hit: red and opaque
    assert float(res.outputs.rgb[0, 0]) > 0.9
    assert float(res.outputs.acc[0]) > 0.99
    # depth is the front surface of the sphere at z = 0.5 => t = 1.5
    np.testing.assert_allclose(np.asarray(res.outputs.depth), 1.5, atol=0.1)


def test_render_rays_hierarchical_refines():
    cfg = RenderConfig(n_samples=16, n_importance=48, use_viewdirs=False,
                       thin_ray=True)
    o, d = _make_rays(2)
    near = jnp.full((2, 1), 0.5)
    far = jnp.full((2, 1), 3.5)
    res = render_rays({}, _toy_network, make_nerf_integrate_fn(cfg), o, d,
                      near, far, None, None, jax.random.PRNGKey(0), cfg,
                      bounding_box=BBOX)
    assert res.z_vals.shape == (2, 64)  # merged coarse + fine, sorted
    assert bool(jnp.all(res.z_vals[:, 1:] >= res.z_vals[:, :-1]))
    # importance samples concentrate near the surface: more samples in
    # [1.3, 1.7] than uniform would give
    frac = float(jnp.mean((res.z_vals > 1.3) & (res.z_vals < 1.7)))
    assert frac > 0.25  # uniform would be ~0.13
    # coarse discretization (16 samples over [0.5, 3.5]) biases the surface
    # estimate by up to one coarse bin (0.2)
    np.testing.assert_allclose(np.asarray(res.outputs.depth), 1.5, atol=0.2)


def test_render_ray_batch_aabb_near_far():
    cfg = RenderConfig(n_samples=32, n_importance=0, use_viewdirs=False,
                       thin_ray=True)
    o, d = _make_rays(3)
    res = render_ray_batch({}, _toy_network, make_nerf_integrate_fn(cfg),
                           o, d, None, jax.random.PRNGKey(0), cfg, BBOX)
    # AABB near/far: box z in [-1, 1], origin z=2 => t in [1, 3]
    assert float(res.z_vals.min()) >= 1.0 - 1e-4
    assert float(res.z_vals.max()) <= 3.0 + 1e-4


def test_render_image_shapes_and_padding():
    cfg = RenderConfig(n_samples=8, n_importance=0, use_viewdirs=False,
                       thin_ray=True, chunk=64)  # 13*13=169 pixels -> padding
    k = jnp.asarray(R.calibration_matrix(15.0, 13, 13))
    c2w = jnp.asarray(R.pose_spherical(45.0, -30.0, 2.5))
    out, (near, far) = render_image({}, _toy_network,
                                    make_nerf_integrate_fn(cfg),
                                    13, 13, k, c2w, jax.random.PRNGKey(0),
                                    cfg, BBOX)
    assert out.rgb.shape == (13, 13, 3)
    assert out.depth.shape == (13, 13)
    assert np.isfinite(np.asarray(out.rgb)).all()
    # the sphere projects into the image center
    assert float(out.acc[6, 6]) > 0.9
    assert float(out.acc[0, 0]) < 0.1


def test_render_image_ndc_cone_rays():
    """NDC full-image render with CONE rays: ndc_rays rescales the cone
    angle PER RAY ([h, w, 1]), which render_image must flatten and chunk
    alongside the rays (previously it was closed over image-shaped and the
    chunked trace failed). Covers both pixel orders, non-chunk-multiple."""
    for tile_order in (False, True):
        cfg = RenderConfig(n_samples=8, n_importance=0, use_viewdirs=False,
                           thin_ray=False, ndc=True, chunk=64,
                           tile_order=tile_order)
        k = jnp.asarray(R.calibration_matrix(15.0, 13, 13))
        # forward-facing pose (NDC convention): camera looking down -z
        c2w = jnp.eye(4).at[2, 3].set(0.5)
        out, _ = render_image({}, _toy_network, make_nerf_integrate_fn(cfg),
                              13, 13, k, c2w, jax.random.PRNGKey(0),
                              cfg, BBOX)
        assert out.rgb.shape == (13, 13, 3)
        assert np.isfinite(np.asarray(out.rgb)).all()


def test_render_deterministic_without_noise():
    cfg = RenderConfig(n_samples=16, n_importance=16, use_viewdirs=False,
                       thin_ray=True)
    o, d = _make_rays(4)
    near = jnp.full((4, 1), 0.5)
    far = jnp.full((4, 1), 3.5)
    r1 = render_rays({}, _toy_network, make_nerf_integrate_fn(cfg), o, d, near,
                     far, None, None, jax.random.PRNGKey(0), cfg,
                     bounding_box=BBOX)
    r2 = render_rays({}, _toy_network, make_nerf_integrate_fn(cfg), o, d, near,
                     far, None, None, jax.random.PRNGKey(42), cfg,
                     bounding_box=BBOX)
    # perturb=0, det pdf, thin ray, no noise -> key-independent
    np.testing.assert_allclose(np.asarray(r1.outputs.rgb),
                               np.asarray(r2.outputs.rgb), atol=1e-6)


def _toy_lerf_network(params, pts, viewdirs):
    n_rays, n_samples, _ = pts.shape
    d = jnp.linalg.norm(pts, axis=-1)
    sigma = jnp.where(d < 0.5, 50.0, 0.0)
    e = jnp.stack([jnp.ones_like(sigma), jnp.zeros_like(sigma),
                   jnp.zeros_like(sigma), jnp.zeros_like(sigma)], axis=-1)
    return jnp.concatenate([e, sigma[..., None]], axis=-1)


def test_lerf_integrator_and_relevancy():
    positives = jnp.array([[1.0, 0.0, 0.0, 0.0]])
    negatives = jnp.array([[0.0, 1.0, 0.0, 0.0], [0.0, 0.0, 1.0, 0.0]])
    cfg = RenderConfig(n_samples=32, n_importance=0, use_viewdirs=False,
                       thin_ray=True)
    integrate = LR.make_lerf_integrate_fn(4, positives, negatives)
    o, d = _make_rays(4)
    near = jnp.full((4, 1), 0.5)
    far = jnp.full((4, 1), 3.5)
    res = render_rays({}, _toy_lerf_network, integrate, o, d, near, far, None,
                      None, jax.random.PRNGKey(0), cfg, bounding_box=BBOX)
    out = res.outputs
    # rendered embedding is unit-norm and matches the field embedding
    np.testing.assert_allclose(
        np.asarray(jnp.linalg.norm(out.rendered_lang_embedding, axis=-1)),
        1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.rendered_lang_embedding[:, 0]),
                               1.0, atol=1e-5)
    # embedding == positive -> relevancy near 1
    assert (np.asarray(out.relevancy) > 0.99).all()


def test_relevancy_score_ordering():
    e_pos = jnp.array([1.0, 0.0])
    e_neg = jnp.array([0.0, 1.0])
    pos = jnp.array([[1.0, 0.0]])
    neg = jnp.array([[0.0, 1.0]])
    r_match = LR.relevancy(e_pos, pos, neg)
    r_miss = LR.relevancy(e_neg, pos, neg)
    assert float(r_match[0]) > 0.99
    assert float(r_miss[0]) < 0.01


def test_sample_major_network_fn_parity():
    """Sample-major flattening is a pure reordering: identical raw outputs."""
    def embed(params, x):
        return jnp.concatenate([x, jnp.sin(x)], -1), x[:, 0] > -0.5

    def dirs(params, x):
        return jnp.cos(x), None

    def field(params, e):
        return jnp.concatenate([e[:, :3], jnp.sum(e, -1, keepdims=True)], -1)

    fn_rm = make_nerf_network_fn(embed, dirs, field, sample_major=False)
    fn_sm = make_nerf_network_fn(embed, dirs, field, sample_major=True)
    pts = jax.random.normal(jax.random.PRNGKey(0), (7, 5, 3))
    vd = jax.random.normal(jax.random.PRNGKey(1), (7, 3))
    np.testing.assert_allclose(np.asarray(fn_rm({}, pts, vd)),
                               np.asarray(fn_sm({}, pts, vd)), rtol=1e-6)


def test_render_image_tile_order_parity():
    """Tile-ordered full-image rendering must be pixel-identical (it is a
    pure pixel permutation), including non-multiple-of-tile image sizes."""
    cfg = RenderConfig(n_samples=12, n_importance=0, chunk=128,
                       use_viewdirs=False, perturb=0.0, thin_ray=True)
    cfg_t = dataclasses.replace(cfg, tile_order=True)
    h, w = 13, 21  # deliberately not multiples of (8, 16)
    k = jnp.array([[20.0, 0, w / 2], [0, 20.0, h / 2], [0, 0, 1]])
    c2w = jnp.eye(4).at[2, 3].set(2.0)
    integrate = make_nerf_integrate_fn(cfg)
    key = jax.random.PRNGKey(0)
    out, nf = render_image({}, _toy_network, integrate, h, w, k, c2w, key,
                           cfg, BBOX)
    out_t, nf_t = render_image({}, _toy_network, integrate, h, w, k, c2w, key,
                               cfg_t, BBOX)
    np.testing.assert_allclose(np.asarray(out_t.rgb), np.asarray(out.rgb),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_t.depth), np.asarray(out.depth),
                               atol=1e-5)


def test_hier_ray_tile_shares_depths_within_tiles():
    """hier_ray_tile: the hierarchical path's coarse AND importance depths
    are identical for every ray of a tile, and rendering stays finite."""
    import jax
    from nerfpp_tpu.render.renderer import (RenderConfig,
                                            make_nerf_integrate_fn,
                                            render_ray_batch)

    tile = 16
    r = 4 * tile
    rng = np.random.RandomState(0)
    rays_o = jnp.asarray(np.tile([[0.0, 0.0, -2.5]], (r, 1)), jnp.float32)
    d = np.tile([[0.0, 0.0, 1.0]], (r, 1)) + rng.randn(r, 3) * 0.02
    rays_d = jnp.asarray(d, jnp.float32)
    bbox = jnp.array([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0])

    def toy_network(params, pts, viewdirs):
        sigma = jnp.where(jnp.linalg.norm(pts, axis=-1) < 0.5, 8.0, 0.0)
        rgb = jnp.full(pts.shape[:-1] + (3,), 0.6)
        return jnp.concatenate([rgb, sigma[..., None]], axis=-1)

    cfg = RenderConfig(n_samples=16, n_importance=24, use_viewdirs=False,
                       thin_ray=True, hier_ray_tile=tile)
    res = render_ray_batch({}, toy_network, make_nerf_integrate_fn(cfg),
                           rays_o, rays_d, None, jax.random.PRNGKey(0),
                           cfg, bbox)
    z = np.asarray(res.z_vals).reshape(4, tile, -1)
    # every ray of a tile got the same merged depth set
    np.testing.assert_allclose(z, np.broadcast_to(z[:, :1], z.shape))
    assert z.shape[-1] == 16 + 24
    assert np.isfinite(np.asarray(res.outputs.rgb)).all()
    # different tiles are not forced identical (they have distinct weights)
    # and depths are sorted
    assert (np.diff(z[:, 0], axis=-1) >= 0).all()


def test_hier_ray_tile_quality_close_to_per_ray():
    """Tile-shared hierarchical sampling must not derail quality: same toy
    scene, per-ray vs tiled CDFs give closely matching images."""
    import jax
    from nerfpp_tpu.render.renderer import (RenderConfig,
                                            make_nerf_integrate_fn,
                                            render_ray_batch)

    tile = 16
    r = 4 * tile
    rng = np.random.RandomState(1)
    rays_o = jnp.asarray(np.tile([[0.0, 0.0, -2.5]], (r, 1)), jnp.float32)
    d = np.tile([[0.0, 0.0, 1.0]], (r, 1)) + rng.randn(r, 3) * 0.015
    rays_d = jnp.asarray(d, jnp.float32)
    bbox = jnp.array([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0])

    def toy_network(params, pts, viewdirs):
        rr = jnp.linalg.norm(pts, axis=-1)
        sigma = jnp.where(rr < 0.45, 12.0, 0.0)
        rgb = jnp.stack([0.2 + pts[..., 0], 0.5 + 0 * rr,
                         0.8 - pts[..., 2]], -1)
        return jnp.concatenate([jnp.clip(rgb, 0, 1), sigma[..., None]], -1)

    def render(tile_n):
        cfg = RenderConfig(n_samples=24, n_importance=48, use_viewdirs=False,
                           thin_ray=True, hier_ray_tile=tile_n)
        return np.asarray(render_ray_batch(
            {}, toy_network, make_nerf_integrate_fn(cfg), rays_o, rays_d,
            None, jax.random.PRNGKey(0), cfg, bbox).outputs.rgb)

    per_ray = render(0)
    tiled = render(tile)
    assert np.isfinite(tiled).all()
    assert float(np.abs(per_ray - tiled).mean()) < 0.02


def test_hier_budget_covers_all_rays_once():
    """render_ray_batch_hier_budgeted partitions the batch exactly, ranks
    foreground tiles dense, and gives each class the right fine depth count
    (n_samples + n_importance vs n_samples + sparse_importance)."""
    from nerfpp_tpu.render.renderer import (RenderConfig,
                                            make_nerf_integrate_fn,
                                            render_ray_batch_hier_budgeted)

    tile = 16
    n_tiles = 8
    r = tile * n_tiles
    rng = np.random.RandomState(0)
    rays_o = jnp.asarray(np.tile([[0.0, 0.0, -2.5]], (r, 1)), jnp.float32)
    dirs = []
    for t in range(n_tiles):
        # even tiles aim at the sphere, odd tiles miss it
        cx = 0.0 if t % 2 == 0 else 0.9
        d = np.tile([[cx, 0.0, 1.0]], (tile, 1)) + rng.randn(tile, 3) * 0.01
        dirs.append(d)
    rays_d = jnp.asarray(np.concatenate(dirs), jnp.float32)

    def toy_network(params, pts, viewdirs):
        sigma = jnp.where(jnp.linalg.norm(pts, axis=-1) < 0.4, 20.0, 0.0)
        rgb = jnp.full(pts.shape[:-1] + (3,), 0.5)
        return jnp.concatenate([rgb, sigma[..., None]], axis=-1)

    cfg = RenderConfig(n_samples=16, n_importance=24, use_viewdirs=False,
                       thin_ray=True, hier_ray_tile=tile)
    res_d, res_s, idx_d, idx_s = render_ray_batch_hier_budgeted(
        {}, toy_network, make_nerf_integrate_fn(cfg), rays_o, rays_d,
        None, jax.random.PRNGKey(0), cfg, BBOX,
        dense_frac=0.5, sparse_importance=8)
    allidx = np.sort(np.concatenate([np.asarray(idx_d), np.asarray(idx_s)]))
    np.testing.assert_array_equal(allidx, np.arange(r))
    assert res_d.z_vals.shape[-1] == 16 + 24
    assert res_s.z_vals.shape[-1] == 16 + 8
    assert np.isfinite(np.asarray(res_d.outputs.rgb)).all()
    assert np.isfinite(np.asarray(res_s.outputs.rgb)).all()
    # the dense class is exactly the sphere-facing (even) tiles
    dense_tiles = sorted(set((np.asarray(idx_d) // tile).tolist()))
    assert dense_tiles == [0, 2, 4, 6]


def test_hier_budget_parity_when_equal():
    """With sparse_importance == n_importance and no stochastic paths, the
    budgeted two-class render equals the plain tiled hierarchical render
    (the split is then just a tile permutation)."""
    from nerfpp_tpu.render.renderer import (RenderConfig,
                                            make_nerf_integrate_fn,
                                            render_ray_batch,
                                            render_ray_batch_hier_budgeted)

    tile = 16
    r = 6 * tile
    rng = np.random.RandomState(3)
    rays_o = jnp.asarray(np.tile([[0.0, 0.0, -2.5]], (r, 1)), jnp.float32)
    d = np.tile([[0.0, 0.0, 1.0]], (r, 1)) + rng.randn(r, 3) * 0.05
    rays_d = jnp.asarray(d, jnp.float32)

    def toy_network(params, pts, viewdirs):
        rr = jnp.linalg.norm(pts, axis=-1)
        sigma = jnp.where(rr < 0.45, 9.0, 0.0)
        rgb = jnp.stack([0.2 + pts[..., 0], jnp.full_like(rr, 0.5),
                         0.8 - pts[..., 2]], -1)
        return jnp.concatenate([jnp.clip(rgb, 0, 1), sigma[..., None]], -1)

    cfg = RenderConfig(n_samples=16, n_importance=24, use_viewdirs=False,
                       thin_ray=True, hier_ray_tile=tile)
    int_fn = make_nerf_integrate_fn(cfg)
    plain = render_ray_batch({}, toy_network, int_fn, rays_o, rays_d, None,
                             jax.random.PRNGKey(0), cfg, BBOX)
    res_d, res_s, idx_d, idx_s = render_ray_batch_hier_budgeted(
        {}, toy_network, int_fn, rays_o, rays_d, None,
        jax.random.PRNGKey(0), cfg, BBOX,
        dense_frac=0.5, sparse_importance=24)
    buf = np.zeros((r, 3), np.float32)
    buf[np.asarray(idx_d)] = np.asarray(res_d.outputs.rgb)
    buf[np.asarray(idx_s)] = np.asarray(res_s.outputs.rgb)
    np.testing.assert_allclose(buf, np.asarray(plain.outputs.rgb),
                               rtol=1e-5, atol=1e-5)


def test_executor_hier_budget_trains(tmp_path):
    """hier_tile_budget_frac wires through the executor: hierarchical
    training runs with the two-class fine pass and stays finite."""
    from nerfpp_tpu.config import hashnerf_blocked_preset, TrainParams
    from nerfpp_tpu.data.synthetic import make_synthetic_scene
    from nerfpp_tpu.executor import NeRFExecutor

    scene = make_synthetic_scene(n_train=2, n_val=1, n_test=1, image_hw=24)
    p = hashnerf_blocked_preset(
        n_importance=16, log2_hashmap_size=12, n_levels=4,
        finest_resolution=64, hier_ray_tile=128,
        hier_tile_budget_frac=0.5, hier_sparse_importance=4)
    tp = TrainParams(n_samples=16, n_rand=256, n_iters=4, chunk=256,
                     i_print=0, i_weights=0, i_testset=0, i_img=0,
                     base_dir=str(tmp_path / "hb"), tile_h=8, tile_w=16)
    ex = NeRFExecutor(p)
    ex.white_bkgr = scene.white_bkgr
    ex.initialize(scene.bounding_box, tp.lrate_decay, seed=0)
    m = ex.train(scene, tp)
    assert np.isfinite(m["loss"])

"""Occupancy-grid guided sampling tests (core/occupancy.py).

This is a new capability with no reference analog (the reference imitates
instant-NGP's encoder but not its occupancy culling); the key invariants:
uniform grid == reference-uniform sampling exactly, density concentrates
samples, and the executor round-trips the grid buffer through training and
checkpoints.
"""
import numpy as np
import jax
import jax.numpy as jnp

from nerfpp_tpu.core import sampling as S
from nerfpp_tpu.core.occupancy import (OccupancyGrid, make_occupancy_grid,
                                       ray_bin_weights, update_grid)

BBOX = np.array([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0], np.float32)


def _sphere_sigma(params, pts):
    return jnp.where(jnp.linalg.norm(pts, axis=-1) < 0.4, 25.0, 0.0)


def test_update_grid_learns_sphere():
    grid = make_occupancy_grid(32)
    grid = update_grid(grid, _sphere_sigma, {}, BBOX, jax.random.PRNGKey(0),
                       decay=0.0)
    d = np.asarray(grid.density)
    c = 32 // 2
    assert d[c, c, c] > 10.0            # center occupied
    assert d[1, 1, 1] == 0.0            # corner empty
    # EMA: a second update with decay keeps occupied cells hot
    grid2 = update_grid(grid, lambda p, x: jnp.zeros(x.shape[0]), {}, BBOX,
                        jax.random.PRNGKey(1), decay=0.5)
    assert np.asarray(grid2.density)[c, c, c] > 5.0


def test_uniform_grid_equals_uniform_sampling():
    """With a fresh (uniform) grid, occupancy-guided deterministic z-values
    must equal the reference's linspace z-values."""
    grid = make_occupancy_grid(16)
    n = 8
    rays_o = jnp.tile(jnp.array([[0.0, 0.0, 2.0]]), (n, 1))
    rays_d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (n, 1))
    near = jnp.full((n, 1), 1.0)
    far = jnp.full((n, 1), 3.0)
    edges, w = ray_bin_weights(grid, rays_o, rays_d, near, far, BBOX,
                               n_bins=32)
    np.testing.assert_allclose(np.asarray(w), 1.0 / 32, atol=1e-7)
    z = S.sample_pdf(edges, w, 64, det=True)
    z_ref = S.sample_z_vals(near, far, 64)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z_ref), atol=1e-4)


def test_occupied_grid_concentrates_samples():
    grid = make_occupancy_grid(32)
    grid = update_grid(grid, _sphere_sigma, {}, BBOX, jax.random.PRNGKey(0),
                       decay=0.0)
    rays_o = jnp.array([[0.0, 0.0, 2.0]])
    rays_d = jnp.array([[0.0, 0.0, -1.0]])
    near = jnp.array([[1.0]])
    far = jnp.array([[3.0]])
    edges, w = ray_bin_weights(grid, rays_o, rays_d, near, far, BBOX,
                               n_bins=64, uniform_frac=0.1)
    z = np.asarray(S.sample_pdf(edges, w, 128, det=True))[0]
    # the sphere spans z in [1.6, 2.4] along this ray (depth 2 +- 0.4)
    inside = ((z > 1.6) & (z < 2.4)).mean()
    assert inside > 0.75                 # vs 0.4 for uniform sampling
    assert (np.diff(z) >= 0).all()       # sorted for the rank merge


def test_executor_trains_and_checkpoints_with_occupancy(tmp_path):
    from nerfpp_tpu.config import hashnerf_preset, TrainParams
    from nerfpp_tpu.data.synthetic import make_synthetic_scene
    from nerfpp_tpu.executor import NeRFExecutor

    scene = make_synthetic_scene(n_train=2, n_val=1, n_test=1, image_hw=24)
    p = hashnerf_preset(n_importance=8, log2_hashmap_size=10, n_levels=4,
                        finest_resolution=32, use_occupancy_grid=True,
                        occ_grid_resolution=16, occ_update_every=2,
                        occ_n_bins=16)
    tp = TrainParams(n_samples=8, n_rand=64, n_iters=5, chunk=64,
                     i_print=0, i_weights=0, i_testset=0, i_img=0,
                     base_dir=str(tmp_path))
    ex = NeRFExecutor(p)
    ex.white_bkgr = scene.white_bkgr
    ex.initialize(scene.bounding_box, tp.lrate_decay, seed=0)
    assert "occupancy" in ex.state
    m = ex.train(scene, tp)
    assert np.isfinite(m["loss"])
    # the grid buffer was refreshed from the field (no longer all-ones)
    d = np.asarray(ex.state["occupancy"].density)
    assert not np.allclose(d, 1.0)
    # render path consumes the grid
    v = scene.views[0]
    out = ex.render_view(v.pose, v.h, v.w, v.k, tp)
    assert np.isfinite(np.asarray(out["nerf"].rgb)).all()
    # checkpoint round-trip includes the buffer
    ex.save_checkpoint(tmp_path)
    p2 = hashnerf_preset(n_importance=8, log2_hashmap_size=10, n_levels=4,
                         finest_resolution=32, use_occupancy_grid=True,
                         occ_grid_resolution=16, occ_update_every=2,
                         occ_n_bins=16, ft_path=str(tmp_path))
    ex2 = NeRFExecutor(p2)
    ex2.initialize(scene.bounding_box, tp.lrate_decay, seed=0)
    np.testing.assert_allclose(np.asarray(ex2.state["occupancy"].density), d)


def test_tiled_ray_z_uniform_grid_is_uniform():
    """Tile-shared occupancy z on a fresh grid = linspace over the tile's
    [min near, max far]; sorted; identical within a tile."""
    from nerfpp_tpu.core.occupancy import tiled_ray_z
    grid = make_occupancy_grid(16)
    n, tile = 256, 128
    rng = np.random.RandomState(0)
    rays_o = jnp.asarray(np.tile([[0.0, 0.0, 2.0]], (n, 1)), jnp.float32)
    d = np.tile([[0.0, 0.0, -1.0]], (n, 1)) + rng.uniform(-0.01, 0.01, (n, 3))
    rays_d = jnp.asarray(d, jnp.float32)
    near = jnp.asarray(1.0 + rng.uniform(0, 0.05, n), jnp.float32)
    far = jnp.asarray(3.0 - rng.uniform(0, 0.05, n), jnp.float32)
    z = np.asarray(tiled_ray_z(grid, rays_o, rays_d, near, far, BBOX,
                               n_bins=32, n_samples=16, tile=tile))
    assert z.shape == (n, 16)
    # identical across the tile, spanning the tile's min-near..max-far
    assert np.abs(z[:128] - z[0]).max() == 0.0
    assert np.abs(z[128:] - z[128]).max() == 0.0
    np.testing.assert_allclose(z[0, 0], float(near[:128].min()), atol=1e-3)
    np.testing.assert_allclose(z[0, -1], float(far[:128].max()), atol=1e-3)
    assert (np.diff(z, axis=-1) >= 0).all()


def test_render_config_tiled_occ_end_to_end():
    """Renderer consumes the tile-shared z path (occ_ray_tile=128) and
    produces finite images that roughly match the per-ray path."""
    import dataclasses
    from nerfpp_tpu.render.renderer import (RenderConfig,
                                            make_nerf_integrate_fn,
                                            render_ray_batch)

    def toy_network(params, pts, viewdirs):
        d = jnp.linalg.norm(pts, axis=-1)
        sigma = jnp.where(d < 0.5, 50.0, 0.0)
        rgb = jnp.stack([jnp.full_like(sigma, 5.0)] * 3, -1)
        return jnp.concatenate([rgb, sigma[..., None]], -1)

    grid = make_occupancy_grid(32)
    grid = update_grid(grid, _sphere_sigma, {}, BBOX, jax.random.PRNGKey(0),
                       decay=0.0)
    n = 256
    rng = np.random.RandomState(1)
    rays_o = jnp.asarray(np.tile([[0.0, 0.0, 2.0]], (n, 1)), jnp.float32)
    d = np.tile([[0.0, 0.0, -1.0]], (n, 1)) + rng.uniform(-0.02, 0.02, (n, 3))
    rays_d = jnp.asarray(d, jnp.float32)
    cfg = RenderConfig(n_samples=32, n_importance=0, chunk=256,
                       use_viewdirs=False, thin_ray=True, n_occ_bins=32,
                       occ_ray_tile=128)
    cfg_perray = dataclasses.replace(cfg, occ_ray_tile=0)
    integ = make_nerf_integrate_fn(cfg)
    bb = jnp.asarray(BBOX)
    r1 = render_ray_batch({}, toy_network, integ, rays_o, rays_d, 0.0,
                          jax.random.PRNGKey(0), cfg, bb, occupancy=grid)
    r2 = render_ray_batch({}, toy_network, integ, rays_o, rays_d, 0.0,
                          jax.random.PRNGKey(0), cfg_perray, bb,
                          occupancy=grid)
    a, b = np.asarray(r1.outputs.rgb), np.asarray(r2.outputs.rgb)
    assert np.isfinite(a).all()
    np.testing.assert_allclose(a, b, atol=0.05)  # same scene, near-same z


def test_flagship_combination_end_to_end(tmp_path):
    """The bench flagship path in miniature: blocked scheme + Pallas kernels
    (interpret mode on CPU) + occupancy-guided coarse-only sampling +
    tile-coherent batches + sample-major ordering + tiled CDFs."""
    from nerfpp_tpu.config import hashnerf_blocked_preset, TrainParams
    from nerfpp_tpu.data.synthetic import make_synthetic_scene
    from nerfpp_tpu.executor import NeRFExecutor

    scene = make_synthetic_scene(n_train=2, n_val=1, n_test=1, image_hw=24)
    p = hashnerf_blocked_preset(
        n_importance=0, log2_hashmap_size=12, n_levels=4,
        finest_resolution=64, use_occupancy_grid=True,
        occ_grid_resolution=16, occ_update_every=2, occ_n_bins=8,
        # cross the budget-warmup cond inside the 4-iter run so the
        # flagship CI covers BOTH the full and budgeted branches
        occ_tile_budget_warmup=2)
    tp = TrainParams(n_samples=16, n_rand=256, n_iters=4, chunk=256,
                     i_print=0, i_weights=0, i_testset=0, i_img=0,
                     base_dir=str(tmp_path), tile_h=8, tile_w=16,
                     steps_per_call=2)
    ex = NeRFExecutor(p)
    ex.white_bkgr = scene.white_bkgr
    ex.initialize(scene.bounding_box, tp.lrate_decay, seed=0)
    assert ex._sample_major()            # blocked + pallas active
    m = ex.train(scene, tp)
    assert np.isfinite(m["loss"])
    v = scene.views[0]
    out = ex.render_view(v.pose, v.h, v.w, v.k, tp)
    assert np.isfinite(np.asarray(out["nerf"].rgb)).all()


def test_tile_budget_covers_all_rays_once():
    """The two-class tile budget partitions the batch exactly: every ray is
    rendered once (idx_dense + idx_sparse = a permutation), dense tiles are
    the highest-mass ones, and results are finite."""
    from nerfpp_tpu.core.occupancy import OccupancyGrid, tiled_prior
    from nerfpp_tpu.render.renderer import (RenderConfig,
                                            make_nerf_integrate_fn,
                                            render_ray_batch_budgeted)

    res = 16
    dens = np.zeros((res, res, res), np.float32)
    dens[10:14, 6:10, 6:10] = 5.0           # one occupied box
    grid = OccupancyGrid(density=jnp.asarray(dens))
    bbox = jnp.array([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0])

    tile = 32
    n_tiles = 8
    r = tile * n_tiles
    rng = np.random.RandomState(0)
    rays_o = jnp.asarray(np.tile([[0.0, 0.0, -2.5]], (r, 1)), jnp.float32)
    # half the tiles aim at the occupied box (+x side), half away
    dirs = []
    for t in range(n_tiles):
        cx = 0.5 if t % 2 == 0 else -0.7
        d = np.tile([[cx, 0.0, 1.0]], (tile, 1)) + rng.randn(tile, 3) * 0.01
        dirs.append(d)
    rays_d = jnp.asarray(np.concatenate(dirs), jnp.float32)

    def toy_network(params, pts, viewdirs):
        sigma = jnp.where(pts[..., 0] > 0.2, 3.0, 0.0)
        rgb = jnp.full(pts.shape[:-1] + (3,), 0.5)
        return jnp.concatenate([rgb, sigma[..., None]], axis=-1)

    cfg = RenderConfig(n_samples=16, n_importance=0, use_viewdirs=False,
                       thin_ray=True, n_occ_bins=8, occ_ray_tile=tile)
    res_d, res_s, idx_d, idx_s = render_ray_batch_budgeted(
        {}, toy_network, make_nerf_integrate_fn(cfg), rays_o, rays_d, None,
        jax.random.PRNGKey(0), cfg, bbox, occupancy=grid,
        dense_frac=0.5, sparse_samples=4)
    # exact single coverage
    allidx = np.sort(np.concatenate([np.asarray(idx_d), np.asarray(idx_s)]))
    np.testing.assert_array_equal(allidx, np.arange(r))
    assert res_d.outputs.rgb.shape == (r // 2, 3)
    assert res_s.outputs.rgb.shape == (r // 2, 3)
    assert np.isfinite(np.asarray(res_d.outputs.rgb)).all()
    assert np.isfinite(np.asarray(res_s.outputs.rgb)).all()
    # dense class = exactly the tiles whose rays hit the occupied box
    near, far = jnp.broadcast_to(jnp.float32(1.0), (r, 1)), \
        jnp.broadcast_to(jnp.float32(4.0), (r, 1))
    _, _, mass = tiled_prior(grid, rays_o, rays_d, near, far, bbox, 8,
                             tile=tile)
    dense_tiles = set((np.asarray(idx_d) // tile).tolist())
    top = set(np.argsort(-np.asarray(mass))[:4].tolist())
    assert dense_tiles == top
    # sparse class got the smaller sample count
    assert res_s.z_vals.shape[-1] == 4
    assert res_d.z_vals.shape[-1] == 16


def test_executor_tile_budget_trains(tmp_path):
    """Flagship + occ_tile_budget_frac: training runs, loss finite and
    comparable to the unbudgeted run on the same miniature scene."""
    from nerfpp_tpu.config import hashnerf_blocked_preset, TrainParams
    from nerfpp_tpu.data.synthetic import make_synthetic_scene
    from nerfpp_tpu.executor import NeRFExecutor

    scene = make_synthetic_scene(n_train=2, n_val=1, n_test=1, image_hw=24)

    def run(frac):
        p = hashnerf_blocked_preset(
            n_importance=0, log2_hashmap_size=12, n_levels=4,
            finest_resolution=64, use_occupancy_grid=True,
            occ_grid_resolution=16, occ_update_every=2, occ_n_bins=8,
            occ_tile_budget_frac=frac, occ_sparse_samples=4,
            # warmup 3 of 6 iters: the run must cross the full->budgeted
            # lax.cond transition, exercising BOTH branches
            occ_ray_tile=128, occ_tile_budget_warmup=3)
        tp = TrainParams(n_samples=16, n_rand=256, n_iters=6, chunk=256,
                         i_print=0, i_weights=0, i_testset=0, i_img=0,
                         base_dir=str(tmp_path / f"b{frac}"),
                         tile_h=8, tile_w=16)
        ex = NeRFExecutor(p)
        ex.white_bkgr = scene.white_bkgr
        ex.initialize(scene.bounding_box, tp.lrate_decay, seed=0)
        return ex.train(scene, tp)

    m_b = run(0.5)
    m_0 = run(0.0)
    assert np.isfinite(m_b["loss"]) and np.isfinite(m_0["loss"])
    # same scene, same seed, fewer samples on the empty half: losses in the
    # same ballpark (the budget must not derail optimization)
    assert float(m_b["loss"]) < 4 * float(m_0["loss"]) + 0.1


def test_render_view_budget_and_auto_frac(tmp_path):
    """render_image's two-class budget via the executor: the budgeted render
    stays close to the full render of the same trained state, mutating the
    budget knobs recompiles (no stale cache hit), and render_dense_frac < 0
    (auto) resolves a valid bucketed fraction from the view's occupancy
    masses before compiling."""
    from nerfpp_tpu.config import hashnerf_blocked_preset, TrainParams
    from nerfpp_tpu.data.synthetic import make_synthetic_scene
    from nerfpp_tpu.executor import NeRFExecutor

    scene = make_synthetic_scene(n_train=2, n_val=1, n_test=1, image_hw=32)
    p = hashnerf_blocked_preset(
        n_importance=0, log2_hashmap_size=12, n_levels=4,
        finest_resolution=64, use_occupancy_grid=True,
        occ_grid_resolution=16, occ_update_every=2, occ_n_bins=8)
    tp = TrainParams(n_samples=16, n_rand=256, n_iters=6, chunk=256,
                     i_print=0, i_weights=0, i_testset=0, i_img=0,
                     base_dir=str(tmp_path), tile_h=8, tile_w=16)
    ex = NeRFExecutor(p)
    ex.white_bkgr = scene.white_bkgr
    ex.initialize(scene.bounding_box, tp.lrate_decay, seed=0)
    ex.train(scene, tp)
    v = scene.views[0]

    ex.params.render_dense_frac = 0.0
    full = np.asarray(ex.render_view(v.pose, v.h, v.w, v.k, tp)["nerf"].rgb)
    ex.params.render_dense_frac = 0.5      # must recompile, not hit cache
    ex.params.render_sparse_samples = 4
    bud = np.asarray(ex.render_view(v.pose, v.h, v.w, v.k, tp)["nerf"].rgb)
    assert bud.shape == full.shape
    assert np.isfinite(bud).all()
    # same trained state: sparse tiles are (mostly) empty space, so the
    # budgeted image stays close to the full one
    assert float(np.mean(np.abs(bud - full))) < 0.15

    # auto frac: a valid bucketed fraction that round-trips through
    # render_image's k_dense rounding (the shared k_dense_of helper), and
    # the batched (multi-pose) probe returns the max of the per-view fracs
    from nerfpp_tpu.render.renderer import k_dense_of
    frac = ex._auto_dense_frac(v.h, v.w, v.k, v.pose)
    n_tiles = (-(-v.h // 8) * 8) * (-(-v.w // 16) * 16) // 128
    assert 0.0 < frac < 1.0
    assert 1 <= k_dense_of(frac, n_tiles) <= n_tiles - 1
    assert k_dense_of(frac, n_tiles) == round(frac * n_tiles)
    poses2 = [scene.views[0].pose, scene.views[1].pose]
    f2 = ex._auto_dense_frac(v.h, v.w, v.k, poses2)
    f_each = max(ex._auto_dense_frac(v.h, v.w, v.k, p) for p in poses2)
    assert abs(f2 - f_each) < 1e-9
    ex.params.render_dense_frac = -1.0
    auto = np.asarray(ex.render_view(v.pose, v.h, v.w, v.k, tp)["nerf"].rgb)
    assert np.isfinite(auto).all()
    assert float(np.mean(np.abs(auto - full))) < 0.15


def test_phased_update_covers_all_cells():
    """8 phased updates (phases 0..7) refresh every cell exactly once, with
    per-call decay identical to the full refresh's (the whole grid decays
    every call; only the sigma probe is phased)."""
    from nerfpp_tpu.core.occupancy import (OccupancyGrid, update_grid_phased,
                                           make_occupancy_grid)

    g = 16
    bbox = np.array([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0], np.float32)

    def sigma_fn(params, pts):
        # cell-aligned indicator: sigma 5 where x < 0 (cells i < 8)
        return jnp.where(pts[..., 0] < 0.0, 5.0, 0.0)

    grid = make_occupancy_grid(g)
    for ph in range(8):
        grid = update_grid_phased(grid, sigma_fn, {}, bbox,
                                  jax.random.PRNGKey(ph), ph, decay=0.95)
    d = np.asarray(grid.density)
    # occupied half: sigma 5 written at the cell's phase, then decayed by at
    # most the 7 remaining calls' full-rate decay
    assert (d[:8] >= 5.0 * 0.95 ** 7 * (1.0 - 1e-6)).all()
    # empty half: never raised, decayed at the full refresh's per-call rate
    # — 8 calls = 0.95^8 (matches 8 triggers of update_grid exactly)
    np.testing.assert_allclose(d[8:], 0.95 ** 8, rtol=1e-5)


def test_executor_phased_refresh_trains(tmp_path):
    """occ_phased_refresh wires through the executor and stays finite."""
    from nerfpp_tpu.config import hashnerf_preset, TrainParams
    from nerfpp_tpu.data.synthetic import make_synthetic_scene
    from nerfpp_tpu.executor import NeRFExecutor

    scene = make_synthetic_scene(n_train=2, n_val=1, n_test=1, image_hw=16)
    p = hashnerf_preset(n_importance=0, log2_hashmap_size=10, n_levels=4,
                        finest_resolution=32, use_occupancy_grid=True,
                        occ_grid_resolution=16, occ_update_every=2,
                        occ_n_bins=8, occ_phased_refresh=True,
                        occ_phased_warmup=2)
    tp = TrainParams(n_samples=8, n_rand=128, n_iters=5, chunk=128,
                     i_print=0, i_weights=0, i_testset=0, i_img=0,
                     base_dir=str(tmp_path / "ph"))
    ex = NeRFExecutor(p)
    ex.white_bkgr = scene.white_bkgr
    ex.initialize(scene.bounding_box, tp.lrate_decay, seed=0)
    m = ex.train(scene, tp)
    assert np.isfinite(m["loss"])

"""Follow-up studies: tile-budget seed stability, tile-shared hierarchical
CDF throughput, render-time budget.

Usage: PYTHONPATH=. python scripts/quality_tile_budget2.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from nerfpp_tpu.config import hashnerf_blocked_preset, TrainParams
from nerfpp_tpu.data.dataset import RayBatchSampler
from nerfpp_tpu.executor import NeRFExecutor
from quality_tile_budget import load_scene


def main():
    scene = load_scene()
    test_v = scene.views[list(scene.split_indices("test"))[0]]

    def train_flagship(tag, frac, seed, n_iters=2100):
        p = hashnerf_blocked_preset(n_importance=0, use_occupancy_grid=True,
                                    occ_update_every=32,
                                    occ_tile_budget_frac=frac,
                                    occ_sparse_samples=16)
        tp = TrainParams(n_samples=64, n_rand=4096, n_iters=n_iters,
                         chunk=4096, i_print=0, i_weights=0, i_testset=0,
                         i_img=0, base_dir=f"/tmp/qtb2_{tag}",
                         steps_per_call=100)
        ex = NeRFExecutor(p)
        ex.white_bkgr = scene.white_bkgr
        ex.initialize(scene.bounding_box, tp.lrate_decay, seed=seed)
        ex.train(scene, tp, seed=seed)
        out = ex.render_view(test_v.pose, test_v.h, test_v.w, test_v.k, tp)
        rgb = np.clip(np.asarray(out["nerf"].rgb), 0, 1)
        gt = scene.images[test_v.id]
        psnr = float(-10 * np.log10(max(float(np.mean((rgb - gt) ** 2)),
                                        1e-10)))
        print(f"{tag}: PSNR {psnr:.2f} dB", flush=True)
        return ex, tp

    # ---- seed stability of the budget win --------------------------------
    for seed in (1, 2):
        train_flagship(f"A_frac0_seed{seed}", 0.0, seed)
        train_flagship(f"B_frac0.5_seed{seed}", 0.5, seed)

    # ---- reference-parity hierarchical: per-ray vs tile-shared CDFs ------
    for tag, tile in (("hier_per_ray", 0), ("hier_tile128", 128)):
        pr = hashnerf_blocked_preset(n_importance=192, hier_ray_tile=tile)
        tpr = TrainParams(n_samples=64, n_rand=16384, n_iters=8100,
                          chunk=16384, i_print=0, i_weights=0, i_testset=0,
                          base_dir=f"/tmp/qtb2_{tag}", steps_per_call=5)
        exr = NeRFExecutor(pr)
        exr.white_bkgr = scene.white_bkgr
        exr.initialize(scene.bounding_box, tpr.lrate_decay, seed=0)
        samplerr = RayBatchSampler.from_scene(scene, tpr.n_rand,
                                              tile_h=8, tile_w=16)
        stepr = exr._build_train_step(tpr)
        manyr = exr._build_train_many(stepr)
        st = {**exr.state, "step": jnp.asarray(3000, jnp.int32)}
        st, m = manyr(st, samplerr, jax.random.PRNGKey(1), k=5)
        jax.tree.map(np.asarray, m)
        t0 = time.perf_counter()
        st, m = manyr(st, samplerr, jax.random.PRNGKey(1), k=5)
        jax.tree.map(np.asarray, m)
        rps = tpr.n_rand * 5 / (time.perf_counter() - t0)
        print(f"{tag} (16384 x 64+192): {rps:,.0f} rays/s", flush=True)

    # ---- render-time budget: Mpix/s + PSNR on a trained flagship ---------
    ex, tp = train_flagship("render_base", 0.5, 0, n_iters=4000)
    gt = scene.images[test_v.id]
    for tag, frac, sparse, n_s in (("render_full", 0.0, 8, 64),
                                   ("render_b50_sp8", 0.5, 8, 64),
                                   ("render_b50_sp8_ns32", 0.5, 8, 32),
                                   ("render_b35_sp8_ns32", 0.35, 8, 32)):
        ex.params.render_dense_frac = frac
        ex.params.render_sparse_samples = sparse
        ex._render_cache = {}
        tpr = TrainParams(n_samples=n_s, n_rand=4096, chunk=65536)
        out = ex.render_view(test_v.pose, test_v.h, test_v.w, test_v.k, tpr)
        np.asarray(out["nerf"].rgb)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            out = ex.render_view(test_v.pose, test_v.h, test_v.w,
                                 test_v.k, tpr)
            rgb = np.clip(np.asarray(out["nerf"].rgb), 0, 1)
            best = min(best, time.perf_counter() - t0)
        psnr = float(-10 * np.log10(max(float(np.mean((rgb - gt) ** 2)),
                                        1e-10)))
        mpix = test_v.h * test_v.w / best / 1e6
        print(f"{tag}: {mpix:.3f} Mpix/s | PSNR {psnr:.2f} dB", flush=True)


if __name__ == "__main__":
    main()

"""Occupancy-grid study: PSNR + steady rays/s at reduced sample budgets.

Variants at 2100 steps on the 800px synthetic scene (blocked T=2^19):
  A: 32+96, no occupancy      (baseline)
  B: 16+48, occupancy-guided  (2.7x fewer samples)
  C: 32+96, occupancy-guided  (same budget, quality upside)
Usage: PYTHONPATH=. python scripts/quality_occupancy.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from nerfpp_tpu.config import hashnerf_blocked_preset, TrainParams
from nerfpp_tpu.data.dataset import RayBatchSampler
from nerfpp_tpu.data.synthetic import make_synthetic_scene
from nerfpp_tpu.executor import NeRFExecutor


def main():
    scene = make_synthetic_scene(n_train=16, n_val=1, n_test=1, image_hw=800,
                                 white_bkgr=False, n_samples=64)
    test_v = scene.views[list(scene.split_indices("test"))[0]]

    def run(tag, n_samples, n_importance, use_occ, n_iters=2100):
        p = hashnerf_blocked_preset(n_importance=n_importance,
                                    use_occupancy_grid=use_occ,
                                    occ_update_every=32)
        tp = TrainParams(n_samples=n_samples, n_rand=4096, n_iters=n_iters,
                         chunk=4096, i_print=0, i_weights=0, i_testset=0,
                         i_img=0, base_dir=f"/tmp/qocc_{tag}",
                         steps_per_call=100)
        ex = NeRFExecutor(p)
        ex.white_bkgr = scene.white_bkgr
        ex.initialize(scene.bounding_box, tp.lrate_decay, seed=0)
        t0 = time.perf_counter()
        ex.train(scene, tp)
        wall = time.perf_counter() - t0
        # steady-state rate at the trained state
        sampler = RayBatchSampler.from_scene(scene, tp.n_rand,
                                             tile_h=8, tile_w=16)
        step = ex._build_train_step(tp)
        many = ex._build_train_many(step)
        st = {**ex.state, "step": jnp.asarray(3000, jnp.int32)}
        st, m = many(st, sampler, jax.random.PRNGKey(9), k=25)
        jax.tree.map(np.asarray, m)
        t0 = time.perf_counter()
        st, m = many(st, sampler, jax.random.PRNGKey(9), k=25)
        jax.tree.map(np.asarray, m)
        rps = tp.n_rand * 25 / (time.perf_counter() - t0)
        out = ex.render_view(test_v.pose, test_v.h, test_v.w, test_v.k, tp)
        rgb = np.clip(np.asarray(out["nerf"].rgb), 0, 1)
        gt = scene.images[test_v.id]
        psnr = float(-10 * np.log10(max(float(np.mean((rgb - gt) ** 2)),
                                        1e-10)))
        print(f"{tag}: PSNR {psnr:.2f} dB | steady {rps:,.0f} rays/s | "
              f"train wall {wall:.0f}s", flush=True)

    run("A_32+96_noocc", 32, 96, False)
    run("B_16+48_occ", 16, 48, True)
    run("C_32+96_occ", 32, 96, True)
    run("D_8+32_occ", 8, 32, True)




def coarse_only():
    """E/F: occupancy-guided coarse-only (no hierarchical pass) — the
    instant-ngp-style recipe; z placement shared across a tile's rays keeps
    encode groups coherent even when trained."""
    main_scene = make_synthetic_scene(n_train=16, n_val=1, n_test=1,
                                      image_hw=800, white_bkgr=False,
                                      n_samples=64)
    test_v = main_scene.views[list(main_scene.split_indices("test"))[0]]

    def run(tag, n_samples, n_iters=2100):
        p = hashnerf_blocked_preset(n_importance=0, use_occupancy_grid=True,
                                    occ_update_every=32)
        tp = TrainParams(n_samples=n_samples, n_rand=4096, n_iters=n_iters,
                         chunk=4096, i_print=0, i_weights=0, i_testset=0,
                         i_img=0, base_dir=f"/tmp/qocc_{tag}",
                         steps_per_call=100)
        ex = NeRFExecutor(p)
        ex.white_bkgr = main_scene.white_bkgr
        ex.initialize(main_scene.bounding_box, tp.lrate_decay, seed=0)
        t0 = time.perf_counter()
        ex.train(main_scene, tp)
        wall = time.perf_counter() - t0
        sampler = RayBatchSampler.from_scene(main_scene, tp.n_rand,
                                             tile_h=8, tile_w=16)
        step = ex._build_train_step(tp)
        many = ex._build_train_many(step)
        st = {**ex.state, "step": jnp.asarray(3000, jnp.int32)}
        st, m = many(st, sampler, jax.random.PRNGKey(9), k=25)
        jax.tree.map(np.asarray, m)
        t0 = time.perf_counter()
        st, m = many(st, sampler, jax.random.PRNGKey(9), k=25)
        jax.tree.map(np.asarray, m)
        rps = tp.n_rand * 25 / (time.perf_counter() - t0)
        out = ex.render_view(test_v.pose, test_v.h, test_v.w, test_v.k, tp)
        np.asarray(out["nerf"].rgb)
        t0 = time.perf_counter()
        out = ex.render_view(test_v.pose, test_v.h, test_v.w, test_v.k, tp)
        rgb = np.clip(np.asarray(out["nerf"].rgb), 0, 1)
        mpix = test_v.h * test_v.w / (time.perf_counter() - t0) / 1e6
        gt = main_scene.images[test_v.id]
        psnr = float(-10 * np.log10(max(float(np.mean((rgb - gt) ** 2)),
                                        1e-10)))
        print(f"{tag}: PSNR {psnr:.2f} dB | steady {rps:,.0f} rays/s | "
              f"render {mpix:.3f} Mpix/s | wall {wall:.0f}s", flush=True)

    run("E_48+0_occ", 48)
    run("F_64+0_occ", 64)
    run("G_96+0_occ", 96)

if __name__ == "__main__":
    import sys
    if "--hierarchical" in sys.argv:
        main()
    else:
        coarse_only()

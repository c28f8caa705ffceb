"""Tile-budget study: PSNR + steady rays/s with the two-class sample budget.

The budgeted path (renderer.render_ray_batch_budgeted) gives the top
``frac`` of each batch's 128-ray tiles (by occupancy mass) the full
NSamples and the rest only occ_sparse_samples — a shape-static form of
empty-space skipping. This study measures the quality/throughput trade on
the 800px synthetic scene at flagship settings (2100 steps, blocked
T=2^19, occupancy-guided coarse-only 64).
Usage: PYTHONPATH=. python scripts/quality_tile_budget.py
"""
import os
import sys
import time

import zipfile

import numpy as np
import jax
import jax.numpy as jnp

from nerfpp_tpu.config import hashnerf_blocked_preset, TrainParams
from nerfpp_tpu.data.dataset import RayBatchSampler
from nerfpp_tpu.data.synthetic import make_synthetic_scene
from nerfpp_tpu.executor import NeRFExecutor


def load_scene():
    cache = os.path.join(os.path.expanduser("~"), ".cache", "nerfpp_tpu",
                         "bench_scene_800_v1.npz")
    scene = make_synthetic_scene(n_train=16, n_val=1, n_test=1,
                                 image_hw=8, n_samples=2, white_bkgr=False)
    try:
        d = np.load(cache, allow_pickle=False)
        assert d["images"].shape[0] == len(scene.views)
        scene.images = d["images"]
        for v, hw, kk, pose in zip(scene.views, d["hw"], d["k"], d["poses"]):
            v.h, v.w = int(hw[0]), int(hw[1])
            v.k, v.pose = kk, pose
        return scene
    except (FileNotFoundError, OSError, KeyError, AssertionError,
            zipfile.BadZipFile):
        return make_synthetic_scene(n_train=16, n_val=1, n_test=1,
                                    image_hw=800, white_bkgr=False,
                                    n_samples=64)


def main():
    scene = load_scene()
    test_v = scene.views[list(scene.split_indices("test"))[0]]

    def run(tag, frac, sparse, n_iters=2100):
        p = hashnerf_blocked_preset(n_importance=0, use_occupancy_grid=True,
                                    occ_update_every=32,
                                    occ_tile_budget_frac=frac,
                                    occ_sparse_samples=sparse)
        tp = TrainParams(n_samples=64, n_rand=4096, n_iters=n_iters,
                         chunk=4096, i_print=0, i_weights=0, i_testset=0,
                         i_img=0, base_dir=f"/tmp/qtb_{tag}",
                         steps_per_call=100)
        ex = NeRFExecutor(p)
        ex.white_bkgr = scene.white_bkgr
        ex.initialize(scene.bounding_box, tp.lrate_decay, seed=0)
        t0 = time.perf_counter()
        ex.train(scene, tp)
        wall = time.perf_counter() - t0
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

    run("A_flagship_frac0", 0.0, 16)
    run("B_frac0.5_sp16", 0.5, 16)
    run("C_frac0.375_sp16", 0.375, 16)
    run("D_frac0.5_sp8", 0.5, 8)
    run("E_frac0.625_sp16", 0.625, 16)


if __name__ == "__main__":
    main()

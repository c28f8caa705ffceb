"""Render-budget check with the two-stage probe (cheap rank + dense-only
full prior). Usage: PYTHONPATH=.:scripts python scripts/render_budget_check.py
"""
import time

import numpy as np

from nerfpp_tpu.config import hashnerf_blocked_preset, TrainParams
from nerfpp_tpu.executor import NeRFExecutor
from quality_tile_budget import load_scene


def main():
    scene = load_scene()
    test_v = scene.views[list(scene.split_indices("test"))[0]]
    gt = scene.images[test_v.id]

    p = hashnerf_blocked_preset(n_importance=0, use_occupancy_grid=True,
                                occ_update_every=32)
    tp = TrainParams(n_samples=64, n_rand=4096, n_iters=4000, chunk=4096,
                     i_print=0, i_weights=0, i_testset=0, i_img=0,
                     base_dir="/tmp/rbc", steps_per_call=100)
    ex = NeRFExecutor(p)
    ex.white_bkgr = scene.white_bkgr
    ex.initialize(scene.bounding_box, tp.lrate_decay, seed=0)
    ex.train(scene, tp)

    variants = (("full", 0.0, 8, 64, 65536),
                ("b50_sp8_ns64", 0.5, 8, 64, 65536),
                ("b25_sp8_ns64", 0.25, 8, 64, 65536),
                ("b25_sp8_ns48", 0.25, 8, 48, 65536),
                ("b25_sp4_ns48", 0.25, 4, 48, 65536),
                ("b25_sp8_ns48_c128k", 0.25, 8, 48, 131072),
                ("b20_sp8_ns48", 0.20, 8, 48, 65536))
    for tag, frac, sparse, n_s, ch in variants:
        ex.params.render_dense_frac = frac
        ex.params.render_sparse_samples = sparse
        ex._render_cache = {}
        tpr = TrainParams(n_samples=n_s, n_rand=4096, chunk=ch)
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

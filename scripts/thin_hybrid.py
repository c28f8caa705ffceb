"""Thin-scene probe: occupancy-guided coarse + importance fine pass (hybrid).

thin_followup.py established that on the thin-structures scene, seed 1 lands
on the exact all-white optimum (13.59 dB) under EVERY pure-occupancy variant,
while the hierarchical path escapes on both seeds — its per-ray importance
resampling re-concentrates samples the moment any faint density appears, a
positive feedback the one-way EMA-carved grid lacks. The hybrid keeps the
occupancy-guided coarse pass (fast, tile-coherent) and adds a small
importance fine pass on the coarse weights (render/renderer.py already
composes the two, render_rays occ_bins + n_importance>0), restoring the
feedback loop at a fraction of the hierarchical path's 192-sample cost.

Usage: PYTHONPATH=.:scripts:/root/.axon_site python scripts/thin_hybrid.py
Results: PERFORMANCE.md "Second-scene check".
"""
import time

import numpy as np

from nerfpp_tpu.config import TrainParams, hashnerf_blocked_preset
from nerfpp_tpu.executor import NeRFExecutor
from quality_two_scenes import load_thin_scene


def main():
    scene = load_thin_scene()
    test_v = scene.views[list(scene.split_indices("test"))[0]]
    gt = scene.images[test_v.id]

    def run(tag, seed, n_iters=2100, **kw):
        p = hashnerf_blocked_preset(use_occupancy_grid=True,
                                    occ_update_every=32, **kw)
        tp = TrainParams(n_samples=64, n_rand=4096, n_iters=n_iters,
                         chunk=4096, i_print=0, i_weights=0, i_testset=0,
                         i_img=0, base_dir=f"/tmp/thh_{tag}_{seed}",
                         steps_per_call=100)
        ex = NeRFExecutor(p)
        ex.white_bkgr = scene.white_bkgr
        ex.initialize(scene.bounding_box, tp.lrate_decay, seed=seed)
        t0 = time.perf_counter()
        ex.train(scene, tp)
        wall = time.perf_counter() - t0
        out = ex.render_view(test_v.pose, test_v.h, test_v.w, test_v.k, tp)
        rgb = np.asarray(out["rgb8"]).astype(np.float32) / 255.0
        psnr = float(-10 * np.log10(max(float(np.mean((rgb - gt) ** 2)),
                                        1e-10)))
        print(f"{tag} seed{seed}: PSNR {psnr:.2f} dB | wall {wall:.0f}s",
              flush=True)

    # hybrid: occ coarse 64 + importance fine 32, training tile budget off
    # (the budget path composes with the fine pass untested; probe clean)
    for seed in (1, 0):
        run("hyb32", seed, n_importance=32, occ_tile_budget_frac=0.0)
    # cheaper fine pass
    for seed in (1, 0):
        run("hyb16", seed, n_importance=16, occ_tile_budget_frac=0.0)
    # hybrid WITH the training tile budget (flagship default 0.5/16)
    for seed in (1, 0):
        run("hyb32_budget", seed, n_importance=32)


if __name__ == "__main__":
    main()

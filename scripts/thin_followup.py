"""Follow-up measurements for the thin-scene study (run serially, ONE
process): remaining seeds of the v2 grid + the budget-warmup fix A/B.

Usage: PYTHONPATH=.:scripts python scripts/thin_followup.py
Results: PERFORMANCE.md "Second-scene check" section.
"""
import time

import numpy as np

import jax
from nerfpp_tpu.config import TrainParams, hashnerf_blocked_preset
from nerfpp_tpu.executor import NeRFExecutor
from quality_two_scenes import load_thin_scene


def main():
    scene = load_thin_scene()
    test_v = scene.views[list(scene.split_indices("test"))[0]]
    gt = scene.images[test_v.id]

    def run(tag, seed, **kw):
        hier = kw.pop("hier", False)
        if hier:
            p = hashnerf_blocked_preset(n_importance=96, **kw)
            ns = 32
        else:
            p = hashnerf_blocked_preset(n_importance=0,
                                        use_occupancy_grid=True,
                                        occ_update_every=32, **kw)
            ns = 64
        tp = TrainParams(n_samples=ns, n_rand=4096, n_iters=2100,
                         chunk=4096, i_print=0, i_weights=0, i_testset=0,
                         i_img=0, base_dir=f"/tmp/thf_{tag}_{seed}",
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

    # the budget-warmup fix (new defaults) — the headline A/B
    for seed in (0, 1):
        run("A_warm1024", seed)
    # remaining v2-grid seeds (warmup off reproduces the old flagship)
    run("A_no_warm", 1, occ_tile_budget_warmup=0)   # sanity: repro 13.59
    run("B_no_budget", 1, occ_tile_budget_frac=0.0)
    run("C_full_refresh", 1, occ_phased_refresh=False)
    run("D_hier_32_96", 1, hier=True)
    # both-warmups-long control: ~disables both features for 2100 steps
    run("A_bothlong", 0, occ_phased_warmup=2048, occ_tile_budget_warmup=2048)


if __name__ == "__main__":
    main()

"""Quality gate for the phased occupancy refresh: held-out PSNR at 2100
steps, full vs phased refresh (with the preset's 1024-step full-refresh
warmup), 3 seeds (per-seed variance on this scene is large — measured
spread up to 7.5 dB for the full refresh — so single-seed deltas are
meaningless). Measured 2026-08-17: full 32.83/31.70/25.32, phased+warmup
30.94/31.67/31.29 — phased mean +1.35 dB and 10x smaller spread.

Usage: PYTHONPATH=.:scripts python scripts/quality_phased.py
"""
import time

import numpy as np

import jax
import jax.numpy as jnp

from nerfpp_tpu.config import TrainParams, hashnerf_blocked_preset
from nerfpp_tpu.executor import NeRFExecutor
from quality_tile_budget import load_scene


def main():
    scene = load_scene()
    test_v = scene.views[list(scene.split_indices("test"))[0]]
    gt = scene.images[test_v.id]

    def run(tag, phased, seed):
        p = hashnerf_blocked_preset(n_importance=0, use_occupancy_grid=True,
                                    occ_update_every=32,
                                    occ_phased_refresh=phased)
        tp = TrainParams(n_samples=64, n_rand=4096, n_iters=2100,
                         chunk=4096, i_print=0, i_weights=0, i_testset=0,
                         i_img=0, base_dir=f"/tmp/qph_{tag}_{seed}",
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

    for seed in (0, 1, 2):
        run("full", False, seed)
        run("phased", True, seed)


if __name__ == "__main__":
    main()

"""Thin-scene all-white-collapse mitigation probes (seed 1).

thin_followup.py established that on the thin-structures scene, seed 1
collapses to EXACTLY the all-white render (13.59 dB) under EVERY
occupancy-path variant — budget on/off, phased on/off, warmup on/off —
while the hierarchical path reaches 25 dB on both seeds. The failure is
the occupancy recipe itself: once the field carves everything, the render
matches the white background on ~85% of pixels and thin structures never
re-emerge. These probes vary the occupancy prior's knobs one at a time on
the failing seed.

Usage: PYTHONPATH=.:scripts:/root/.axon_site python scripts/thin_mitigations.py
Results: PERFORMANCE.md "Second-scene check".
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

    def run(tag, seed=1, n_iters=2100, **kw):
        p = hashnerf_blocked_preset(n_importance=0, use_occupancy_grid=True,
                                    occ_update_every=32, **kw)
        tp = TrainParams(n_samples=64, n_rand=4096, n_iters=n_iters,
                         chunk=4096, i_print=0, i_weights=0, i_testset=0,
                         i_img=0, base_dir=f"/tmp/thm_{tag}_{seed}",
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

    run("U_frac0.3", occ_uniform_frac=0.3)
    run("U_frac0.5", occ_uniform_frac=0.5)
    run("P_per_ray_cdf", occ_ray_tile=0)
    run("B_bins128", occ_n_bins=128)
    run("L_8100_default", n_iters=8100)   # does the full schedule escape?


if __name__ == "__main__":
    main()

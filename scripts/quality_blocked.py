"""Quality study: blocked-scheme HashNeRF PSNR on the 800px synthetic scene.

Variants: tile sampling with/without the reference's annealed noises, and
fully-random pixel sampling (coherence control). Informs the flagship bench
recipe. Usage: PYTHONPATH=. python scripts/quality_blocked.py
"""
import time

import numpy as np

from nerfpp_tpu.config import hashnerf_blocked_preset, TrainParams
from nerfpp_tpu.data.dataset import RayBatchSampler
from nerfpp_tpu.data.synthetic import make_synthetic_scene
from nerfpp_tpu.executor import NeRFExecutor


def main():
    scene = make_synthetic_scene(n_train=16, n_val=1, n_test=1, image_hw=800,
                                 white_bkgr=False, n_samples=64)
    test_v = scene.views[list(scene.split_indices("test"))[0]]

    def quality(tag, use_noises, tiles, n_iters=2000):
        p = hashnerf_blocked_preset()
        p.n_importance = 96
        tp = TrainParams(n_samples=32, n_rand=4096, n_iters=n_iters,
                         chunk=4096, i_print=500, i_weights=0, i_testset=0,
                         i_img=0, base_dir=f"/tmp/q_{tag}",
                         steps_per_call=100,
                         tile_h=8 if tiles else -1, tile_w=16 if tiles else -1)
        ex = NeRFExecutor(p)
        ex.white_bkgr = scene.white_bkgr
        ex.initialize(scene.bounding_box, tp.lrate_decay, seed=0)
        if not use_noises:
            ex.sp_alpha0 = 0.0   # disables SP position jitter
        t0 = time.perf_counter()
        ex.train(scene, tp)
        wall = time.perf_counter() - t0
        out = ex.render_view(test_v.pose, test_v.h, test_v.w, test_v.k, tp)
        rgb = np.asarray(out["nerf"].rgb)
        gt = scene.images[test_v.id]
        psnr = float(-10 * np.log10(max(float(np.mean((rgb - gt) ** 2)),
                                        1e-10)))
        print(f"{tag}: PSNR {psnr:.2f} dB after {n_iters} steps in {wall:.0f}s",
              flush=True)

    quality("tiles_noises", True, True)
    quality("tiles_nonoise", False, True)
    quality("random_pixels", True, False)


if __name__ == "__main__":
    main()

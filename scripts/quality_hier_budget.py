"""Quality of the hierarchical fine-pass tile budget: held-out PSNR at 2100
steps on the 800px scene, 64+192 hierarchical (reference sampling), NRand
4096 to keep runtime sane.

Usage: PYTHONPATH=.:scripts python scripts/quality_hier_budget.py
"""
import time

import numpy as np

import jax
import jax.numpy as jnp

from nerfpp_tpu.config import TrainParams, hashnerf_blocked_preset
from nerfpp_tpu.data.dataset import RayBatchSampler
from nerfpp_tpu.executor import NeRFExecutor
from quality_tile_budget import load_scene


def main():
    scene = load_scene()
    test_v = scene.views[list(scene.split_indices("test"))[0]]
    gt = scene.images[test_v.id]

    def run(tag, tile, frac, sparse, seed=0):
        p = hashnerf_blocked_preset(n_importance=192, hier_ray_tile=tile,
                                    hier_tile_budget_frac=frac,
                                    hier_sparse_importance=sparse)
        tp = TrainParams(n_samples=64, n_rand=4096, n_iters=2100,
                         chunk=4096, i_print=0, i_weights=0, i_testset=0,
                         i_img=0, base_dir=f"/tmp/qhb_{tag}",
                         steps_per_call=100)
        ex = NeRFExecutor(p)
        ex.white_bkgr = scene.white_bkgr
        ex.initialize(scene.bounding_box, tp.lrate_decay, seed=seed)
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
        rgb = np.asarray(out["rgb8"]).astype(np.float32) / 255.0
        psnr = float(-10 * np.log10(max(float(np.mean((rgb - gt) ** 2)),
                                        1e-10)))
        print(f"{tag}: PSNR {psnr:.2f} dB | steady {rps:,.0f} rays/s | "
              f"train wall {wall:.0f}s", flush=True)

    import sys
    if len(sys.argv) > 1 and sys.argv[1] == "push":
        # round-3 throughput push candidates (bench_hier_budget.py push:
        # 0.25/16 = 81.2k, 0.2/16 = 84.2k rays/s at NRand 16384)
        run("C_frac0.25_sp32 (ctl)", 128, 0.25, 32)
        run("D_frac0.25_sp16", 128, 0.25, 16)
        run("E_frac0.2_sp16", 128, 0.2, 16)
        return
    run("A_tiled_frac0", 128, 0.0, 0)
    run("B_frac0.5_sp32", 128, 0.5, 32)
    run("C_frac0.25_sp32", 128, 0.25, 32)


if __name__ == "__main__":
    main()

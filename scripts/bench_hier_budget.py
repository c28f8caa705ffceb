"""Throughput of the hierarchical fine-pass tile budget on the reference
workload (NRand 16384, 64+192, main.cpp:230-234 semantics).

Usage: PYTHONPATH=.:scripts python scripts/bench_hier_budget.py
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
    key = jax.random.PRNGKey(1)
    import sys
    grid = (("per-ray CDF (reference semantics)", 0, 0.0, 0),
            ("tiled CDF", 128, 0.0, 0),
            ("tiled + budget 0.5/32", 128, 0.5, 32),
            ("tiled + budget 0.25/32", 128, 0.25, 32),
            ("tiled + budget 0.5/64", 128, 0.5, 64))
    if len(sys.argv) > 1 and sys.argv[1] == "push":
        grid = (("tiled + budget 0.25/32 (ctl)", 128, 0.25, 32),
                ("tiled + budget 0.25/16", 128, 0.25, 16),
                ("tiled + budget 0.2/32", 128, 0.2, 32),
                ("tiled + budget 0.2/16", 128, 0.2, 16),
                ("tiled + budget 0.15/32", 128, 0.15, 32))
    for tag, tile, frac, sparse in grid:
        pr = hashnerf_blocked_preset(n_importance=192, hier_ray_tile=tile,
                                     hier_tile_budget_frac=frac,
                                     hier_sparse_importance=sparse)
        tpr = TrainParams(n_samples=64, n_rand=16384, n_iters=8100,
                          chunk=16384, i_print=0, i_weights=0, i_testset=0,
                          base_dir="/tmp/nerfpp_hb", steps_per_call=5)
        exr = NeRFExecutor(pr)
        exr.white_bkgr = scene.white_bkgr
        exr.initialize(scene.bounding_box, tpr.lrate_decay, seed=0)
        sampler = RayBatchSampler.from_scene(scene, tpr.n_rand,
                                             tile_h=8, tile_w=16)
        stepr = exr._build_train_step(tpr)
        manyr = exr._build_train_many(stepr)
        st = {**exr.state, "step": jnp.asarray(3000, jnp.int32)}
        st, mr = manyr(st, sampler, key, k=5)
        jax.tree.map(np.asarray, mr)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            st, mr = manyr(st, sampler, key, k=5)
            jax.tree.map(np.asarray, mr)
            best = min(best, (time.perf_counter() - t0) / 5)
        print(f"{tag}: {tpr.n_rand/best:,.0f} rays/s "
              f"({best*1e3:.0f} ms/step)", flush=True)


if __name__ == "__main__":
    main()

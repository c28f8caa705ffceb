"""Benchmark: HashNeRF training throughput + quality on the synthetic scene.

Run by the driver on real TPU hardware each round. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The headline metric is training rays/sec on the flagship HashNeRF config
(L=16, F=2, T=2^19, base 16, finest 1024, NeRFSmall 3x64, SH-8 dirs,
64 coarse + 192 importance samples, NRand=16384 — main.cpp:178-243 semantics),
compared against the driver target of 5M rays/s (BASELINE.json). Secondary
numbers (short-training PSNR, render Mpix/s) are printed to stderr and
recorded in extras.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from nerfpp_tpu.config import hashnerf_preset, TrainParams
    from nerfpp_tpu.data.dataset import RayBatchSampler
    from nerfpp_tpu.data.synthetic import make_synthetic_scene
    from nerfpp_tpu.executor import NeRFExecutor

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    # scene: procedural, 128x128 views (no datasets ship with the image)
    scene = make_synthetic_scene(n_train=24, n_val=1, n_test=3, image_hw=128,
                                 white_bkgr=False)

    p = hashnerf_preset(density_activation="trunc_exp")
    tp = TrainParams(n_samples=64, n_rand=16384, n_iters=8100,
                     i_print=0, i_weights=0, i_testset=0,
                     base_dir="/tmp/nerfpp_bench", chunk=16384)

    ex = NeRFExecutor(p)
    ex.white_bkgr = scene.white_bkgr
    ex.initialize(scene.bounding_box, tp.lrate_decay, seed=0)
    sampler = RayBatchSampler.from_scene(scene, tp.n_rand)
    train_step = ex._build_train_step(tp)
    key = jax.random.PRNGKey(1)
    state = ex.state

    # warmup + compile
    state, metrics = train_step(state, sampler, key)
    jax.block_until_ready(metrics)

    # throughput: timed steps
    n_timed = 150
    t0 = time.perf_counter()
    for _ in range(n_timed):
        state, metrics = train_step(state, sampler, key)
    jax.block_until_ready(metrics)
    dt = time.perf_counter() - t0
    rays_per_sec = n_timed * tp.n_rand / dt
    print(f"train: {n_timed} steps in {dt:.2f}s -> {rays_per_sec:,.0f} rays/s",
          file=sys.stderr)

    # quality: continue to 1500 total steps, then eval a test view
    n_quality = 1350
    for _ in range(n_quality):
        state, metrics = train_step(state, sampler, key)
    jax.block_until_ready(metrics)
    ex.state = state
    v = scene.views[scene.split_indices("test")[0]]
    out = ex.render_view(v.pose, v.h, v.w, v.k, tp)
    rgb = np.asarray(out["nerf"].rgb)
    gt = scene.images[v.id]
    psnr = float(-10 * np.log10(max(float(np.mean((rgb - gt) ** 2)), 1e-10)))
    print(f"test-view PSNR after {1 + n_timed + n_quality} steps: {psnr:.2f} dB",
          file=sys.stderr)

    # render throughput
    t0 = time.perf_counter()
    out = ex.render_view(v.pose, v.h, v.w, v.k, tp)
    jax.block_until_ready(out["nerf"].rgb)
    dt_render = time.perf_counter() - t0
    mpix_s = v.h * v.w / dt_render / 1e6
    print(f"render: {v.h}x{v.w} in {dt_render:.2f}s -> {mpix_s:.3f} Mpix/s",
          file=sys.stderr)

    target = 5e6  # rays/s on v5e-8 (BASELINE.json)
    print(json.dumps({
        "metric": "hashnerf_train_rays_per_sec",
        "value": round(rays_per_sec),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / target, 4),
        "extras": {"psnr_1500_steps_db": round(psnr, 2),
                   "render_mpix_per_sec": round(mpix_s, 3),
                   "device": str(dev)},
    }))


if __name__ == "__main__":
    main()

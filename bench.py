"""Benchmark: HashNeRF training throughput + quality on the synthetic scene.

Run by the driver on real TPU hardware each round. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The headline metric is training rays/sec on the TPU flagship HashNeRF stack
(16-level hash encoding, VMEM-resident T=2^13 tables via the fused Pallas
encode kernel + MXU factorized-one-hot scatter backward, NeRFSmall 3x64, SH-8
dirs, hierarchical 32+96 sampling), compared against the driver target of
5M rays/s on a v5e-8 (BASELINE.json). Secondary numbers (short-training PSNR,
render Mpix/s, the reference-parity T=2^19 XLA-path rate, classic-NeRF rays/s)
go to stderr and the JSON extras.

See PERFORMANCE.md for the TPU gather-bottleneck analysis that currently
bounds the hash path, and the kernel roadmap.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def _steps_per_second(step_fn, state, sampler, key, n, jax):
    state, m = step_fn(state, sampler, key)
    jax.tree.map(np.asarray, m)  # full sync through the device tunnel
    t0 = time.perf_counter()
    for _ in range(n):
        state, m = step_fn(state, sampler, key)
    jax.tree.map(np.asarray, m)
    return state, (time.perf_counter() - t0) / n


def main() -> None:
    import jax

    from nerfpp_tpu.config import (hashnerf_preset, hashnerf_tpu_preset,
                                   classic_nerf_preset, TrainParams)
    from nerfpp_tpu.data.dataset import RayBatchSampler
    from nerfpp_tpu.data.synthetic import make_synthetic_scene
    from nerfpp_tpu.executor import NeRFExecutor

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    scene = make_synthetic_scene(n_train=16, n_val=1, n_test=2, image_hw=96,
                                 white_bkgr=False)
    extras = {"device": str(dev)}

    # ---- flagship: HashNeRF (TPU-fast preset: fused Pallas encode kernel,
    # VMEM-resident T=2^13 tables, MXU factorized-one-hot scatter backward) ---
    p = hashnerf_tpu_preset()
    tp = TrainParams(n_samples=32, n_rand=4096, n_iters=800,
                     i_print=0, i_weights=0, i_testset=0,
                     base_dir="/tmp/nerfpp_bench", chunk=4096)
    p.n_importance = 96
    ex = NeRFExecutor(p)
    ex.white_bkgr = scene.white_bkgr
    ex.initialize(scene.bounding_box, tp.lrate_decay, seed=0)
    sampler = RayBatchSampler.from_scene(scene, tp.n_rand)
    step_fn = ex._build_train_step(tp)
    key = jax.random.PRNGKey(1)

    state, dt = _steps_per_second(step_fn, ex.state, sampler, key, 20, jax)
    rays_per_sec = tp.n_rand / dt
    print(f"hashnerf train: {dt*1000:.1f} ms/step -> {rays_per_sec:,.0f} rays/s",
          file=sys.stderr)

    # quality: train to 1200 steps, eval one test view
    for _ in range(1200):
        state, m = step_fn(state, sampler, key)
    jax.tree.map(np.asarray, m)
    ex.state = state
    v = scene.views[list(scene.split_indices("test"))[0]]
    out = ex.render_view(v.pose, v.h, v.w, v.k, tp)
    rgb = np.asarray(out["nerf"].rgb)
    gt = scene.images[v.id]
    psnr = float(-10 * np.log10(max(float(np.mean((rgb - gt) ** 2)), 1e-10)))
    print(f"hashnerf PSNR after ~1220 steps: {psnr:.2f} dB", file=sys.stderr)
    extras["hashnerf_psnr_1220_steps_db"] = round(psnr, 2)

    t0 = time.perf_counter()
    out = ex.render_view(v.pose, v.h, v.w, v.k, tp)
    np.asarray(out["nerf"].rgb)
    mpix_s = v.h * v.w / (time.perf_counter() - t0) / 1e6
    extras["render_mpix_per_sec"] = round(mpix_s, 3)
    print(f"render: {mpix_s:.3f} Mpix/s", file=sys.stderr)

    # ---- secondary: reference-parity big-table config (T=2^19, XLA path) ---
    try:
        pr = hashnerf_preset()
        pr.n_importance = 96
        exr = NeRFExecutor(pr)
        exr.white_bkgr = scene.white_bkgr
        exr.initialize(scene.bounding_box, tp.lrate_decay, seed=0)
        stepr = exr._build_train_step(tp)
        _, dtr = _steps_per_second(stepr, exr.state, sampler, key, 5, jax)
        extras["hashnerf_t19_xla_rays_per_sec"] = round(tp.n_rand / dtr)
        print(f"hashnerf T=2^19 (XLA path): {dtr*1000:.1f} ms/step -> "
              f"{tp.n_rand/dtr:,.0f} rays/s", file=sys.stderr)
    except Exception as e:
        print(f"T=2^19 bench failed: {e}", file=sys.stderr)

    # ---- secondary: classic NeRF (gather-free, MXU-bound) ------------------
    try:
        pc = classic_nerf_preset(n_importance=64,
                                 density_activation="trunc_exp",
                                 mlp_init_gain=1.0)
        tpc = TrainParams(n_samples=64, n_rand=4096, n_iters=800, chunk=2048,
                          i_print=0, i_weights=0, i_testset=0,
                          base_dir="/tmp/nerfpp_bench_classic")
        exc = NeRFExecutor(pc)
        exc.white_bkgr = scene.white_bkgr
        exc.initialize(scene.bounding_box, tpc.lrate_decay, seed=0)
        samplerc = RayBatchSampler.from_scene(scene, tpc.n_rand)
        stepc = exc._build_train_step(tpc)
        _, dtc = _steps_per_second(stepc, exc.state, samplerc, key, 10, jax)
        classic_rps = tpc.n_rand / dtc
        extras["classic_nerf_rays_per_sec"] = round(classic_rps)
        print(f"classic train: {dtc*1000:.1f} ms/step -> {classic_rps:,.0f} rays/s",
              file=sys.stderr)
    except Exception as e:  # secondary metric must not sink the bench
        print(f"classic bench failed: {e}", file=sys.stderr)

    target = 5e6  # rays/s on v5e-8 (BASELINE.json)
    print(json.dumps({
        "metric": "hashnerf_train_rays_per_sec",
        "value": round(rays_per_sec),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / target, 6),
        "extras": extras,
    }))


if __name__ == "__main__":
    main()

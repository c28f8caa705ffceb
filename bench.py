"""Benchmark: HashNeRF training throughput + quality at reference capacity.

Run by the driver on real TPU hardware each round. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The headline metric is single-chip training rays/sec on the flagship
HashNeRF stack at FULL reference capacity — 16-level hash grid, T=2^19
entries/level (main.cpp:189) in the blocked halo layout with the windowed
Pallas encode/scatter kernel pair, NeRFSmall 3x64, SH-8 dirs, 64
occupancy-guided samples/ray, 8x16-tile-coherent ray batches — on an 800x800 synthetic
scene (realistic pixel density; the round-1 bench's 96px scene made tiles
angularly huge and was flagged as a miniature). Compared against the driver
target of 5M rays/s on a v5e-8 (BASELINE.json); this number is ONE chip —
the DP path (parallel/mesh.py, CLI --n-devices) is validated on the virtual
8-device CPU mesh and by the driver's multichip dryrun.

Headline measures the post-anneal steady state at the TRAINED state; the
early-phase rate, the exact reference workload (NRand 16384, 64+192
hierarchical samples, main.cpp:230-234), held-out PSNR on the real
annealing schedule, render Mpix/s, and the classic-NeRF stack go to
extras/stderr.
"""
from __future__ import annotations

import json
import os
import sys
import time

import zipfile

import numpy as np


def _sync(jax, x):
    jax.tree.map(np.asarray, x)  # full sync through the device tunnel


def _timed(jax, fn, *args):
    t0 = time.perf_counter()
    _sync(jax, fn(*args))
    return time.perf_counter() - t0


def main() -> None:
    import jax
    import jax.numpy as jnp

    from nerfpp_tpu.config import (TrainParams, classic_nerf_preset,
                                   hashnerf_blocked_preset)
    from nerfpp_tpu.data.dataset import RayBatchSampler
    from nerfpp_tpu.data.synthetic import make_synthetic_scene
    from nerfpp_tpu.executor import NeRFExecutor

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)
    t_bench0 = time.perf_counter()

    t0 = time.perf_counter()
    # per-user cache dir; plain ndarrays only, so no pickle (a world-readable
    # /tmp pickle would be an arbitrary-code-exec vector on shared hosts)
    cache_dir = os.path.join(os.path.expanduser("~"), ".cache", "nerfpp_tpu")
    os.makedirs(cache_dir, exist_ok=True)
    cache = os.path.join(cache_dir, "bench_scene_800_v1.npz")
    try:
        d = np.load(cache, allow_pickle=False)
        scene = make_synthetic_scene(n_train=16, n_val=1, n_test=1,
                                     image_hw=8, n_samples=2,
                                     white_bkgr=False)
        assert d["images"].shape[0] == len(scene.views)
        scene.images = d["images"]
        for v, hw, kk, pose in zip(scene.views, d["hw"], d["k"], d["poses"]):
            v.h, v.w = int(hw[0]), int(hw[1])
            v.k, v.pose = kk, pose
        print("scene cache hit", file=sys.stderr)
    except (FileNotFoundError, OSError, KeyError, ValueError, AssertionError,
            zipfile.BadZipFile):
        scene = make_synthetic_scene(n_train=16, n_val=1, n_test=1,
                                     image_hw=800, white_bkgr=False,
                                     n_samples=64)
        np.savez(cache, images=scene.images,
                 hw=np.asarray([[v.h, v.w] for v in scene.views]),
                 k=np.stack([v.k for v in scene.views]),
                 poses=np.stack([v.pose for v in scene.views]))
    print(f"scene ready (800px x 18 views): {time.perf_counter()-t0:.0f}s",
          file=sys.stderr)
    extras = {"device": str(dev), "hash_table_log2_size": 19,
              "config": ("blocked T=2^19 L=16, NRand 4096, 64 occupancy-"
                         "guided samples (no hierarchical pass), tiles 8x16, "
                         "tile budget 0.5/16 (empty tiles 16 samples)")}

    # ---- flagship: blocked T=2^19 + occupancy-guided coarse-only 64 -------
    # (measured best on BOTH axes: 32.5 dB @ 2100 steps vs 28.7 dB for the
    # no-occupancy hierarchical 32+96 baseline, at 2.3x the throughput; the
    # grid prior replaces the per-ray importance pass entirely, which also
    # sidesteps the annealed noises' fine-pass decoherence — PERFORMANCE.md)
    def make_flagship(sc=scene):
        p = hashnerf_blocked_preset(n_importance=0, use_occupancy_grid=True,
                                    occ_update_every=32)
        tp = TrainParams(n_samples=64, n_rand=4096, n_iters=8100, chunk=4096,
                         i_print=0, i_weights=0, i_testset=0,
                         base_dir="/tmp/nerfpp_bench", steps_per_call=25)
        ex = NeRFExecutor(p)
        ex.white_bkgr = sc.white_bkgr
        ex.initialize(sc.bounding_box, tp.lrate_decay, seed=0)
        return ex, tp

    ex, tp = make_flagship()
    sampler = RayBatchSampler.from_scene(scene, tp.n_rand, tile_h=8, tile_w=16)
    step_fn = ex._build_train_step(tp)
    many_fn = ex._build_train_many(step_fn)
    key = jax.random.PRNGKey(1)

    # early phase (annealed sigma-noise active; grid still warming up; the
    # phased-refresh and tile-budget warmups keep FULL refresh + FULL
    # sampling here, by design — this measures the warmup regime's device
    # rate). Methodology (tagged in extras since round 4): ONE k=32 scan
    # dispatch so tunnel latency doesn't pollute it, and the window is an
    # exact occ_update_every multiple so the timed window contains exactly
    # its amortized share of occupancy refreshes (steps 33-64, 1 refresh).
    state, m = step_fn(ex.state, sampler, key)
    _sync(jax, m)
    state, m = many_fn(state, sampler, key, k=32)
    _sync(jax, m)
    t0 = time.perf_counter()
    state, m = many_fn(state, sampler, key, k=32)
    _sync(jax, m)
    early_rps = tp.n_rand / ((time.perf_counter() - t0) / 32)
    extras["early_phase_rays_per_sec"] = round(early_rps)
    extras["early_phase_method"] = "one k=32 scan dispatch, steps 33-64"
    print(f"early (noisy) phase: {early_rps:,.0f} rays/s", file=sys.stderr)

    # ---- quality: real schedule (annealing active), held-out PSNR ---------
    # wall-clock-capped at ~7 min; reports the step it reached
    quality_steps = 0
    t_q = time.perf_counter()
    stateq = ex.state
    v = scene.views[list(scene.split_indices("test"))[0]]
    gt = scene.images[v.id]
    while quality_steps < tp.n_iters - 1 and \
            time.perf_counter() - t_q < 420:
        stateq, mq = many_fn(stateq, sampler, key, k=50)
        quality_steps += 50
        _sync(jax, mq["loss"])
        if quality_steps >= 2100 and "psnr_2100_steps_db" not in extras:
            # mid-train checkpoint PSNR: the comparison point for the
            # blender-loader pipeline train below (same scene, same steps)
            ex.state = stateq
            ex.params.render_dense_frac = 0.0
            outm = ex.render_view(v.pose, v.h, v.w, v.k, tp)
            rgbm = np.clip(np.asarray(outm["nerf"].rgb), 0, 1)
            extras["psnr_2100_steps_db"] = round(float(
                -10 * np.log10(max(float(np.mean((rgbm - gt) ** 2)),
                                   1e-10))), 2)
            # on a slow host the loop may pass 2100 late; record where the
            # control was actually taken so the pipeline row stays honest
            extras["psnr_2100_steps_actual"] = quality_steps
    ex.state = stateq
    # quality eval renders UNBUDGETED (preset default is auto): the PSNR
    # line measures the trained field, not the render-budget trade-off
    # (which the render_* tags below measure explicitly)
    ex.params.render_dense_frac = 0.0
    out = ex.render_view(v.pose, v.h, v.w, v.k, tp)
    rgb = np.clip(np.asarray(out["nerf"].rgb), 0, 1)
    psnr = float(-10 * np.log10(max(float(np.mean((rgb - gt) ** 2)), 1e-10)))
    extras[f"psnr_{quality_steps}_steps_db"] = round(psnr, 2)
    extras["quality_wall_clock_s"] = round(time.perf_counter() - t_q, 1)
    print(f"held-out PSNR after {quality_steps} steps "
          f"({extras['quality_wall_clock_s']}s): {psnr:.2f} dB",
          file=sys.stderr)

    # ---- headline: steady-state rate AT THE TRAINED STATE -----------------
    # (a trained model's sample placement is less group-coherent than an
    # untrained one's — measuring here is the honest number; noises are
    # annealed by this step count on the 8100 schedule)
    exq = ex
    state, m = many_fn(stateq, sampler, key, k=25)
    _sync(jax, m)
    t0 = time.perf_counter()
    for _ in range(4):
        state, m = many_fn(state, sampler, key, k=25)
    _sync(jax, m)
    dt = (time.perf_counter() - t0) / 100
    rays_per_sec = tp.n_rand / dt
    extras["step_ms"] = round(dt * 1000, 2)
    print(f"flagship steady state (trained): {dt*1000:.1f} ms/step -> "
          f"{rays_per_sec:,.0f} rays/s", file=sys.stderr)

    # ---- encode-kernel profile at flagship shape (VERDICT r2 #8) ----------
    # fwd/bwd rates on a 524k-point tile-coherent batch + achieved fraction
    # of the kernel's measured marginal-cost floor (44 ns/useful-window —
    # PERFORMANCE.md cost model; the step is ~80% encode kernels)
    try:
        sys.path.insert(0, str(__import__("pathlib").Path(
            __file__).resolve().parent / "scripts"))
        from bench_blocked_kernel import tile_coherent_points
        from nerfpp_tpu.encoders.hashgrid import HashGridEncoder
        from nerfpp_tpu.pallas import hash_encode_blocked as HB
        bb = np.array([-1.5, -1.5, -1.5, 1.5, 1.5, 1.5], np.float32)
        enc_k = HashGridEncoder(bb, n_levels=16, log2_hashmap_size=19,
                                base_resolution=16, finest_resolution=1024,
                                scheme="blocked")
        tab = enc_k.init(jax.random.PRNGKey(0))["table"]
        kpts = tile_coherent_points(32, 128, jax.random.PRNGKey(1)).reshape(-1, 3)
        gk = jax.random.normal(jax.random.PRNGKey(2),
                               (kpts.shape[0], enc_k.output_dims))

        KREPS = 32

        @jax.jit
        def fwd_loop(t, p, reps=KREPS):
            def body(c, _):
                return c + 1e-6 * jnp.sum(
                    HB.hash_encode_blocked(t, p + c * 1e-7, enc_k)), None
            return jax.lax.scan(body, 0.0, None, length=reps)[0]

        @jax.jit
        def bwd_loop(g, p, reps=KREPS):
            def body(c, _):
                return c + 1e-9 * jnp.sum(
                    HB.hash_encode_blocked_bwd(g, p + c * 1e-7, enc_k)), None
            return jax.lax.scan(body, 0.0, None, length=reps)[0]

        # per-dispatch floor (~25-35 ms through the device tunnel): measured
        # with an empty same-length scan and subtracted — training amortizes
        # dispatch over k-step scans, so the kernel rate should too (the
        # pre-r5 8-rep loop under-reported both rates by ~3.4 ms/rep)
        @jax.jit
        def empty_loop(c0, reps=KREPS):
            def body(c, _):
                return c * 1.0000001 + 1e-9, None
            return jax.lax.scan(body, c0, None, length=reps)[0]

        _sync(jax, empty_loop(0.0))
        floor = min(_timed(jax, empty_loop, 0.0) for _ in range(3))
        prof = {}
        for nm, fn, a in (("fwd", fwd_loop, tab), ("bwd", bwd_loop, gk)):
            _sync(jax, fn(a, kpts))
            d = (min(_timed(jax, fn, a, kpts) for _ in range(2))
                 - floor) / KREPS
            prof[nm] = kpts.shape[0] / d / 1e6
        extras["kernel_rate_method"] = (
            f"min-of-2 k={KREPS} in-jit scans, empty-scan dispatch floor "
            f"({floor*1e3:.1f} ms) subtracted")
        # useful-window floor on this batch (cost model: 44 ns/window + fixed)
        prep = HB._prepare(kpts, enc_k)
        wid_arr = np.asarray(prep[1]).reshape(-1, 128)
        useful = int((wid_arr != 0x7FFFFFFF).sum(-1).sum())
        floor_ms = useful * 44e-6
        ach = (kpts.shape[0] / (prof["fwd"] * 1e6)) * 1e3   # measured ms
        extras["encode_fwd_mpts_per_sec"] = round(prof["fwd"], 1)
        extras["encode_bwd_mpts_per_sec"] = round(prof["bwd"], 1)
        extras["kernel_window_floor_frac"] = round(floor_ms / ach, 3)
        print(f"encode kernels: fwd {prof['fwd']:.1f} / bwd {prof['bwd']:.1f}"
              f" M pts/s; window-floor fraction "
              f"{extras['kernel_window_floor_frac']}", file=sys.stderr)
    except Exception as e:  # profile must not sink the bench
        print(f"kernel profile failed: {e}", file=sys.stderr)

    # ---- step-time decomposition via ablation (VERDICT r2 #8) -------------
    # re-time the trained-state step with one subsystem disabled at a time;
    # the deltas are the subsystem's true amortized cost (direct stage
    # timing can't see through the fused jit). Encode share is derived from
    # the measured kernel rates on the budgeted per-step point count.
    try:
        prof_steps = {}
        for nm, ov in (("no_occ_refresh", dict(occ_update_every=1 << 30)),
                       ("tile_budget_off", dict(occ_tile_budget_frac=0.0))):
            kw = dict(n_importance=0, use_occupancy_grid=True,
                      occ_update_every=32)
            kw.update(ov)
            p2 = hashnerf_blocked_preset(**kw)
            ex2 = NeRFExecutor(p2)
            ex2.white_bkgr = scene.white_bkgr
            ex2.initialize(scene.bounding_box, tp.lrate_decay, seed=0)
            many2 = ex2._build_train_many(ex2._build_train_step(tp))
            st2, m2 = many2(stateq, sampler, key, k=25)
            _sync(jax, m2)
            t0 = time.perf_counter()
            for _ in range(2):
                st2, m2 = many2(st2, sampler, key, k=25)
            _sync(jax, m2)
            prof_steps[nm] = (time.perf_counter() - t0) / 50 * 1e3
        full_ms = dt * 1e3
        # per-step encoded points under the training tile budget (dense half
        # at n_samples, sparse half at occ_sparse_samples), fwd AND bwd
        pts_step = (tp.n_rand // 2) * tp.n_samples \
            + (tp.n_rand // 2) * ex.params.occ_sparse_samples
        sp = {"full": round(full_ms, 2),
              "occ_refresh_amortized":
                  round(full_ms - prof_steps["no_occ_refresh"], 2),
              "tile_budget_saving":
                  round(prof_steps["tile_budget_off"] - full_ms, 2)}
        if "fwd" in prof:
            sp["encode_fwd_bwd_est"] = round(
                pts_step / (prof["fwd"] * 1e6) * 1e3
                + pts_step / (prof["bwd"] * 1e6) * 1e3, 2)
        extras["step_profile_ms"] = sp
        print(f"step profile (ms): {sp}", file=sys.stderr)
    except Exception as e:
        print(f"step decomposition failed: {e}", file=sys.stderr)

    # ---- render throughput (800x800 full frame, tile-ordered) -------------
    # default = budgeted b20/sp2 at full NSamples (measured BEST PSNR of all
    # variants, profile_render.py bench8); "fast" trades ~0.3 dB for ~1.4x
    # "render_auto": dense_frac < 0 — the executor probes the view's
    # occupancy masses and picks the fraction itself (no scene-tuned knob)
    for tag, frac, sparse, n_s in (("render", 0.20, 2, 64),
                                   ("render_fast", 0.20, 2, 32),
                                   ("render_auto", -1.0, 2, 64)):
        exq.params.render_dense_frac = frac
        exq.params.render_sparse_samples = sparse
        exq._render_cache = {}
        tr = TrainParams(n_samples=n_s, n_rand=4096, chunk=65536)
        out = exq.render_view(v.pose, v.h, v.w, v.k, tr)   # compile
        np.asarray(out["rgb8"])
        best = float("inf")
        for _ in range(2):  # min-of-2: tunnel queue noise dominates
            t0 = time.perf_counter()
            out = exq.render_view(v.pose, v.h, v.w, v.k, tr)
            # the image artifact is the device-quantized uint8 map (what
            # render_path writes to PNG); the f32 map stays on device
            rgbr = np.asarray(out["rgb8"]).astype(np.float32) / 255.0
            best = min(best, time.perf_counter() - t0)
        mpix_s = v.h * v.w / best / 1e6
        p_r = float(-10 * np.log10(
            max(float(np.mean((rgbr - gt) ** 2)), 1e-10)))
        extras[f"{tag}_mpix_per_sec"] = round(mpix_s, 3)
        extras[f"{tag}_psnr_db"] = round(p_r, 2)
        print(f"{tag} 800x800: {mpix_s:.3f} Mpix/s at {p_r:.2f} dB",
              file=sys.stderr)

    # ---- reference workload: NRand 16384, 64+192 (main.cpp:230-234) -------
    # "reference_workload" = the shipped hashnerf preset defaults since
    # round 4 (tile-shared CDFs + coarse-ranked fine budget, both measured
    # PSNR-neutral — PERFORMANCE.md hier-budget study); "_exact" = per-ray
    # reference semantics behind the hier_ray_tile=0 flag. Both measured AT
    # THE TRAINED STATE (the flagship's 8100-schedule params transplant:
    # same model pytree, n_importance only changes sampling) — trained
    # sample placement is what decoheres the blocked kernel, so this is the
    # honest number (VERDICT r3 weak #3).
    try:
        for tag, over in (
                ("reference_workload", {}),
                ("reference_workload_exact", dict(hier_ray_tile=0,
                                                  hier_tile_budget_frac=0.0))):
            pr = hashnerf_blocked_preset(n_importance=192, **over)
            tpr = TrainParams(n_samples=64, n_rand=16384, n_iters=8100,
                              chunk=16384, i_print=0, i_weights=0,
                              i_testset=0, base_dir="/tmp/nerfpp_bench",
                              steps_per_call=5)
            exr = NeRFExecutor(pr)
            exr.white_bkgr = scene.white_bkgr
            exr.initialize(scene.bounding_box, tpr.lrate_decay, seed=0)
            samplerr = RayBatchSampler.from_scene(scene, tpr.n_rand,
                                                  tile_h=8, tile_w=16)
            stepr = exr._build_train_step(tpr)
            manyr = exr._build_train_many(stepr)
            str_ = {"params": stateq["params"],
                    "opt_state": stateq["opt_state"],
                    "step": jnp.asarray(quality_steps, jnp.int32)}
            st2, mr = manyr(str_, samplerr, key, k=5)
            _sync(jax, mr)
            t0 = time.perf_counter()
            st2, mr = manyr(st2, samplerr, key, k=5)
            _sync(jax, mr)
            ref_rps = tpr.n_rand / ((time.perf_counter() - t0) / 5)
            extras[f"{tag}_rays_per_sec"] = round(ref_rps)
            print(f"{tag} (16384 x 64+192): {ref_rps:,.0f} rays/s",
                  file=sys.stderr)
        extras["reference_workload_note"] = (
            "hierarchical 64+192, no occupancy; measured at the flagship's"
            f" trained {quality_steps}-step params (transplanted); default ="
            " preset accelerations (hier_ray_tile=128, budget 0.25/16),"
            " exact = per-ray semantics")
    except Exception as e:  # secondary metric must not sink the bench
        print(f"reference-workload bench failed: {e}", file=sys.stderr)

    # ---- secondary: classic NeRF (gather-free, MXU-bound) ------------------
    try:
        pc = classic_nerf_preset(n_importance=64,
                                 density_activation="trunc_exp",
                                 mlp_init_gain=1.0)
        tpc = TrainParams(n_samples=64, n_rand=4096, n_iters=800, chunk=4096,
                          i_print=0, i_weights=0, i_testset=0,
                          base_dir="/tmp/nerfpp_bench_classic")
        exc = NeRFExecutor(pc)
        exc.white_bkgr = scene.white_bkgr
        exc.initialize(scene.bounding_box, tpc.lrate_decay, seed=0)
        samplerc = RayBatchSampler.from_scene(scene, tpc.n_rand)
        stepc = exc._build_train_step(tpc)
        state, mc = stepc(exc.state, samplerc, key)
        _sync(jax, mc)
        t0 = time.perf_counter()
        for _ in range(10):
            state, mc = stepc(state, samplerc, key)
        _sync(jax, mc)
        classic_rps = tpc.n_rand / ((time.perf_counter() - t0) / 10)
        extras["classic_nerf_rays_per_sec"] = round(classic_rps)
        print(f"classic train: {classic_rps:,.0f} rays/s", file=sys.stderr)
    except Exception as e:
        print(f"classic bench failed: {e}", file=sys.stderr)

    # ---- blender-loader pipeline quality (VERDICT r3 #3) -------------------
    # Export the bench scene as a genuine transforms_{split}.json + PNG tree,
    # re-load it through data/blender.py (load_blender.h:127-217 semantics:
    # camera_angle_x focal, 0.15d/0.6d near/far heuristic, corner-ray bbox),
    # train the flagship 2100 steps through that path, and compare against
    # psnr_2100_steps_db from the direct-SceneData train above.
    try:
        from nerfpp_tpu.data.blender import (export_blender_scene,
                                             load_blender_data)
        from nerfpp_tpu.data.dataset import load_images
        exp_dir = os.path.join(cache_dir, "bench_blender_export_v1")
        if not os.path.exists(os.path.join(exp_dir, "transforms_train.json")):
            export_blender_scene(scene, exp_dir)
        bscene = load_blender_data(exp_dir, testskip=False,
                                   white_bkgr=scene.white_bkgr)
        t0 = time.perf_counter()
        exb, tpb = make_flagship(bscene)
        samplerb = RayBatchSampler.from_scene(bscene, tpb.n_rand,
                                              tile_h=8, tile_w=16)
        manyb = exb._build_train_many(exb._build_train_step(tpb))
        stb = exb.state
        for _ in range(2100 // 50):
            stb, mb = manyb(stb, samplerb, key, k=50)
        _sync(jax, mb["loss"])
        exb.state = stb
        exb.params.render_dense_frac = 0.0
        tidx = list(bscene.split_indices("test"))[0]
        vb = bscene.views[tidx]
        outb = exb.render_view(vb.pose, vb.h, vb.w, vb.k, tpb)
        rgbb = np.clip(np.asarray(outb["nerf"].rgb), 0, 1)
        gtb = load_images(bscene, [tidx], white_bkgr=scene.white_bkgr)[0]
        pb = float(-10 * np.log10(max(float(np.mean((rgbb - gtb) ** 2)),
                                      1e-10)))
        extras["blender_pipeline_psnr_db"] = round(pb, 2)
        extras["blender_pipeline_wall_s"] = round(time.perf_counter() - t0, 1)
        if "psnr_2100_steps_db" not in extras:
            extras["blender_pipeline_control"] = (
                "absent: the direct-scene quality loop timed out before"
                " step 2100 — the pipeline row has no same-step comparison")
        extras["blender_pipeline_note"] = (
            "trains through the real transforms_*.json loader; differs from"
            " the direct-scene row by the loader's own near/far heuristic +"
            " corner-ray bbox (load_blender.h:83-124 semantics — the JSON"
            " format carries no bounds), not by pipeline loss")
        print(f"blender-pipeline 2100 steps: {pb:.2f} dB (direct-scene "
              f"2100-step: {extras.get('psnr_2100_steps_db')})",
              file=sys.stderr)
    except Exception as e:
        print(f"blender-pipeline bench failed: {e}", file=sys.stderr)

    # ---- LeRF relevancy localization (VERDICT r3 #5) -----------------------
    # Train LeRF against the RandomProjection stand-in pyramid, query with
    # the blue prim's flat-color patch embedding, and score IoU@0.5 of the
    # relevancy map vs the GT color mask on a held-out view — the number that
    # catches a relevancy regression (LeRFRenderer.cpp:27-82 deliverable).
    try:
        from nerfpp_tpu.config import hashnerf_preset
        from nerfpp_tpu.data.pyramid_clip import (
            PyramidEmbedder, PyramidEmbedderProperties,
            RandomProjectionPatchEncoder, make_device_pyramid)
        t0 = time.perf_counter()
        scene_l = make_synthetic_scene(n_train=8, n_val=1, n_test=1,
                                       image_hw=128, white_bkgr=False,
                                       n_samples=64)
        enc = RandomProjectionPatchEncoder(embed_dim=24, input_size=8)
        props = PyramidEmbedderProperties(img_size=16, overlap=0.5,
                                          max_zoom_out=1)
        tr_idx = list(scene_l.split_indices("train"))
        emb = PyramidEmbedder(enc, props)(scene_l.images[tr_idx])
        dev_pyr = make_device_pyramid(emb, scale=0.5)

        blue = np.array([0.2, 0.5, 0.9], np.float32)     # prim 1 color
        red = np.array([0.9, 0.25, 0.2], np.float32)     # prim 0 color
        def patch(c):
            return np.broadcast_to(c, (1, 16, 16, 3)).astype(np.float32)
        # sampling config = the round-5 sweep winner (scripts/lerf_sweep.py):
        # hierarchical 32+16 per-ray CDF. The r4 config (32 uniform samples,
        # no importance) landed BOTH fields in the empty-field basin
        # (accLE = 0 -> constant relevancy -> the below-chance AUC 0.411);
        # the importance pass restores the LeRF density's feedback loop.
        pl = hashnerf_preset(
            n_importance=16, hier_ray_tile=0, hier_tile_budget_frac=0.0,
            log2_hashmap_size=14, n_levels=8,
            finest_resolution=128, use_lerf=True, lang_embed_dim=24,
            n_levels_le=4, log2_hashmap_size_le=12, finest_resolution_le=64)
        tpl = TrainParams(n_samples=32, n_rand=2048, n_iters=1001,
                          chunk=2048, i_print=0, i_weights=0, i_testset=0,
                          i_img=0, base_dir="/tmp/nerfpp_bench_lerf",
                          steps_per_call=50)
        exl = NeRFExecutor(pl)
        exl.white_bkgr = scene_l.white_bkgr
        exl.initialize(scene_l.bounding_box, tpl.lrate_decay, seed=0)
        exl.lerf_positives = jnp.asarray(enc(patch(blue)))
        exl.lerf_negatives = jnp.asarray(np.concatenate(
            [enc(patch(red)), enc(patch(np.zeros(3, np.float32)))]))
        ml = exl.train(scene_l, tpl, lang_embeddings=dev_pyr)
        vl = scene_l.views[list(scene_l.split_indices("test"))[0]]
        outl = exl.render_view(vl.pose, vl.h, vl.w, vl.k, tpl)
        rel = np.asarray(outl["lerf"].relevancy)[..., 0]
        gtl = scene_l.images[vl.id]
        mask = np.linalg.norm(gtl - blue, axis=-1) < 0.25
        # localization AUC (Mann-Whitney rank statistic): P(relevancy at an
        # object pixel > at a background pixel) — threshold-free, 0.5 =
        # chance, 1.0 = perfect ranking. The regression-catching number.
        # Midranks (rankdata average) keep ties unbiased: a saturated or
        # constant relevancy map scores exactly 0.5, not a memory-order
        # artifact (the r4 run's 0.411 was positional ranks on an all-equal
        # map from a collapsed field).
        from scipy.stats import rankdata
        r = rel.ravel()
        m = mask.ravel()
        ranks = rankdata(r, method="average")
        n_pos, n_neg = int(m.sum()), int((~m).sum())
        auc = ((ranks[m].sum() - n_pos * (n_pos + 1) / 2.0)
               / max(n_pos * n_neg, 1))
        extras["lerf_relevancy_auc"] = round(float(auc), 3)
        # IoU at the fixed Kerr-style 0.5 threshold (softmax pairing vs
        # negatives) — strict; the 24-d random-projection stand-in encoder
        # can rank perfectly yet sit under 0.5, hence AUC above
        pred = rel > 0.5
        inter = float(np.logical_and(pred, mask).sum())
        union = max(float(np.logical_or(pred, mask).sum()), 1.0)
        extras["lerf_relevancy_iou"] = round(inter / union, 3)
        extras["lerf_lang_loss"] = round(float(ml["lang_loss"]), 5)
        extras["lerf_wall_s"] = round(time.perf_counter() - t0, 1)
        # testset relevancy artifact (relevancy_0.png, JET colormap)
        exl.render_path([vl.pose], vl.h, vl.w, vl.k, tpl,
                        "/tmp/nerfpp_bench_lerf/testset")
        print(f"LeRF relevancy (blue prim, held-out view): AUC "
              f"{extras['lerf_relevancy_auc']} IoU@0.5 "
              f"{extras['lerf_relevancy_iou']} "
              f"(lang_loss {extras['lerf_lang_loss']})", file=sys.stderr)
    except Exception as e:
        print(f"LeRF bench failed: {e}", file=sys.stderr)

    # ---- thin-structures scene: DEFAULT-preset robustness (VERDICT r4 #5) --
    # The pure-occupancy flagship collapses to the all-white optimum on this
    # scene (13.59 dB); round 4 shipped the occ+importance hybrid as a
    # documented recipe, round 5 makes recovery automatic: the train loop
    # watches the batch render's std (config.auto_fine_*), detects the
    # constant-render basin, restarts the position-keyed state under the
    # hybrid (n_importance=16, tile budget off), and continues. This section
    # runs the UNMODIFIED default preset on both seeds — the number that
    # catches a robustness regression is the recovered PSNR, and
    # `thin_scene_auto_engaged` records that the detector (not a recipe
    # knob) did the work.
    try:
        t0 = time.perf_counter()
        cache_t = os.path.join(cache_dir, "bench_scene_thin400_v1.npz")
        try:
            d = np.load(cache_t, allow_pickle=False)
            thin = make_synthetic_scene(n_train=16, n_val=1, n_test=1,
                                        image_hw=8, n_samples=2,
                                        white_bkgr=True, variant="thin",
                                        textured=True)
            assert d["images"].shape[0] == len(thin.views)
            thin.images = d["images"]
            for v, hw, kk, pose in zip(thin.views, d["hw"], d["k"],
                                       d["poses"]):
                v.h, v.w = int(hw[0]), int(hw[1])
                v.k, v.pose = kk, pose
        except (FileNotFoundError, OSError, KeyError, ValueError,
                AssertionError, zipfile.BadZipFile):
            thin = make_synthetic_scene(n_train=16, n_val=1, n_test=1,
                                        image_hw=400, white_bkgr=True,
                                        n_samples=128, variant="thin",
                                        textured=True)
            np.savez(cache_t, images=thin.images,
                     hw=np.asarray([[v.h, v.w] for v in thin.views]),
                     k=np.stack([v.k for v in thin.views]),
                     poses=np.stack([v.pose for v in thin.views]))
        vt = thin.views[list(thin.split_indices("test"))[0]]
        gtt = thin.images[vt.id]
        for seed in (0, 1):
            pt = hashnerf_blocked_preset(n_importance=0,
                                         use_occupancy_grid=True,
                                         occ_update_every=32)
            tpt = TrainParams(n_samples=64, n_rand=4096, n_iters=2100,
                              chunk=4096, i_print=0, i_weights=0,
                              i_testset=0, i_img=0,
                              base_dir="/tmp/nerfpp_bench_thin",
                              steps_per_call=100)
            ext = NeRFExecutor(pt)
            ext.white_bkgr = thin.white_bkgr
            ext.initialize(thin.bounding_box, tpt.lrate_decay, seed=seed)
            ext.train(thin, tpt)
            ext.params.render_dense_frac = 0.0
            outt = ext.render_view(vt.pose, vt.h, vt.w, vt.k, tpt)
            rgbt = np.clip(np.asarray(outt["nerf"].rgb), 0, 1)
            pt_db = float(-10 * np.log10(
                max(float(np.mean((rgbt - gtt) ** 2)), 1e-10)))
            engaged = ext.params.n_importance > 0
            extras[f"thin_scene_default_psnr_seed{seed}_db"] = round(pt_db, 2)
            extras[f"thin_scene_auto_engaged_seed{seed}"] = engaged
            print(f"thin-scene DEFAULT preset seed{seed} @2100: "
                  f"{pt_db:.2f} dB (auto recovery "
                  f"{'engaged' if engaged else 'not engaged'})",
                  file=sys.stderr)
        extras["thin_scene_wall_s"] = round(time.perf_counter() - t0, 1)
    except Exception as e:
        print(f"thin-scene bench failed: {e}", file=sys.stderr)

    extras["bench_wall_clock_s"] = round(time.perf_counter() - t_bench0, 1)
    target = 5e6  # rays/s on v5e-8 (BASELINE.json); this value is 1 chip
    print(json.dumps({
        "metric": "hashnerf_t19_train_rays_per_sec_single_chip",
        "value": round(rays_per_sec),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / target, 6),
        "extras": extras,
    }))


if __name__ == "__main__":
    main()

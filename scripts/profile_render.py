"""Render-path profile at the flagship recipe: stage timing + budget/chunk
variants on a trained 800px model (checkpoint-cached so iteration is cheap).

Usage: PYTHONPATH=.:scripts python scripts/profile_render.py [stages|variants]
"""
import sys
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from nerfpp_tpu.config import TrainParams, hashnerf_blocked_preset
from nerfpp_tpu.executor import NeRFExecutor
from nerfpp_tpu.utils import checkpoint as ckpt_utils
from quality_tile_budget import load_scene

CKPT = Path("/tmp/rprof_ckpt")


def trained_executor(scene):
    p = hashnerf_blocked_preset(n_importance=0, use_occupancy_grid=True,
                                occ_update_every=32)
    tp = TrainParams(n_samples=64, n_rand=4096, n_iters=4000, chunk=4096,
                     i_print=0, i_weights=0, i_testset=0, i_img=0,
                     base_dir="/tmp/rprof", steps_per_call=100)
    ex = NeRFExecutor(p)
    ex.white_bkgr = scene.white_bkgr
    ex.initialize(scene.bounding_box, tp.lrate_decay, seed=0)
    restored = ckpt_utils.restore_latest(CKPT, ex.state)
    if restored is not None:
        ex.state = jax.tree.map(jnp.asarray, restored)
        print("checkpoint restored", flush=True)
    else:
        t0 = time.perf_counter()
        ex.train(scene, tp)
        print(f"trained 4000 steps in {time.perf_counter() - t0:.0f}s",
              flush=True)
        ckpt_utils.save(CKPT, ex.state, int(ex.state["step"]))
    return ex, tp


def sync(x):
    jax.tree.map(lambda a: np.asarray(a) if hasattr(a, "shape") else a, x)


def time_call(fn, *a, reps=3, **kw):
    out = fn(*a, **kw)
    sync(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*a, **kw)
        sync(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "variants"
    scene = load_scene()
    v = scene.views[list(scene.split_indices("test"))[0]]
    gt = scene.images[v.id]
    ex, tp = trained_executor(scene)

    def run(tag, frac, sparse, n_s, ch, thin=False, pb=32):
        ex.params.render_dense_frac = frac
        ex.params.render_sparse_samples = sparse
        ex.params.render_prior_bins = pb
        ex._render_cache = {}
        tpr = TrainParams(n_samples=n_s, n_rand=4096, chunk=ch)
        ex.params.thin_ray = thin
        best, out = time_call(
            lambda: ex.render_view(v.pose, v.h, v.w, v.k, tpr), reps=3)
        rgb = np.clip(np.asarray(out["nerf"].rgb), 0, 1)
        psnr = float(-10 * np.log10(max(float(np.mean((rgb - gt) ** 2)),
                                        1e-10)))
        print(f"{tag}: {v.h * v.w / best / 1e6:.3f} Mpix/s | {psnr:.2f} dB "
              f"| {best * 1e3:.0f} ms", flush=True)

    if mode == "full":
        # time the CACHED render_view jit with scalar-only sync (no 7 MB rgb
        # transfer): isolates device compute from the tunnel D2H cost
        ex.params.render_dense_frac = 0.25
        ex.params.render_sparse_samples = 8
        ex._render_cache = {}
        tpr = TrainParams(n_samples=64, n_rand=4096, chunk=65536)
        out = ex.render_view(v.pose, v.h, v.w, v.k, tpr)
        np.asarray(out["nerf"].rgb)
        for _ in range(3):
            t0 = time.perf_counter()
            out = ex.render_view(v.pose, v.h, v.w, v.k, tpr)
            np.asarray(out["nerf"].acc[0, 0])   # scalar sync
            t1 = time.perf_counter()
            np.asarray(out["nerf"].rgb)
            t2 = time.perf_counter()
            print(f"device+dispatch {1e3*(t1-t0):.0f} ms | rgb transfer "
                  f"{1e3*(t2-t1):.0f} ms", flush=True)
        return

    if mode == "bench8":
        # EXACT bench semantics: sync only the device-quantized uint8 image
        # (the PNG artifact), not the f32 maps — the tunnel D2H is ~60 MB/s,
        # so "variants" (full-output sync) overstates frame time by ~400 ms
        def run8(tag, frac, sparse, n_s, ch, pb=32):
            ex.params.render_dense_frac = frac
            ex.params.render_sparse_samples = sparse
            ex.params.render_prior_bins = pb
            ex._render_cache = {}
            tpr = TrainParams(n_samples=n_s, n_rand=4096, chunk=ch)
            out = ex.render_view(v.pose, v.h, v.w, v.k, tpr)
            np.asarray(out["rgb8"])
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                out = ex.render_view(v.pose, v.h, v.w, v.k, tpr)
                rgb8 = np.asarray(out["rgb8"])
                best = min(best, time.perf_counter() - t0)
            rgb = rgb8.astype(np.float32) / 255.0
            psnr = float(-10 * np.log10(max(float(np.mean((rgb - gt) ** 2)),
                                            1e-10)))
            print(f"{tag}: {v.h * v.w / best / 1e6:.3f} Mpix/s | "
                  f"{psnr:.2f} dB | {best * 1e3:.0f} ms", flush=True)
        if len(sys.argv) > 2 and sys.argv[2] == "aggressive":
            run8("b20_sp4_ns32_pb32", 0.20, 4, 32, 65536)
            run8("b15_sp4_ns64_pb32", 0.15, 4, 64, 65536)
            run8("b20_sp2_ns64_pb32", 0.20, 2, 64, 65536)
            run8("b20_sp4_ns48_pb32", 0.20, 4, 48, 65536)
            return
        if len(sys.argv) > 2 and sys.argv[2] == "final":
            run8("b20_sp2_ns32_pb32", 0.20, 2, 32, 65536)
            run8("b25_sp2_ns64_pb32", 0.25, 2, 64, 65536)
            return
        run8("b25_sp4_ns64_pb32 (bench default)", 0.25, 4, 64, 65536)
        run8("b25_sp4_ns32_pb32 (bench fast)", 0.25, 4, 32, 65536)
        run8("b25_sp8_ns64_pb32", 0.25, 8, 64, 65536)
        run8("b20_sp4_ns64_pb32", 0.20, 4, 64, 65536)
        run8("b25_sp4_ns48_pb32", 0.25, 4, 48, 65536)
        return

    if mode == "variants":
        run("b25_sp4_ns64_pb-64 (no narrow)", 0.25, 4, 64, 65536, pb=-64)
        run("b25_sp4_ns64_pb32", 0.25, 4, 64, 65536, pb=32)
        run("b25_sp4_ns64_pb64", 0.25, 4, 64, 65536, pb=64)
        run("b25_sp4_ns32_pb32 (fast)", 0.25, 4, 32, 65536, pb=32)
        run("b25_sp4_ns32_pb-64 (fast ctl)", 0.25, 4, 32, 65536, pb=-64)
        return

    # ---- stage timing: replicate render_image's internals -----------------
    # Each stage runs REPS times inside one jit (scan) and returns only a
    # scalar checksum: the tunnel's D2H path costs ~30 ms latency + ~60 MB/s,
    # so syncing real stage outputs would measure the transfer, not the stage.
    import dataclasses

    from nerfpp_tpu.core import rays as ray_math
    from nerfpp_tpu.core import sampling as S
    from nerfpp_tpu.core.occupancy import ray_bin_densities, tiled_prior

    REPS = 8

    def timed_scan(tag, fn, *args):
        """fn(*args, salt) -> scalar; scanned REPS times inside one jit."""
        @jax.jit
        def loop(*a):
            def body(c, i):
                return c + fn(*a, 1e-6 * i.astype(jnp.float32)), None
            return jax.lax.scan(body, 0.0, jnp.arange(REPS))[0]
        t, _ = time_call(loop, *args, reps=3)
        print(f"{tag}: {(t / REPS) * 1e3:.1f} ms", flush=True)

    cfg = ex.make_render_config(
        TrainParams(n_samples=64, n_rand=4096, chunk=65536), train=False)
    print("cfg:", cfg, flush=True)
    params = ex.state["params"]
    occ = ex.state.get("occupancy")
    bbox = jnp.asarray(ex.bounding_box)
    h, w = v.h, v.w
    th, tw = 8, 16
    hp, wp = -(-h // th) * th, -(-w // tw) * tw
    k = jnp.asarray(v.k)
    pose = jnp.asarray(v.pose)

    n = hp * wp
    tile, n_tiles = 128, n // 128
    k_dense = int(round(0.25 * n_tiles))
    sub_r, sub_b = 16, 16
    stride = tile // sub_r

    def flat(x):
        c = x.shape[-1]
        return (x.reshape(hp // th, th, wp // tw, tw, c)
                .transpose(0, 2, 1, 3, 4).reshape(-1, c))

    def rays_fn(pose):
        rays_o, rays_d, cone = ray_math.get_rays(hp, wp, k, pose)
        vd = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
        rays_o, rays_d, vd = flat(rays_o), flat(rays_d), flat(vd)
        near, far = ray_math.intersect_aabb(rays_o, rays_d, bbox)
        return rays_o, rays_d, vd, near, far

    timed_scan("rays+aabb", lambda pose, s: jnp.sum(rays_fn(pose + s)[3]),
               pose)
    rays_o, rays_d, vd, near, far = jax.jit(rays_fn)(pose)

    def probe_fn(rays_o, rays_d, near, far):
        near_t = near.reshape(n_tiles, tile).min(axis=1)
        far_t = far.reshape(n_tiles, tile).max(axis=1)
        sidx = (jnp.arange(n_tiles)[:, None] * tile
                + jnp.arange(0, tile, stride)[None, :]).reshape(-1)
        edges_c, d_c = ray_bin_densities(
            occ, rays_o[sidx], rays_d[sidx],
            jnp.repeat(near_t, sub_r)[:, None],
            jnp.repeat(far_t, sub_r)[:, None], bbox, sub_b)
        mass = d_c.reshape(n_tiles, sub_r, sub_b).sum(axis=(1, 2))
        return jnp.argsort(-mass), edges_c, d_c

    timed_scan("probe+rank",
               lambda ro, rd, nr, fr, s:
               jnp.sum(probe_fn(ro + s, rd, nr, fr)[0].astype(jnp.float32)),
               rays_o, rays_d, near, far)
    order, edges_c, d_c = jax.jit(probe_fn)(rays_o, rays_d, near, far)
    dtiles = order[:k_dense]

    def prior_fn(dtiles, rays_o, rays_d, near, far):
        dray = (dtiles[:, None] * tile + jnp.arange(tile)).reshape(-1)
        edges_d, w_d, _ = tiled_prior(
            occ, rays_o[dray], rays_d[dray], near[dray][:, None],
            far[dray][:, None], bbox, cfg.n_occ_bins,
            cfg.occ_uniform_frac, tile)
        z_t = S.sample_pdf(edges_d, w_d, 64, det=True,
                           key=jax.random.PRNGKey(0))
        return dray, jnp.repeat(z_t, tile, axis=0)

    timed_scan("dense prior+pdf",
               lambda dt, ro, rd, nr, fr, s:
               jnp.sum(prior_fn(dt, ro + s, rd, nr, fr)[1]),
               dtiles, rays_o, rays_d, near, far)
    dray, z_d = jax.jit(prior_fn)(dtiles, rays_o, rays_d, near, far)

    from nerfpp_tpu.render.renderer import (make_nerf_integrate_fn,
                                            render_rays)

    nerf_fn = ex._nerf_fns()
    int_fn = make_nerf_integrate_fn(cfg)

    def class_render(tag, ridx, z_all, n_s, ch, reps=2):
        m = ridx.shape[0]
        n_ch = -(-m // ch)
        pad = n_ch * ch - m
        ccfg = dataclasses.replace(cfg, n_samples=n_s)

        def go(ridx, z_all, salt):
            def pad0(x):
                return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))
            ro, rd, vdi = rays_o[ridx] + salt, rays_d[ridx], vd[ridx]
            nr, fr = near[ridx][:, None], far[ridx][:, None]
            args = jax.tree.map(
                lambda x: pad0(x).reshape(n_ch, ch, *x.shape[1:]),
                (ro, rd, nr, fr, vdi, z_all))

            def chunk(a):
                ro_c, rd_c, nr_c, fr_c, vd_c, z_c = a
                res = render_rays(params, nerf_fn, int_fn, ro_c, rd_c,
                                  nr_c, fr_c, vd_c, None,
                                  jax.random.PRNGKey(0), ccfg,
                                  bounding_box=bbox, occ_bins=z_c)
                return jnp.sum(res.outputs.rgb)
            return jnp.sum(jax.lax.map(chunk, args))

        @jax.jit
        def loop(ridx, z_all):
            def body(c, i):
                return c + go(ridx, z_all, 1e-6 * i.astype(jnp.float32)), None
            return jax.lax.scan(body, 0.0, jnp.arange(reps))[0]

        t, _ = time_call(loop, ridx, z_all, reps=3)
        t = t / reps
        pts = m * n_s
        print(f"  class render {m} rays x {n_s}: {t*1e3:.0f} ms "
              f"({pts/1e6:.1f}M pts, {pts/t/1e6:.1f} M pts/s, "
              f"{n_ch} chunks of {ch})", flush=True)
        return t

    # encode-only on the dense class's exact points (isolates the kernel)
    from nerfpp_tpu.pallas import hash_encode_blocked as HB
    emb = ex.embedder

    def encode_only(z_all, salt):
        pts = rays_o[dray][:, None, :] + rays_d[dray][:, None, :] \
            * (z_all + salt)[..., None]
        flatp = pts.transpose(1, 0, 2).reshape(-1, 3)
        flatp = jnp.clip(flatp, bbox[:3], bbox[3:])
        return jnp.sum(HB.hash_encode_blocked(
            ex.state["params"]["embed"]["table"], flatp, emb))

    timed_scan("dense encode-only", encode_only, z_d)

    t_d = class_render("dense", dray, z_d, 64, 65536)

    stiles = order[k_dense:]

    def sparse_prior_fn(stiles):
        sray = (stiles[:, None] * tile + jnp.arange(tile)).reshape(-1)
        d_t = d_c.reshape(n_tiles, sub_r, sub_b).mean(axis=1)[stiles]
        pdf_s = d_t / jnp.maximum(d_t.sum(-1, keepdims=True), 1e-8)
        w_s = (1.0 - cfg.occ_uniform_frac) * pdf_s \
            + cfg.occ_uniform_frac / sub_b
        edges_s = edges_c.reshape(n_tiles, sub_r, -1)[:, 0, :][stiles]
        z_t = S.sample_pdf(edges_s, w_s, 8, det=True,
                           key=jax.random.PRNGKey(1))
        return sray, jnp.repeat(z_t, tile, axis=0)

    timed_scan("sparse prior+pdf",
               lambda st, s: jnp.sum(sparse_prior_fn(st)[1]) + 0.0 * s,
               stiles)
    sray, z_s = jax.jit(sparse_prior_fn)(stiles)
    t_s = class_render("sparse", sray, z_s, 8, 65536)
    print(f"dense {t_d*1e3:.0f} + sparse {t_s*1e3:.0f} ms", flush=True)


if __name__ == "__main__":
    main()

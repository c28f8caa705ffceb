"""LeRF diagnosis stage 1: train exactly as bench.py does, then localize the
defect — train-view vs held-out-view relevancy AUC, LeRF acc/weights at blue
vs background pixels, cosine of rendered embedding vs the supervision target.

Stage 0 (lerf_diagnose.py) showed the supervision map itself has AUC 0.79-1.0
so the query/metric/pyramid are fine; the problem is training or rendering.
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from nerfpp_tpu.config import TrainParams, hashnerf_preset
from nerfpp_tpu.data.pyramid_clip import (PyramidEmbedder,
                                          PyramidEmbedderProperties,
                                          RandomProjectionPatchEncoder,
                                          make_device_pyramid)
from nerfpp_tpu.data.synthetic import make_synthetic_scene
from nerfpp_tpu.executor import NeRFExecutor


def rank_auc(rel, mask):
    from scipy.stats import rankdata
    r = rel.ravel()
    m = mask.ravel()
    ranks = rankdata(r, method="average")
    n_pos, n_neg = int(m.sum()), int((~m).sum())
    return float((ranks[m].sum() - n_pos * (n_pos + 1) / 2.0)
                 / max(n_pos * n_neg, 1))


def main():
    scene_l = make_synthetic_scene(n_train=8, n_val=1, n_test=1,
                                   image_hw=128, white_bkgr=False,
                                   n_samples=64)
    enc = RandomProjectionPatchEncoder(embed_dim=24, input_size=8)
    props = PyramidEmbedderProperties(img_size=16, overlap=0.5, max_zoom_out=1)
    tr_idx = list(scene_l.split_indices("train"))
    emb = PyramidEmbedder(enc, props)(scene_l.images[tr_idx])
    dev_pyr = make_device_pyramid(emb, scale=0.5)

    blue = np.array([0.2, 0.5, 0.9], np.float32)
    red = np.array([0.9, 0.25, 0.2], np.float32)

    def patch(c):
        return np.broadcast_to(c, (1, 16, 16, 3)).astype(np.float32)

    # sweep winner (scripts/lerf_sweep.py): hierarchical 32+16 per-ray CDF —
    # 23.2/26.1 dB across seeds where 32-uniform (the r4 bench config)
    # collapses to 12.3/13.6 and occ32+imp16 collapses on THIS scene (12.0);
    # the importance pass is also what gives the LeRF branch's own density
    # its feedback loop (accLE was 0 under uniform sampling)
    pl = hashnerf_preset(
        n_importance=16, hier_ray_tile=0, hier_tile_budget_frac=0.0,
        log2_hashmap_size=14, n_levels=8,
        finest_resolution=128, use_lerf=True, lang_embed_dim=24,
        n_levels_le=4, log2_hashmap_size_le=12, finest_resolution_le=64)
    tpl = TrainParams(n_samples=32, n_rand=2048, n_iters=1001,
                      chunk=2048, i_print=0, i_weights=0, i_testset=0,
                      i_img=0, base_dir="/tmp/nerfpp_diag_lerf",
                      steps_per_call=50)
    exl = NeRFExecutor(pl)
    exl.white_bkgr = scene_l.white_bkgr
    exl.initialize(scene_l.bounding_box, tpl.lrate_decay, seed=0)
    exl.lerf_positives = jnp.asarray(enc(patch(blue)))
    exl.lerf_negatives = jnp.asarray(np.concatenate(
        [enc(patch(red)), enc(patch(np.zeros(3, np.float32)))]))
    t0 = time.perf_counter()
    ml = exl.train(scene_l, tpl, lang_embeddings=dev_pyr)
    print(f"trained 1001 steps in {time.perf_counter()-t0:.0f}s "
          f"lang_loss={float(ml['lang_loss']):.4f}", file=sys.stderr)

    pos = np.asarray(exl.lerf_positives)

    for name, vid in (("train0", tr_idx[0]),
                      ("heldout", list(scene_l.split_indices("test"))[0])):
        v = scene_l.views[vid]
        out = exl.render_view(v.pose, v.h, v.w, v.k, tpl)
        lr = out["lerf"]
        rel = np.asarray(lr.relevancy)[..., 0]
        rendered = np.asarray(lr.rendered_lang_embedding)
        acc = np.asarray(lr.acc)
        gt = scene_l.images[vid]
        mask = np.linalg.norm(gt - blue, axis=-1) < 0.25
        maskr = np.linalg.norm(gt - red, axis=-1) < 0.25
        bg = ~(mask | maskr)
        auc = rank_auc(rel, mask)
        cos = rendered @ pos[0]
        # supervision target comparison only valid for train views
        sup_line = ""
        if name == "train0":
            sup = emb.dense_pixel_embeddings(0, scale=0.5)
            cos_sup = (rendered * sup).sum(-1)
            sup_line = (f" cos(rend,sup)@blue={cos_sup[mask].mean():.3f}"
                        f" @bg={cos_sup[bg].mean():.3f}")
        print(f"{name}: AUC={auc:.3f} nblue={int(mask.sum())} "
              f"rel@blue={rel[mask].mean():.3f} rel@red={rel[maskr].mean():.3f} "
              f"rel@bg={rel[bg].mean():.3f} | accLE@blue={acc[mask].mean():.3f} "
              f"accLE@bg={acc[bg].mean():.3f} | cos@blue={cos[mask].mean():.3f} "
              f"cos@red={cos[maskr].mean():.3f} cos@bg={cos[bg].mean():.3f}"
              + sup_line)
        # raw norm of the composited (pre-normalize can't be recovered, so
        # use acc as the proxy for how real the embedding is)

    # also: NeRF branch sanity on held-out (did the rgb field train?)
    vid = list(scene_l.split_indices("test"))[0]
    v = scene_l.views[vid]
    out = exl.render_view(v.pose, v.h, v.w, v.k, tpl)
    rgb = np.clip(np.asarray(out["nerf"].rgb), 0, 1)
    gt = scene_l.images[vid]
    psnr = -10 * np.log10(max(float(np.mean((rgb - gt) ** 2)), 1e-10))
    print(f"nerf heldout PSNR: {psnr:.2f} dB")


if __name__ == "__main__":
    main()

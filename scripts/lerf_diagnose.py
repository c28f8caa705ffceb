"""Diagnose the below-chance LeRF relevancy AUC (VERDICT r4 weak #1).

Stage 0 (no training, no TPU): compute the supervision pyramid exactly as
bench.py does, take the dense per-pixel supervision embedding map of a view
(= the best field the LeRF could ever learn), score it with the bench's
query/negatives/relevancy, and compute the same rank-AUC vs the GT mask.

If THIS AUC is low, the query construction or the metric is broken and no
amount of training can pass the bench. If it is high, the defect is in
training/rendering (field capacity, density coupling, normalization of
near-zero embeddings at background pixels).
"""
from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")

from nerfpp_tpu.data.pyramid_clip import (PyramidEmbedder,
                                          PyramidEmbedderProperties,
                                          RandomProjectionPatchEncoder)
from nerfpp_tpu.data.synthetic import make_synthetic_scene


def rank_auc(rel, mask):
    from scipy.stats import rankdata
    r = rel.ravel()
    m = mask.ravel()
    ranks = rankdata(r, method="average")
    n_pos, n_neg = int(m.sum()), int((~m).sum())
    return float((ranks[m].sum() - n_pos * (n_pos + 1) / 2.0)
                 / max(n_pos * n_neg, 1))


def relevancy_np(e, pos, neg, temperature=0.1):
    ps = e @ pos.T / temperature
    ns = e @ neg.T / temperature
    pair = 1.0 / (1.0 + np.exp(-(ps[..., :, None] - ns[..., None, :])))
    return pair.min(-1)


def main():
    scene = make_synthetic_scene(n_train=8, n_val=1, n_test=1, image_hw=128,
                                 white_bkgr=False, n_samples=64)
    enc = RandomProjectionPatchEncoder(embed_dim=24, input_size=8)
    props = PyramidEmbedderProperties(img_size=16, overlap=0.5, max_zoom_out=1)
    tr_idx = list(scene.split_indices("train"))
    emb = PyramidEmbedder(enc, props)(scene.images[tr_idx])

    blue = np.array([0.2, 0.5, 0.9], np.float32)
    red = np.array([0.9, 0.25, 0.2], np.float32)

    def patch(c):
        return np.broadcast_to(c, (1, 16, 16, 3)).astype(np.float32)

    pos = enc(patch(blue))
    negs = np.concatenate([enc(patch(red)), enc(patch(np.zeros(3, np.float32)))])
    print(f"query |pos|={np.linalg.norm(pos):.3f} "
          f"|neg0|={np.linalg.norm(negs[0]):.3f} "
          f"|neg1(black)|={np.linalg.norm(negs[1]):.3f}")
    print(f"pos.neg0={float(pos @ negs[0]):.3f} pos.neg1={float(pos @ negs[1]):.3f}")

    # per-train-view: supervision map AUC (the field's own ceiling)
    for vi in range(3):
        sup = emb.dense_pixel_embeddings(vi, scale=0.5)      # [H, W, E]
        gt = scene.images[tr_idx[vi]]
        mask = np.linalg.norm(gt - blue, axis=-1) < 0.25
        if mask.sum() == 0:
            print(f"view {vi}: no blue pixels")
            continue
        rel = relevancy_np(sup, pos, negs)[..., 0]
        auc = rank_auc(rel, mask)
        # also raw cosine-to-positive AUC (is the problem the softmax pairing?)
        cos = sup @ pos[0]
        auc_cos = rank_auc(cos, mask)
        # and: mean cosine at blue vs red vs background pixels
        maskr = np.linalg.norm(gt - red, axis=-1) < 0.25
        bg = ~(mask | maskr)
        print(f"view {vi}: sup-map AUC={auc:.3f} cos-AUC={auc_cos:.3f} "
              f"cos@blue={cos[mask].mean():.3f} cos@red={cos[maskr].mean() if maskr.sum() else float('nan'):.3f} "
              f"cos@bg={cos[bg].mean():.3f} |sup|@bg={np.linalg.norm(sup, axis=-1)[bg].mean():.3f} "
              f"rel@blue={rel[mask].mean():.3f} rel@bg={rel[bg].mean():.3f}")


if __name__ == "__main__":
    main()

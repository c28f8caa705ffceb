"""Debug visualizations for the LeRF pipeline.

Equivalent of the reference's ``InitializeTestLeRF`` eyeball-test
(NeRFExecutor.h:773-837): render a relevancy heatmap of a training image
directly from the CLIP pyramid — bypassing the radiance field — to validate
prompts and pyramid embeddings before/without training. The reference loops
pixels under OpenMP and shows cv::imshow windows; here the lookup is the dense
vectorized pyramid map and the output is a PNG.
"""
from __future__ import annotations

from pathlib import Path

import numpy as np

from nerfpp_tpu.render.lerf import relevancy


def pyramid_relevancy_image(pyramid, img_idx: int, positives: np.ndarray,
                            negatives: np.ndarray, scale: float = 0.5
                            ) -> np.ndarray:
    """[H, W] relevancy of every pixel's pyramid embedding vs the prompts."""
    import jax.numpy as jnp
    dense = pyramid.dense_pixel_embeddings(img_idx, scale)     # [H, W, E]
    rel = relevancy(jnp.asarray(dense), jnp.asarray(positives),
                    jnp.asarray(negatives))
    return np.asarray(rel[..., 0])


def save_relevancy_heatmap(pyramid, img_idx: int, positives, negatives,
                           out_path, image: np.ndarray | None = None,
                           scale: float = 0.5) -> np.ndarray:
    """Write a JET-colormapped relevancy heatmap (optionally blended over the
    source image, like the reference's overlay at NeRFExecutor.h:812-830)."""
    import cv2
    rel = pyramid_relevancy_image(pyramid, img_idx, positives, negatives, scale)
    rel8 = (np.clip(rel, 0, 1) * 255).astype(np.uint8)
    heat = cv2.applyColorMap(rel8, cv2.COLORMAP_JET)
    if image is not None:
        base = (np.clip(image, 0, 1) * 255).astype(np.uint8)[..., ::-1]
        heat = cv2.addWeighted(base, 0.5, heat, 0.5, 0.0)
    Path(out_path).parent.mkdir(parents=True, exist_ok=True)
    cv2.imwrite(str(out_path), heat)
    return rel

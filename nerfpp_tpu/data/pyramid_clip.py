"""Multi-scale CLIP feature pyramid for LeRF supervision.

Re-designs the reference ``PyramidEmbedder``/``PyramidEmbedding``
(PyramidEmbedder.{h,cpp}):

- Every training image is covered by overlapping square windows at zoom levels
  -1..max_zoom_out (window side = clip_size * 2^zoom, stride = side *
  (1 - overlap); grid counts nw/nh as in GetNextSample,
  PyramidEmbedder.cpp:372-453). Each window is resized to the CLIP input size,
  encoded, L2-normalized.
- Per-pixel supervision embedding = trilinear interpolation: bilinear over the
  nearest patch *centers* at each of the two zoom levels bracketing the query
  scale, then linear in log2(scale) across the zoom pair (GetPixelValue /
  GetNearestPatchIndicesMultiScale / Interpolate, cpp:4-310).
- The reference looks pixels up one at a time on the CPU under OpenMP
  (NeRFDataset.cpp:182-194) — the known hot spot. Here the pyramid is stored
  as dense [nh, nw, E] grids and ``dense_pixel_embeddings`` produces the full
  [H, W, E] supervision map per image in one vectorized pass, computed once
  and kept on device for the sampler to gather from (data/dataset.py).
- On-disk cache (.npz) mirrors the pyramid_embeddings.pt cache
  (NeRFDataset.cpp:67-105, PyramidEmbedder.cpp:199-223).

The image/text encoder is pluggable: any callable mapping a [N, S, S, 3]
float batch to [N, E] embeddings. ``RandomProjectionPatchEncoder`` is a
deterministic dependency-free stand-in (tests, benchmarks, environments
without CLIP weights); ``load_clip_encoder`` wraps a local HuggingFace CLIP
checkpoint when one is available (RuCLIP itself is a sibling-repo external in
the reference, absent from the snapshot — SURVEY.md caveats).
"""
from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Callable, Dict, List, Tuple

import numpy as np


@dataclasses.dataclass
class PyramidEmbedderProperties:
    """Mirrors PyramidEmbedderProperties (PyramidEmbedder.h:21-27)."""
    img_size: int = 224          # CLIP input size
    overlap: float = 0.75        # window overlap fraction
    max_zoom_out: int = 1        # largest zoom level
    min_zoom_out: int = -1       # smallest (zoom -1 = half-size windows)

    def zooms_for(self, h: int, w: int) -> List[int]:
        n = int(min(np.log2(w / self.img_size), np.log2(h / self.img_size)))
        top = min(n, self.max_zoom_out)
        return list(range(self.min_zoom_out, top + 1))

    def grid(self, h: int, w: int, zoom: int) -> Tuple[int, int, float, float]:
        """(nh, nw, window, stride) for one zoom level (cpp:388-390)."""
        win = self.img_size * (2.0 ** zoom)
        stride = win * (1.0 - self.overlap)
        nw = int((w - win * self.overlap) / stride)
        nh = int((h - win * self.overlap) / stride)
        return max(nh, 1), max(nw, 1), win, stride


class PyramidEmbedding:
    """Dense pyramid store: {(img_idx, zoom): [nh, nw, E]}."""

    def __init__(self, props: PyramidEmbedderProperties,
                 image_sizes: List[Tuple[int, int]]):
        self.props = props
        self.image_sizes = list(image_sizes)
        self.grids: Dict[Tuple[int, int], np.ndarray] = {}

    # ------------------------------------------------------------- lookup

    def _level_lookup(self, img_idx: int, zoom: int, xs: np.ndarray,
                      ys: np.ndarray) -> np.ndarray:
        """Bilinear interpolation over patch centers at one zoom level."""
        h, w = self.image_sizes[img_idx]
        nh, nw, win, stride = self.props.grid(h, w, zoom)
        g = self.grids[(img_idx, zoom)]            # [nh, nw, E]
        # patch center of grid index i is at i*stride + win/2
        fx = (xs - win / 2.0) / stride
        fy = (ys - win / 2.0) / stride
        x0 = np.clip(np.floor(fx).astype(np.int64), 0, nw - 1)
        x1 = np.clip(x0 + 1, 0, nw - 1)
        y0 = np.clip(np.floor(fy).astype(np.int64), 0, nh - 1)
        y1 = np.clip(y0 + 1, 0, nh - 1)
        tx = np.clip(fx - x0, 0.0, 1.0)[..., None]
        ty = np.clip(fy - y0, 0.0, 1.0)[..., None]
        e00 = g[y0, x0]
        e01 = g[y0, x1]
        e10 = g[y1, x0]
        e11 = g[y1, x1]
        top = e00 * (1 - tx) + e01 * tx
        bot = e10 * (1 - tx) + e11 * tx
        return top * (1 - ty) + bot * ty

    def get_pixel_values(self, img_idx: int, xs: np.ndarray, ys: np.ndarray,
                         scale: float) -> np.ndarray:
        """Trilinear (x, y, zoom) supervision embeddings for pixel coords.

        Mirrors GetPixelValue (PyramidEmbedder.cpp:230-310): the two zoom
        levels bracketing log2(scale), bilinear within each, linear across.
        """
        h, w = self.image_sizes[img_idx]
        zooms = self.props.zooms_for(h, w)
        zlo, zhi = zooms[0], zooms[-1]
        logs = np.log2(max(scale, 2.0 ** zlo))
        z1 = int(np.clip(np.floor(logs), zlo, zhi))
        z2 = int(np.clip(z1 + 1, zlo, zhi))
        e1 = self._level_lookup(img_idx, z1, xs, ys)
        if z2 == z1:
            out = e1
        else:
            e2 = self._level_lookup(img_idx, z2, xs, ys)
            t = np.clip(logs - z1, 0.0, 1.0)
            out = e1 * (1 - t) + e2 * t
        norm = np.linalg.norm(out, axis=-1, keepdims=True)
        return out / np.maximum(norm, 1e-8)

    def dense_pixel_embeddings(self, img_idx: int, scale: float = 0.5
                               ) -> np.ndarray:
        """[H, W, E] supervision map for a whole image in one vectorized pass
        — replaces the per-pixel OpenMP loop (NeRFDataset.cpp:182-194).
        scale=0.5 matches the training-time lookup (NeRFDataset.cpp:186)."""
        h, w = self.image_sizes[img_idx]
        ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
        return self.get_pixel_values(img_idx, xs, ys, scale).astype(np.float32)

    # -------------------------------------------------------------- cache

    def save(self, path) -> None:
        arrays = {f"{i}_{z}": g for (i, z), g in self.grids.items()}
        np.savez_compressed(
            path, __sizes__=np.asarray(self.image_sizes),
            __props__=np.asarray([self.props.img_size, self.props.overlap,
                                  self.props.max_zoom_out,
                                  self.props.min_zoom_out], np.float64),
            **arrays)

    @classmethod
    def load(cls, path) -> "PyramidEmbedding":
        data = np.load(path)
        pr = data["__props__"]
        props = PyramidEmbedderProperties(
            img_size=int(pr[0]), overlap=float(pr[1]),
            max_zoom_out=int(pr[2]), min_zoom_out=int(pr[3]))
        sizes = [tuple(s) for s in data["__sizes__"]]
        emb = cls(props, sizes)
        for k in data.files:
            if k.startswith("__"):
                continue
            i, z = k.split("_")
            emb.grids[(int(i), int(z))] = data[k]
        return emb


class PyramidEmbedder:
    """Computes a PyramidEmbedding from images + an image-encoder callable
    (operator(), PyramidEmbedder.cpp:341-367)."""

    def __init__(self, encoder: Callable[[np.ndarray], np.ndarray],
                 props: PyramidEmbedderProperties, batch_size: int = 64):
        self.encoder = encoder
        self.props = props
        self.batch_size = batch_size

    def __call__(self, images: np.ndarray) -> PyramidEmbedding:
        """images: [n, H, W, 3] float32 in [0, 1]."""
        import cv2
        n, h, w, _ = images.shape
        emb = PyramidEmbedding(self.props, [(h, w)] * n)
        s = self.props.img_size
        for img_idx in range(n):
            img = images[img_idx]
            for zoom in self.props.zooms_for(h, w):
                nh, nw, win, stride = self.props.grid(h, w, zoom)
                patches = []
                for iy in range(nh):
                    for ix in range(nw):
                        x0 = int(ix * stride)
                        y0 = int(iy * stride)
                        x1 = min(int(x0 + win), w)
                        y1 = min(int(y0 + win), h)
                        patch = img[y0:y1, x0:x1]
                        if patch.shape[:2] != (s, s):
                            patch = cv2.resize(patch, (s, s))
                        patches.append(patch)
                feats = []
                for i in range(0, len(patches), self.batch_size):
                    batch = np.stack(patches[i:i + self.batch_size])
                    f = np.asarray(self.encoder(batch))
                    feats.append(f)
                feats = np.concatenate(feats, axis=0)
                feats /= np.maximum(
                    np.linalg.norm(feats, axis=-1, keepdims=True), 1e-8)
                emb.grids[(img_idx, zoom)] = feats.reshape(nh, nw, -1) \
                    .astype(np.float32)
        return emb


def make_device_pyramid(emb: PyramidEmbedding, scale: float = 0.5):
    """Build a DevicePyramid for on-device per-step supervision lookup.

    The training-time lookup scale is a constant (0.5, NeRFDataset.cpp:186),
    so only the two zoom levels bracketing log2(scale) and their static blend
    factor are needed. Replaces the dense [n_train, H, W, E] supervision
    stack (~1.9 GB per 800px image at E=768) with the raw patch grids
    (~0.4 MB per image/zoom) gathered inside the jitted train step.
    """
    import jax.numpy as jnp

    from nerfpp_tpu.data.dataset import DevicePyramid

    sizes = set(emb.image_sizes)
    if len(sizes) != 1:
        raise ValueError("device pyramid requires uniform image sizes; "
                         f"got {sizes}")
    h, w = emb.image_sizes[0]
    n_imgs = len(emb.image_sizes)
    zooms = emb.props.zooms_for(h, w)
    zlo, zhi = zooms[0], zooms[-1]
    logs = float(np.log2(max(scale, 2.0 ** zlo)))
    z1 = int(np.clip(np.floor(logs), zlo, zhi))
    z2 = int(np.clip(z1 + 1, zlo, zhi))
    t = float(np.clip(logs - z1, 0.0, 1.0)) if z2 != z1 else 0.0

    grids, wins, strides = [], [], []
    for z in ([z1] if z2 == z1 else [z1, z2]):
        _, _, win, stride = emb.props.grid(h, w, z)
        g = np.stack([emb.grids[(i, z)] for i in range(n_imgs)])
        grids.append(jnp.asarray(g, jnp.float32))
        wins.append(float(win))
        strides.append(float(stride))
    return DevicePyramid(grids=tuple(grids), wins=tuple(wins),
                         strides=tuple(strides), t=t)


def compute_or_load_pyramid(images: np.ndarray, encoder,
                            props: PyramidEmbedderProperties,
                            cache_path) -> PyramidEmbedding:
    """Cache-or-compute, mirroring InitializePyramidClipEmbedding
    (NeRFDataset.cpp:67-105)."""
    cache_path = Path(cache_path)
    if cache_path.exists():
        return PyramidEmbedding.load(cache_path)
    emb = PyramidEmbedder(encoder, props)(images)
    cache_path.parent.mkdir(parents=True, exist_ok=True)
    emb.save(cache_path)
    return emb


class RandomProjectionPatchEncoder:
    """Deterministic stand-in image encoder: downsample -> fixed random
    projection -> L2 normalize. Same patch => same embedding, smoothly varying
    with content; lets the full LeRF path train and be tested without CLIP
    weights."""

    def __init__(self, embed_dim: int = 768, input_size: int = 32,
                 seed: int = 0):
        self.embed_dim = embed_dim
        self.input_size = input_size
        rng = np.random.RandomState(seed)
        self.proj = rng.randn(input_size * input_size * 3, embed_dim) \
            .astype(np.float32) / np.sqrt(input_size * input_size * 3)
        # affine term: real CLIP maps EVERY patch — including an all-black
        # one — to a unit-norm embedding. A pure linear projection sends
        # black patches to ~0, which a unit-normalized rendered embedding
        # can never fit (the LeRF lang loss plateaus ~0.45 on dark-
        # background scenes); the bias gives background its own consistent
        # unit direction, like CLIP's.
        self.bias = (rng.randn(embed_dim) * 0.3).astype(np.float32)

    def __call__(self, patches: np.ndarray) -> np.ndarray:
        import cv2
        s = self.input_size
        flat = np.stack([
            cv2.resize(p, (s, s)).reshape(-1) for p in patches])
        out = flat @ self.proj + self.bias
        return out / np.maximum(np.linalg.norm(out, axis=-1, keepdims=True),
                                1e-8)

    def encode_text(self, texts: List[str]) -> np.ndarray:
        """Hash-seeded deterministic text embeddings (stand-in)."""
        out = np.stack([
            np.random.RandomState(abs(hash(t)) % (2 ** 31)).randn(self.embed_dim)
            for t in texts]).astype(np.float32)
        return out / np.maximum(np.linalg.norm(out, axis=-1, keepdims=True),
                                1e-8)


def load_clip_encoder(model_path: str, device: str = "cpu"):
    """Wrap a local HuggingFace CLIP checkpoint into (image_encoder,
    text_encoder) callables with 768-d-compatible joint space.

    The reference loads RuCLIP from disk (NeRFExecutor.h:581-595); any CLIP
    with a joint image/text space works — prompts stay configurable.
    """
    import torch
    from transformers import CLIPModel, CLIPProcessor

    model = CLIPModel.from_pretrained(model_path).to(device).eval()
    processor = CLIPProcessor.from_pretrained(model_path)

    def encode_images(patches: np.ndarray) -> np.ndarray:
        with torch.no_grad():
            inputs = processor(
                images=[(p * 255).astype(np.uint8) for p in patches],
                return_tensors="pt").to(device)
            feats = model.get_image_features(**inputs)
        return feats.cpu().numpy()

    def encode_text(texts: List[str]) -> np.ndarray:
        with torch.no_grad():
            inputs = processor(text=texts, return_tensors="pt",
                               padding=True).to(device)
            feats = model.get_text_features(**inputs)
        return feats.cpu().numpy()

    return encode_images, encode_text

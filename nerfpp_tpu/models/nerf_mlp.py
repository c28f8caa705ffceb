"""Classic NeRF MLP (Mildenhall et al.) as a functional module.

Re-designs the reference ``NeRF`` module (NeRF.h:44-77, NeRF.cpp:41-126):
D=8 x W=256 trunk with skip-concat of the embedded input after layer 4, and
either the official-release viewdirs branch (feature linear -> concat dirs ->
W/2 -> rgb; separate alpha head off the trunk) or a plain output head with a
final input skip. Output channel order is [rgb(3), sigma(1)] with activations
deferred to raw2outputs.
"""
from __future__ import annotations

from typing import FrozenSet

import jax
import jax.numpy as jnp

from nerfpp_tpu import nn


class NeRFMLP:
    def __init__(self, depth: int = 8, width: int = 256, input_ch: int = 3,
                 input_ch_views: int = 3, output_ch: int = 4,
                 skips: FrozenSet[int] = frozenset({4}),
                 use_viewdirs: bool = False, init_gain: float = 0.1,
                 compute_dtype=None):
        self.depth = depth
        self.width = width
        self.input_ch = input_ch
        self.input_ch_views = input_ch_views
        self.output_ch = output_ch
        self.skips = frozenset(skips)
        self.use_viewdirs = use_viewdirs
        self.init_gain = init_gain
        self.compute_dtype = compute_dtype

    def init(self, key: jax.Array) -> dict:
        d, w, g = self.depth, self.width, self.init_gain
        keys = iter(jax.random.split(key, d + 4))
        pts_linears = [nn.dense_init(next(keys), self.input_ch, w, gain=g)]
        # Layer i+1 takes w (+input_ch if layer i is a skip layer), NeRF.cpp:52-57.
        for i in range(d - 1):
            in_dim = w + (self.input_ch if i in self.skips else 0)
            pts_linears.append(nn.dense_init(next(keys), in_dim, w, gain=g))
        params = {"pts_linears": pts_linears}
        if self.use_viewdirs:
            params["views_linears"] = [
                nn.dense_init(next(keys), self.input_ch_views + w, w // 2, gain=g)]
            params["feature_linear"] = nn.dense_init(next(keys), w, w, gain=g)
            params["alpha_linear"] = nn.dense_init(next(keys), w, 1, gain=g)
            params["rgb_linear"] = nn.dense_init(next(keys), w // 2, 3, gain=g)
        else:
            # Final input skip "for better convergence" (NeRF.cpp:73, 122).
            params["output_linear"] = nn.dense_init(
                next(keys), w + self.input_ch, self.output_ch, gain=g)
        return params

    def __call__(self, params: dict, x: jnp.ndarray) -> jnp.ndarray:
        """x: [N, input_ch + input_ch_views] embedded points (+ embedded dirs)."""
        input_pts = x[..., :self.input_ch]
        input_views = x[..., self.input_ch:self.input_ch + self.input_ch_views]

        cd = self.compute_dtype
        h = input_pts
        for i, layer in enumerate(params["pts_linears"]):
            h = jax.nn.relu(nn.dense(layer, h, cd))
            if i in self.skips:
                h = jnp.concatenate([input_pts, h.astype(input_pts.dtype)],
                                    axis=-1)

        if self.use_viewdirs:
            alpha = nn.dense(params["alpha_linear"], h, cd)
            feature = nn.dense(params["feature_linear"], h, cd)
            h = jnp.concatenate([feature,
                                 input_views.astype(feature.dtype)], axis=-1)
            for layer in params["views_linears"]:
                h = jax.nn.relu(nn.dense(layer, h, cd))
            rgb = nn.dense(params["rgb_linear"], h, cd)
            return jnp.concatenate([rgb, alpha], axis=-1)
        h = jnp.concatenate([h, input_pts.astype(h.dtype)], axis=-1)
        return nn.dense(params["output_linear"], h, cd)

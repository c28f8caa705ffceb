"""NeRFSmall — the compact instant-NGP-style field head for hash encodings.

Re-designs the reference ``NeRFSmall`` (NeRF.h:213-252, NeRF.cpp:322-412):
bias-free sigma net (hash features -> 1 + geo_feat_dim), bias-free color net
(dir features + geo feats -> 3), optional bias-free normals net
(sigma + geo feats + hash features -> 3). Final activations (sigmoid on rgb,
relu+exp on sigma) are deferred to raw2outputs. Output channel order:
[color(3), sigma(1), pred_normals(3)?].

All layers are bias-free matmuls — pure MXU work; widths of 64 pad to the
128-lane tile, so the whole head is a handful of fused GEMMs on TPU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from nerfpp_tpu import nn


class NeRFSmall:
    def __init__(self, num_layers: int = 3, hidden_dim: int = 64,
                 geo_feat_dim: int = 15, num_layers_color: int = 4,
                 hidden_dim_color: int = 64, use_pred_normal: bool = False,
                 num_layers_normals: int = 3, hidden_dim_normals: int = 64,
                 input_ch: int = 3, input_ch_views: int = 3,
                 compute_dtype=None, init_gain: float = 0.1):
        self.num_layers = num_layers
        self.hidden_dim = hidden_dim
        self.geo_feat_dim = geo_feat_dim
        self.num_layers_color = num_layers_color
        self.hidden_dim_color = hidden_dim_color
        self.use_pred_normal = use_pred_normal
        self.num_layers_normals = num_layers_normals
        self.hidden_dim_normals = hidden_dim_normals
        self.input_ch = input_ch
        self.input_ch_views = input_ch_views
        self.compute_dtype = compute_dtype
        self.init_gain = init_gain

    def _dims_sigma(self):
        return ([self.input_ch] + [self.hidden_dim] * (self.num_layers - 1)
                + [1 + self.geo_feat_dim])

    def _dims_color(self):
        return ([self.input_ch_views + self.geo_feat_dim]
                + [self.hidden_dim_color] * (self.num_layers_color - 1) + [3])

    def _dims_normals(self):
        return ([1 + self.geo_feat_dim + self.input_ch]
                + [self.hidden_dim_normals] * (self.num_layers_normals - 1) + [3])

    def init(self, key: jax.Array) -> dict:
        ks, kc, kn = jax.random.split(key, 3)
        g = self.init_gain
        params = {
            "sigma_net": nn.mlp_init(ks, self._dims_sigma(), use_bias=False, gain=g),
            "color_net": nn.mlp_init(kc, self._dims_color(), use_bias=False, gain=g),
        }
        if self.use_pred_normal:
            params["normals_net"] = nn.mlp_init(kn, self._dims_normals(),
                                                use_bias=False, gain=g)
        return params

    def __call__(self, params: dict, x: jnp.ndarray) -> jnp.ndarray:
        """x: [N, input_ch + input_ch_views] (hash features ++ dir features)."""
        input_pts = x[..., :self.input_ch]
        input_views = x[..., self.input_ch:self.input_ch + self.input_ch_views]

        h = nn.mlp(params["sigma_net"], input_pts, compute_dtype=self.compute_dtype)
        sigma = h[..., 0:1]
        geo_feat = h[..., 1:]

        h = jnp.concatenate([input_views, geo_feat], axis=-1)
        color = nn.mlp(params["color_net"], h, compute_dtype=self.compute_dtype)

        outs = [color, sigma]
        if self.use_pred_normal:
            h = jnp.concatenate([sigma, geo_feat, input_pts], axis=-1)
            outs.append(nn.mlp(params["normals_net"], h,
                               compute_dtype=self.compute_dtype))
        return jnp.concatenate(outs, axis=-1)

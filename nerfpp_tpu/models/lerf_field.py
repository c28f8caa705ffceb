"""LeRF field — an independent language-embedding radiance field.

Re-designs the reference ``LeRF`` module (LeRF.h:6-31, LeRF.cpp:3-110): a fully
independent grid head with its own density. Bias-free SigmaLENet
(hash-LE features -> 1 + geo_feat_dim_le), then bias-free LENet on
cat(geo_feat_le, hash-LE features) -> lang_embed_dim, L2-normalized (eps 1e-8).
Output channel order: [language_embedding(lang_embed_dim), sigma_le(1)].
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from nerfpp_tpu import nn


class LeRFField:
    def __init__(self, geo_feat_dim_le: int = 32, num_layers_le: int = 3,
                 hidden_dim_le: int = 64, lang_embed_dim: int = 768,
                 input_ch_le: int = 0, compute_dtype=None):
        self.geo_feat_dim_le = geo_feat_dim_le
        self.num_layers_le = num_layers_le
        self.hidden_dim_le = hidden_dim_le
        self.lang_embed_dim = lang_embed_dim
        self.input_ch_le = input_ch_le
        self.compute_dtype = compute_dtype

    def init(self, key: jax.Array) -> dict:
        ks, kl = jax.random.split(key)
        dims_sigma = ([self.input_ch_le]
                      + [self.hidden_dim_le] * (self.num_layers_le - 1)
                      + [1 + self.geo_feat_dim_le])
        dims_le = ([self.geo_feat_dim_le + self.input_ch_le]
                   + [self.hidden_dim_le] * (self.num_layers_le - 1)
                   + [self.lang_embed_dim])
        return {
            "sigma_le_net": nn.mlp_init(ks, dims_sigma, use_bias=False),
            "le_net": nn.mlp_init(kl, dims_le, use_bias=False),
        }

    def __call__(self, params: dict, x: jnp.ndarray) -> jnp.ndarray:
        """x: [N, input_ch_le] hash-LE features -> [N, lang_embed_dim + 1]."""
        h = nn.mlp(params["sigma_le_net"], x, compute_dtype=self.compute_dtype)
        sigma_le = h[..., 0:1]
        geo_feat_le = h[..., 1:]

        h = jnp.concatenate([geo_feat_le, x], axis=-1)
        le = nn.mlp(params["le_net"], h, compute_dtype=self.compute_dtype)
        # rsqrt(sum + eps) keeps the gradient finite when le == 0 exactly
        # (bias-free ReLU stacks do emit exact zeros at init)
        le = le * jax.lax.rsqrt(jnp.sum(le * le, axis=-1, keepdims=True) + 1e-12)
        return jnp.concatenate([le, sigma_le], axis=-1)

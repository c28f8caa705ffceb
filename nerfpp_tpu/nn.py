"""Minimal functional NN layer library over parameter pytrees.

The TPU-native counterpart of the reference's training-infra mini-library
(src/LibTorchTraining/Trainable.h): instead of an abstract ``Trainable`` module
base with static ``Initialize``/``ParamsCount``, layers here are plain dicts of
arrays created by ``dense_init`` and applied by pure functions — trivially
jittable, shardable, and checkpointable as one pytree.

Initialization matches Trainable.h:32-53: Xavier-normal with gain 0.1 for weight
matrices, zeros for biases. Hash tables use uniform(-1e-4, 1e-4)
(NeRF.cpp:265-272 / CuHashEmbedder.cpp:24).
"""
from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


def xavier_normal(key: jax.Array, shape, gain: float = 0.1,
                  dtype=jnp.float32) -> jnp.ndarray:
    """Xavier/Glorot normal: std = gain * sqrt(2 / (fan_in + fan_out))."""
    fan_in, fan_out = shape[0], shape[1]
    std = gain * (2.0 / (fan_in + fan_out)) ** 0.5
    return jax.random.normal(key, shape, dtype) * std


def dense_init(key: jax.Array, in_dim: int, out_dim: int, use_bias: bool = True,
               gain: float = 0.1, dtype=jnp.float32) -> Params:
    p = {"w": xavier_normal(key, (in_dim, out_dim), gain=gain, dtype=dtype)}
    if use_bias:
        p["b"] = jnp.zeros((out_dim,), dtype)
    return p


def dense(p: Params, x: jnp.ndarray, compute_dtype=None) -> jnp.ndarray:
    """y = x @ w (+ b). ``compute_dtype`` casts inputs/weights (e.g. bf16) while the
    accumulation stays fp32 via preferred_element_type — the MXU-friendly path."""
    w = p["w"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    y = jnp.dot(x, w, preferred_element_type=jnp.float32)
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def mlp_init(key: jax.Array, dims: Sequence[int], use_bias: bool = True,
             gain: float = 0.1, dtype=jnp.float32) -> list:
    """A stack of dense layers with the given dims, e.g. [in, h, h, out]."""
    keys = jax.random.split(key, len(dims) - 1)
    return [dense_init(k, dims[i], dims[i + 1], use_bias, gain, dtype)
            for i, k in enumerate(keys)]


def mlp(layers: list, x: jnp.ndarray, final_activation=None,
        compute_dtype=None) -> jnp.ndarray:
    """ReLU between layers, no activation after the last (final activations are
    deferred to raw2outputs, matching NeRF.cpp:376, 387)."""
    for i, p in enumerate(layers):
        x = dense(p, x, compute_dtype)
        if i != len(layers) - 1:
            x = jax.nn.relu(x)
    if final_activation is not None:
        x = final_activation(x)
    return x


def params_count(params) -> int:
    """Total number of scalar parameters in a pytree (Trainable.h:18-30)."""
    return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))

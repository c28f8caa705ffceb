"""Auxiliary regularization losses (reference NeRF.h:255-326).

The hash-grid total-variation loss lives next to the encoder in
nerfpp_tpu/encoders/hashgrid.py (it needs the hashing scheme).
"""
from __future__ import annotations

import jax.numpy as jnp


def sigma_sparsity_loss(sigmas: jnp.ndarray) -> jnp.ndarray:
    """Cauchy sparsity on densities: sum log(1 + 2*sigma^2) (NeRF.h:303-306)."""
    return jnp.sum(jnp.log(1.0 + 2.0 * sigmas ** 2), axis=-1)


def orientation_loss(weights: jnp.ndarray, normals: jnp.ndarray,
                     viewdirs: jnp.ndarray) -> jnp.ndarray:
    """Penalize visible normals facing away from the camera (NeRF.h:309-316).

    weights: [bs, n_samples, 1]; normals: [bs, n_samples, 3]; viewdirs: [bs, 3].
    """
    n_dot_minus_v = jnp.sum(normals * (-viewdirs)[..., None, :], axis=-1)
    return jnp.sum(weights[..., 0] * jnp.minimum(0.0, n_dot_minus_v) ** 2, axis=-1)


def pred_normal_loss(weights: jnp.ndarray, normals: jnp.ndarray,
                     pred_normals: jnp.ndarray) -> jnp.ndarray:
    """MSE between weighted analytic and predicted normals (NeRF.h:319-326)."""
    return jnp.mean((weights * pred_normals - weights * normals) ** 2)

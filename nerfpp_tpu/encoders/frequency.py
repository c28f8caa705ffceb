"""Frequency (sinusoidal) positional encoding — classic NeRF.

Re-designs the reference ``Embedder`` (NeRF.cpp:4-39): optional input passthrough,
then per frequency band f: sin(x*f), cos(x*f), bands either log-spaced
2^(max_freq * i / (N-1)) or linearly spaced between 2^0 and 2^max_freq.
The output concatenation order matches the reference: [x, sin(f0 x), cos(f0 x),
sin(f1 x), cos(f1 x), ...].
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


class FrequencyEncoder:
    """Stateless encoder; construction precomputes the static band list."""

    def __init__(self, num_freqs: int, max_freq_log2: float,
                 include_input: bool = True, input_dims: int = 3,
                 log_sampling: bool = True):
        self.num_freqs = num_freqs
        self.include_input = include_input
        self.input_dims = input_dims
        if num_freqs > 1:
            if log_sampling:
                bands = [2.0 ** (max_freq_log2 / (num_freqs - 1) * i) for i in range(num_freqs)]
            else:
                bands = [1.0 + (2.0 ** max_freq_log2 - 1.0) / (num_freqs - 1) * i
                         for i in range(num_freqs)]
        else:
            bands = [1.0] * num_freqs
        self.freq_bands = np.asarray(bands, np.float32)
        self.output_dims = (input_dims if include_input else 0) + num_freqs * 2 * input_dims

    def __call__(self, x: jnp.ndarray):
        """x: [..., input_dims] -> (embedding [..., output_dims], keep_mask=None)."""
        scaled = x[..., None, :] * self.freq_bands[:, None]        # [..., F, D]
        sin = jnp.sin(scaled)
        cos = jnp.cos(scaled)
        per_band = jnp.concatenate([sin, cos], axis=-1)            # [..., F, 2D]
        flat = per_band.reshape(*x.shape[:-1], -1)                 # [..., F*2D]
        if self.include_input:
            flat = jnp.concatenate([x, flat], axis=-1)
        return flat, None

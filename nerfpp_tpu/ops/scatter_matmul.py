"""MXU-powered scatter-add: factorized one-hot matmul.

TPU v5e has no fast scatter (measured 0.011 G scatter-adds/s via XLA's native
path — PERFORMANCE.md), but it has a 129 TFLOP/s MXU. A scatter-add

    out[idx_q] += vals_q,  idx in [0, S)

is the matmul onehot(idx)^T @ vals — unaffordable to materialize at S ~ 2^13+.
Factor the index instead: idx = a * (Nb*Nc) + b * Nc + c with (Na, Nb, Nc)
powers of two. Then onehot(idx) = A x B x C (outer product of three small
one-hots) and

    out[a, b, c] = sum_q A[q,a] * B[q,b] * C[q,c] * vals[q]
                 = for each a:  B_masked^T @ C,   B_masked = B * (A[:,a]*vals)

i.e. Na skinny [Nb, Q] @ [Q, Nc] matmuls with a huge contraction dimension —
exactly what the MXU is good at. Operands are bf16 with fp32 accumulation
(the reference's CUDA backward accumulates in fp16 with a 128x loss scale,
CuHashEmbedder.cu:293 — bf16 needs no scale thanks to the wider exponent).

Used as the hash-encoder backward (encoders/hashgrid.py): ~10x over the XLA
scatter at 2^13-entry tables.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _factor(size: int):
    """Split a power-of-two size into (Na, Nb, Nc) with Nb, Nc <= 128."""
    bits = size.bit_length() - 1
    assert (1 << bits) == size, f"size must be a power of two, got {size}"
    kc = min(7, bits)
    kb = min(7, bits - kc)
    ka = bits - kb - kc
    return 1 << ka, 1 << kb, 1 << kc, ka, kb, kc


def scatter_add_matmul(idx: jnp.ndarray, vals: jnp.ndarray, size: int,
                       compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Equivalent to jnp.zeros((size, F)).at[idx].add(vals) on the MXU.

    idx: [Q] int32 in [0, size); vals: [Q, F] float. size must be a power of
    two. Returns [size, F] float32.
    """
    q = idx.shape[0]
    f = vals.shape[-1]
    na, nb, nc, ka, kb, kc = _factor(size)

    a = (idx >> (kb + kc)).astype(jnp.int32)
    b = ((idx >> kc) & (nb - 1)).astype(jnp.int32)
    c = (idx & (nc - 1)).astype(jnp.int32)

    lanes_b = jax.lax.broadcasted_iota(jnp.int32, (q, nb), 1)
    lanes_c = jax.lax.broadcasted_iota(jnp.int32, (q, nc), 1)
    onehot_b = (lanes_b == b[:, None]).astype(compute_dtype)      # [Q, Nb]
    onehot_c = (lanes_c == c[:, None]).astype(compute_dtype)      # [Q, Nc]

    outs = []
    for f_i in range(f):
        v = vals[:, f_i]
        blocks = []
        for a_v in range(na):
            w = jnp.where(a == a_v, v, 0.0).astype(compute_dtype)  # [Q]
            bm = onehot_b * w[:, None]                             # [Q, Nb]
            g = jax.lax.dot_general(
                bm, onehot_c,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)                # [Nb, Nc]
            blocks.append(g)
        outs.append(jnp.stack(blocks).reshape(size))
    return jnp.stack(outs, axis=-1)


def scatter_add(idx: jnp.ndarray, vals: jnp.ndarray, size: int,
                use_matmul: bool = True,
                matmul_max_size: int = 1 << 14) -> jnp.ndarray:
    """Dispatch: MXU factorized path for power-of-two sizes up to
    matmul_max_size (FLOPs scale with size), XLA native scatter otherwise."""
    pow2 = (size & (size - 1)) == 0
    if use_matmul and pow2 and size <= matmul_max_size:
        return scatter_add_matmul(idx, vals, size)
    return jnp.zeros((size, vals.shape[-1]), jnp.float32).at[idx].add(
        vals.astype(jnp.float32))

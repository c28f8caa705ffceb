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


def scatter_add_matmul_batched(idxs: jnp.ndarray, vals: jnp.ndarray,
                               size: int, q_chunk: int = 1 << 15,
                               compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Batched multi-table scatter: L independent scatters in one scanned
    einsum — the hash-encoder backward over all levels at once.

    idxs: [L, Q] int32 in [0, size); vals: [L, Q, F]. Returns [L * size, F]
    f32. Requires size to be a power of two with size/128 * F <= 128 columns
    (true for the VMEM-kernel regime, T <= 2^13 at F = 2). The lhs packs the
    (feature, b-bits) one-hot so one [L, Q, F*Nb] x [L, Q, 128] batched dot
    per chunk produces every level's [F*Nb, 128] gradient block; scanning over
    Q chunks bounds the transient one-hot storage. Measured ~2.7x the
    per-level variant (per-dispatch and operand-streaming overheads amortize).
    """
    l, q = idxs.shape
    f = vals.shape[-1]
    nc = 128
    nb = size // nc
    if nb * nc != size or f * nb > 128:
        raise ValueError(f"unsupported factorization size={size} F={f}")
    qc = min(q_chunk, q)
    if q % qc != 0:
        # fall back to one chunk if Q doesn't divide evenly
        qc = q
    nchunks = q // qc
    idx_c = idxs.reshape(l, nchunks, qc).transpose(1, 0, 2)
    val_c = vals.reshape(l, nchunks, qc, f).transpose(1, 0, 2, 3)

    def body(acc, args):
        idx, v = args                                    # [L, qc], [L, qc, F]
        b = (idx >> 7).astype(jnp.int32)
        c = (idx & 127).astype(jnp.int32)
        iota_b = jax.lax.broadcasted_iota(jnp.int32, (l, qc, nb), 2)
        iota_c = jax.lax.broadcasted_iota(jnp.int32, (l, qc, nc), 2)
        oh_b = iota_b == b[..., None]
        lhs = jnp.concatenate(
            [jnp.where(oh_b, v[..., i:i + 1], 0.0) for i in range(f)],
            axis=-1).astype(compute_dtype)               # [L, qc, F*Nb]
        rhs = (iota_c == c[..., None]).astype(compute_dtype)
        g = jax.lax.dot_general(lhs, rhs, (((1,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        return acc + g, None

    acc = jnp.zeros((l, f * nb, nc), jnp.float32)
    acc, _ = jax.lax.scan(body, acc, (idx_c, val_c))
    # [L, (f, b), c] -> [L, b, c, f] -> [L*size, F]
    return acc.reshape(l, f, nb, nc).transpose(0, 2, 3, 1).reshape(l * size, f)


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

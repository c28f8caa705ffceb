"""Blocked-scheme hash encoding: layout invariants + fused-kernel parity.

The "blocked" scheme (encoders/hashgrid.py) is the TPU-native large-table
organization: 4^3-cell halo blocks in 128-lane rows, Morton slot order. The
fused kernel (pallas/hash_encode_blocked.py) must match the XLA oracle
(gather_trilerp_reference over corner_indices) exactly up to bf16 feature
rounding. Reference semantics anchor: CuHashEmbedder.cu:9-102 at T=2^19
(main.cpp:189) — same capacity, same trilerp, different (documented) hash.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nerfpp_tpu.encoders.hashgrid import (BLOCK_LANES, HashGridEncoder,
                                          gather_trilerp_reference, morton3)
from nerfpp_tpu.pallas.hash_encode_blocked import (build_boxes,
                                                   hash_encode_blocked)

BBOX = np.array([-1.5, -1.0, -1.2, 1.5, 1.0, 1.3], np.float32)


def _enc(**kw):
    args = dict(n_levels=4, log2_hashmap_size=12, base_resolution=16,
                finest_resolution=128, scheme="blocked")
    args.update(kw)
    return HashGridEncoder(BBOX, **args)


def _rand_pts(n, seed=1):
    return jax.random.uniform(jax.random.PRNGKey(seed), (n, 3),
                              minval=jnp.asarray(BBOX[:3]),
                              maxval=jnp.asarray(BBOX[3:]))


def test_param_count_parity():
    # capacity parity with the reference: n_levels * 2^T * F parameters
    enc = _enc(n_levels=3, log2_hashmap_size=14)
    p = enc.init(jax.random.PRNGKey(0))
    assert p["table"].shape == (3 * (1 << 14), 2)


def test_halo_guarantee_and_lane_layout():
    # all 8 corners of any cell live in ONE table row (the halo property the
    # kernel's single-row gather relies on), at lanes base + {0,1,5,6,25,...}
    enc = _enc()
    idx, _ = enc.corner_indices(_rand_pts(500))
    rows = np.asarray(idx) // BLOCK_LANES
    assert (rows == rows[..., :1]).all()
    lanes = np.asarray(idx) % BLOCK_LANES
    assert lanes.max() < 125  # 5^3 vertices
    rel = lanes - lanes[..., :1]
    np.testing.assert_array_equal(
        np.sort(np.unique(rel)), [0, 1, 5, 6, 25, 26, 30, 31])


def test_morton_window_alignment():
    # an aligned 2x2x2-block cube = one aligned 8-slot window: slots of the
    # cube differ from (morton(oct) << 3) only in the low 3 bits
    enc = _enc()
    cell, _ = enc.blocked_cell_frac(_rand_pts(500))
    slot = np.asarray(enc.blocked_slot(cell))
    ob = np.asarray(enc.blocked_oct(cell))
    oct_m = morton3(ob[..., 0] >> 1, ob[..., 1] >> 1, ob[..., 2] >> 1)
    ws = (oct_m << 3) & (enc.block_slots - 1)
    assert ((slot >> 3) << 3 == ws).all()


def test_injective_when_under_capacity():
    # a level whose block grid fits in S must be collision-free
    enc = _enc(n_levels=1, base_resolution=16, finest_resolution=16,
               log2_hashmap_size=13)  # 5 blocks/axis after offset, S=64...
    cells = np.stack(np.meshgrid(*[np.arange(16)] * 3, indexing="ij"),
                     -1).reshape(-1, 1, 3)
    slots = np.asarray(enc.blocked_slot(jnp.asarray(cells)))[:, 0]
    blocks = cells[:, 0, :] // 4
    # same block -> same slot; different block -> different slot
    key = blocks[:, 0] * 100 + blocks[:, 1] * 10 + blocks[:, 2]
    for k in np.unique(key):
        assert len(np.unique(slots[key == k])) == 1
    assert len(np.unique(slots)) == len(np.unique(key))


def test_build_boxes_cover_all_slots():
    enc = _enc()
    pts = _rand_pts(4 * 128).reshape(4, 128, 3)
    mins, exts = jax.tree.map(np.asarray, build_boxes(pts, enc))
    l = enc.n_levels
    ng_pad = mins.shape[0] // l
    mins = mins.reshape(l, ng_pad)[:, :4]
    exts = exts.reshape(l, ng_pad)[:, :4]
    cell, _ = enc.blocked_cell_frac(pts.reshape(-1, 3))
    oct_ = np.asarray(enc.blocked_oct(cell)).reshape(4, 128, l, 3) >> 1
    for li in range(l):
        for g in range(4):
            mn = [(mins[li, g] >> s) & 1023 for s in (0, 10, 20)]
            ex = [(exts[li, g] >> s) & 1023 for s in (0, 10, 20)]
            o = oct_[g, :, li]
            for a in range(3):
                assert o[:, a].min() == mn[a]
                assert o[:, a].max() == mn[a] + ex[a] - 1


@pytest.mark.parametrize("n", [1, 100, 2048])
def test_kernel_matches_oracle(n):
    enc = _enc()
    params = enc.init(jax.random.PRNGKey(0))
    pts = _rand_pts(n)
    idx, frac = enc.corner_indices(pts)
    tab_bf16 = params["table"].astype(jnp.bfloat16).astype(jnp.float32)
    ref = gather_trilerp_reference(tab_bf16, idx, frac).reshape(n, -1)
    got = hash_encode_blocked(params["table"], pts, enc)
    # kernel accumulates in a different corner/window order: f32 noise only
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-8)


def test_kernel_clamped_out_of_bbox_points():
    enc = _enc()
    params = enc.init(jax.random.PRNGKey(0))
    pts = jnp.asarray([[2.0, 0.0, 0.0], [-5.0, -5.0, -5.0],
                       [1.5, 1.0, 1.3]], jnp.float32)
    clamped = jnp.clip(pts, jnp.asarray(BBOX[:3]), jnp.asarray(BBOX[3:]))
    idx, frac = enc.corner_indices(clamped)
    tab_bf16 = params["table"].astype(jnp.bfloat16).astype(jnp.float32)
    ref = gather_trilerp_reference(tab_bf16, idx, frac).reshape(3, -1)
    got = hash_encode_blocked(params["table"], clamped, enc)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-8)

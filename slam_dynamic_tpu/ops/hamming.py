"""Batched 256-bit Hamming matching on the MXU.

TPU-native re-design of ORBmatcher's scalar popcount + grid-bucket search
(/root/reference/src/ORBmatcher.cc:1804-1820 DescriptorDistance, and the
SearchBy* families). Instead of per-pair bit twiddling and per-cell candidate
walks, descriptors are unpacked once to {-1,+1} int8 and the full N x M
Hamming matrix is one int8 matmul: hamming = (256 - A.B^T) / 2. Candidate
gating (pixel radius, scale levels, masks) becomes masking of that matrix.
Rotation-histogram consistency (ComputeThreeMaxima, :1758) is a masked
bincount + top-3 filter.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

INVALID = jnp.int32(1 << 15)   # sentinel distance for masked pairs

# Backend switch for the distance-matrix kernel. The default is the MXU
# int8 matmul below; `use_pallas(True)` swaps in the VMEM XOR-popcount
# pallas kernel (ops/pallas_hamming.py) for graphs traced AFTER the call
# (jit caches trace the flag's value — set it at startup, e.g. bench.py
# --pallas-hamming, before the first tracked frame).
_USE_PALLAS = False


def use_pallas(enable: bool = True):
    global _USE_PALLAS
    _USE_PALLAS = enable


def popcount32(x: jnp.ndarray) -> jnp.ndarray:
    """Vectorized popcount of uint32 (oracle path; hot path uses the MXU)."""
    x = x.astype(jnp.uint32)
    x = x - ((x >> 1) & jnp.uint32(0x55555555))
    x = (x & jnp.uint32(0x33333333)) + ((x >> 2) & jnp.uint32(0x33333333))
    x = (x + (x >> 4)) & jnp.uint32(0x0F0F0F0F)
    return ((x * jnp.uint32(0x01010101)) >> 24).astype(jnp.int32)


def hamming_pairs(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Rowwise Hamming distance of packed descriptors [..., 8] uint32."""
    return popcount32(jnp.bitwise_xor(a, b)).sum(axis=-1)


def unpack_bipolar(desc: jnp.ndarray) -> jnp.ndarray:
    """[N, 8] uint32 -> [N, 256] int8 in {-1, +1} (bit b -> 2b-1)."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (desc[..., None] >> shifts[None, None]) & jnp.uint32(1)  # [N,8,32]
    bits = bits.reshape(desc.shape[0], 256).astype(jnp.int8)
    return bits * jnp.int8(2) - jnp.int8(1)


def hamming_matrix(desc_a: jnp.ndarray, desc_b: jnp.ndarray) -> jnp.ndarray:
    """Full [N, M] int32 Hamming matrix via one MXU int8 matmul (or the
    pallas XOR-popcount kernel when `use_pallas(True)` was set)."""
    if _USE_PALLAS:
        from .pallas_hamming import hamming_matrix_pallas
        # "axon" = real TPU behind the tunnel transport
        return hamming_matrix_pallas(
            desc_a, desc_b,
            interpret=jax.default_backend() not in ("tpu", "axon"))
    A = unpack_bipolar(desc_a)
    B = unpack_bipolar(desc_b)
    dot = jax.lax.dot_general(
        A, B, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32)
    return (256 - dot) >> 1


def masked_hamming_matrix(desc_a, valid_a, desc_b, valid_b,
                          pair_mask=None) -> jnp.ndarray:
    """Hamming matrix with INVALID on rows/cols/pairs that are masked out."""
    d = hamming_matrix(desc_a, desc_b)
    m = valid_a[:, None] & valid_b[None, :]
    if pair_mask is not None:
        m = m & pair_mask
    return jnp.where(m, d, INVALID)


def match_nn(dist: jnp.ndarray, max_dist: int, ratio: float = 1.0,
             mutual: bool = False):
    """Nearest-neighbor matches from a (masked) distance matrix.

    dist: [N, M] int32 (INVALID where not allowed).
    Returns (idx_b [N] int32, best_dist [N] int32, ok [N] bool).
    Ratio test compares best vs second-best (ORBmatcher's bestDist <
    nn_ratio * bestDist2, e.g. :1485 SearchByProjection frame-frame).
    """
    neg = -dist
    top2, idx2 = jax.lax.top_k(neg, 2)
    best = -top2[:, 0]
    second = -top2[:, 1]
    idx_b = idx2[:, 0]
    ok = (best <= max_dist)
    # ratio==1.0 is a no-op (top-2 is sorted, best <= second always)
    ok &= best.astype(jnp.float32) <= ratio * second.astype(jnp.float32)
    if mutual:
        best_for_b = jnp.argmin(dist, axis=0)     # [M]
        ok &= best_for_b[idx_b] == jnp.arange(dist.shape[0])
    return idx_b, best, ok


def rotation_consistency(angle_a, angle_b, idx_b, ok, histo_length: int = 30,
                         keep_top: int = 3):
    """Keep only matches whose angle difference falls in the top-k histogram
    bins (ORBmatcher::ComputeThreeMaxima, ref :1758-1800, including the
    10%%-of-max secondary-bin cut)."""
    diff = (angle_a - angle_b[idx_b]) % (2 * jnp.pi)
    bins = jnp.floor(diff / (2 * jnp.pi) * histo_length).astype(jnp.int32)
    bins = jnp.clip(bins, 0, histo_length - 1)
    counts = jnp.zeros(histo_length, jnp.int32).at[bins].add(
        ok.astype(jnp.int32))
    topv, topi = jax.lax.top_k(counts, keep_top)
    # secondary bins kept only if > 0.1 * max bin
    keep_bin = jnp.zeros(histo_length, bool)
    thr = (topv[0].astype(jnp.float32) * 0.1).astype(jnp.int32)
    for k in range(keep_top):
        keep_bin = keep_bin.at[topi[k]].set(topv[k] > (thr if k else 0))
    return ok & keep_bin[bins]


def radius_pair_mask(uv_a_proj, uv_b, radius_a):
    """Pixel-radius gating mask [N, M]: |proj(a) - kp_b| < r_a.

    Replaces GetFeaturesInArea grid buckets (/root/reference/src/
    Frame.cc:735-801) with a dense masked compare. Computed via the
    |a|^2 + |b|^2 - 2 a.b expansion: one [N, M] matmul buffer instead of
    the [N, M, 2] broadcast intermediate (the dominant byte cost).
    """
    na = jnp.sum(uv_a_proj * uv_a_proj, axis=-1)         # [N]
    nb = jnp.sum(uv_b * uv_b, axis=-1)                   # [M]
    dots = uv_a_proj @ uv_b.T                            # [N, M] (MXU)
    d2 = na[:, None] + nb[None, :] - 2.0 * dots
    return d2 <= (radius_a[:, None] ** 2)


def level_pair_mask(level_a, level_b, min_delta, max_delta):
    """Scale-consistency gating: level_b within [la+min_delta, la+max_delta]."""
    d = level_b[None, :] - level_a[:, None]
    return (d >= min_delta) & (d <= max_delta)

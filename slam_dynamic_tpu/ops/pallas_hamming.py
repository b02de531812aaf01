"""Pallas TPU kernel for the 256-bit Hamming distance matrix.

The XLA path (`ops/hamming.py:hamming_matrix`) unpacks each packed
descriptor to a 256-wide {-1,+1} int8 vector and rides the MXU:
`(256 - A @ B^T) / 2`. That is MXU-optimal FLOP-wise but materializes
[N, 256] + [M, 256] unpack intermediates in HBM (32x the descriptor
bytes) and round-trips the int32 product.

This kernel computes the same matrix the way the reference's scalar code
does (XOR + popcount, /root/reference/src/ORBmatcher.cc:1804-1820
DescriptorDistance) but vectorized on the VPU over [tile_n, tile_m]
blocks held in VMEM: for each of the 8 packed uint32 words,
`acc += popcount(a_word[:, None] ^ b_word[None, :])`. Descriptors are
read in their native packed form (8 uint32 = 32 bytes each) — no unpack
traffic, one HBM write of the output tile. Popcount is the classic
SWAR bit-twiddle (shift/mask/multiply), all VPU ops.

The public entry `hamming_matrix_pallas` pads to tile multiples and
slices back, so any [N, 8] x [M, 8] uint32 inputs work. `interpret=True`
runs the kernel on CPU for tests (tests/test_pallas_hamming.py); on TPU
hardware the compiled kernel is used by `ops/hamming.py` when
`use_pallas(True)` is set (bench-gated, see RESULTS.md).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _popcount_u32(x: jnp.ndarray) -> jnp.ndarray:
    """SWAR popcount of a uint32 array (VPU shifts/ands/mul)."""
    x = x - ((x >> 1) & jnp.uint32(0x55555555))
    x = (x & jnp.uint32(0x33333333)) + ((x >> 2) & jnp.uint32(0x33333333))
    x = (x + (x >> 4)) & jnp.uint32(0x0F0F0F0F)
    return ((x * jnp.uint32(0x01010101)) >> 24).astype(jnp.int32)


def _hamming_kernel(a_ref, bT_ref, out_ref, *, tile_n: int, tile_m: int):
    """One [tile_n, tile_m] output tile.

    a_ref:  [Np, 8] uint32 (full array in VMEM — descriptors are tiny:
            4096 x 32 B = 128 KB)
    bT_ref: [8, Mp] uint32 (pre-transposed so the word slice is a clean
            [1, tile_m] lane vector — no in-kernel transpose)
    out_ref: [tile_n, tile_m] int32 tile at grid position (i, j)
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    row0 = pl.multiple_of(i * tile_n, tile_n)
    col0 = pl.multiple_of(j * tile_m, tile_m)
    acc = jnp.zeros((tile_n, tile_m), jnp.int32)
    for w in range(8):                      # static unroll over words
        a_w = a_ref[pl.ds(row0, tile_n), w:w + 1]       # [tile_n, 1]
        b_w = bT_ref[w:w + 1, pl.ds(col0, tile_m)]      # [1, tile_m]
        acc = acc + _popcount_u32(jax.lax.bitwise_xor(a_w, b_w))
    out_ref[:] = acc


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("tile_n", "tile_m",
                                             "interpret"))
def hamming_matrix_pallas(desc_a: jnp.ndarray, desc_b: jnp.ndarray,
                          tile_n: int = 256, tile_m: int = 256,
                          interpret: bool = False) -> jnp.ndarray:
    """Full [N, M] int32 Hamming matrix from packed [., 8] uint32 rows."""
    n, m = desc_a.shape[0], desc_b.shape[0]
    np_, mp_ = _round_up(max(n, 1), tile_n), _round_up(max(m, 1), tile_m)
    a = jnp.pad(desc_a.astype(jnp.uint32), ((0, np_ - n), (0, 0)))
    bT = jnp.pad(desc_b.astype(jnp.uint32), ((0, mp_ - m), (0, 0))).T
    kernel = functools.partial(_hamming_kernel, tile_n=tile_n,
                               tile_m=tile_m)
    out = pl.pallas_call(
        kernel,
        grid=(np_ // tile_n, mp_ // tile_m),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(
            (tile_n, tile_m), lambda i, j: (i, j),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_, mp_), jnp.int32),
        interpret=interpret,
    )(a, bT)
    return out[:n, :m]

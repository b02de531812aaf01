"""Fused gated nearest-neighbor descriptor matching as ONE pallas kernel.

The XLA tracking path (frontend/fused.py `_mm_track`,
frontend/tracking_ops.py `track_against_landmarks`) materializes three
[M, N]-shaped intermediates in HBM per stage: the Hamming matrix (MXU
matmul of bit-unpacked descriptors), the pixel-radius mask (a second
matmul), and the level-window mask — ~100 MB of HBM traffic at the hot
shapes (M=4096 landmarks x N=2048 keypoints) before `top_k` reduces them
to per-keypoint best/second matches.

This kernel is the TPU-native fusion of the whole reduction: for each
keypoint tile it streams landmark tiles through VMEM, computes the
XOR-popcount Hamming distance (8 packed uint32 words), applies the
projection gates (pixel radius, octave window, validity) in registers,
and maintains the running (best, second, argmin) triple. Only the [N]
outputs ever reach HBM. Semantically identical to
`masked_hamming_matrix(...)` + `match_nn(dist.T)` of ops/hamming.py —
the reference behavior is ORBmatcher::SearchByProjection's per-cell
candidate walk + DescriptorDistance (/root/reference/src/
ORBmatcher.cc:45-180,1485-1560,1804-1820), re-designed as a tiled
streaming reduction.

Gate semantics (matching the XLA path bit-for-bit):
  pair allowed iff  kp_ok[n] & lm_ok[m]
                  & (kp_xy[n] - lm_uv[m])^2 <= lm_radius[m]^2
                  & lvl_min <= kp_level[n] - lm_lvl[m] <= lvl_max
Distance of disallowed pairs = INVALID (1 << 15), exactly as
`masked_hamming_matrix`. Ties resolve to the lowest landmark index, as
`jax.lax.top_k` does.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .hamming import INVALID
from .pallas_hamming import _popcount_u32


# Hot-path switch: None = auto. Auto enables the fused kernel on
# co-located backends (plain "tpu": 14.4x device-time win at [4096, 2048],
# tools/kernel_bench.py --match; "cpu": interpret mode lowers to traced
# XLA ops and beats the dense int8 matmul ~80x) and DISABLES it on the
# "axon" tunnel backend: there the per-frame cost is dominated by the
# transport, which pays a large per-dispatch penalty for executables
# containing Mosaic custom calls (measured: steady frames 41 -> 60-85 ms,
# keyframe frames 66 ms -> 1.8 s — RESULTS.md), so the dense MXU path
# stays the default through the tunnel. Read at TRACE time: set before
# the first tracked frame.
_USE_FUSED = None


def use_fused_match(enable):
    """True / False / None (auto)."""
    global _USE_FUSED
    _USE_FUSED = enable


def fused_match_enabled() -> bool:
    if _USE_FUSED is not None:
        return bool(_USE_FUSED)
    from ..utils.transport import tunneled
    return not tunneled()


def match_interpret() -> bool:
    """Compiled Mosaic kernel on real TPU backends, interpreter (traced
    XLA ops) elsewhere."""
    return jax.default_backend() not in ("tpu", "axon")


def accept_match(best, second, max_dist, ratio):
    """The accept tests of ops/hamming.match_nn, applied to kernel output."""
    ok = best <= max_dist
    ok &= best.astype(jnp.float32) <= ratio * second.astype(jnp.float32)
    return ok


def _match_kernel(kp_desc_ref, kp_x_ref, kp_y_ref, kp_lvl_ref, kp_ok_ref,
                  lm_descT_ref, lm_u_ref, lm_v_ref, lm_r2_ref, lm_lvl_ref,
                  lm_ok_ref, best_ref, second_ref, idx_ref,
                  *, tile_n: int, tile_m: int, m_total: int,
                  lvl_min: int, lvl_max: int):
    i = pl.program_id(0)
    row0 = pl.multiple_of(i * tile_n, tile_n)
    inval = jnp.full((tile_n, 1), int(INVALID), jnp.int32)
    best = inval
    second = inval
    idx = jnp.zeros((tile_n, 1), jnp.int32)

    kp_x = kp_x_ref[pl.ds(row0, tile_n), :]          # [TN, 1] f32
    kp_y = kp_y_ref[pl.ds(row0, tile_n), :]
    kp_lvl = kp_lvl_ref[pl.ds(row0, tile_n), :]      # [TN, 1] i32
    kp_ok = kp_ok_ref[pl.ds(row0, tile_n), :]        # [TN, 1] i32 (0/1)

    for j in range(m_total // tile_m):               # static unroll
        col0 = pl.multiple_of(j * tile_m, tile_m)
        # ---- Hamming distance of the [TN, TM] tile (8 packed words)
        acc = jnp.zeros((tile_n, tile_m), jnp.int32)
        for w in range(8):
            a_w = kp_desc_ref[pl.ds(row0, tile_n), w:w + 1]   # [TN, 1]
            b_w = lm_descT_ref[w:w + 1, pl.ds(col0, tile_m)]  # [1, TM]
            acc = acc + _popcount_u32(jax.lax.bitwise_xor(a_w, b_w))
        # ---- gates
        du = kp_x - lm_u_ref[0:1, pl.ds(col0, tile_m)]        # [TN, TM]
        dv = kp_y - lm_v_ref[0:1, pl.ds(col0, tile_m)]
        in_r = du * du + dv * dv <= lm_r2_ref[0:1, pl.ds(col0, tile_m)]
        dl = kp_lvl - lm_lvl_ref[0:1, pl.ds(col0, tile_m)]
        in_l = (dl >= lvl_min) & (dl <= lvl_max)
        ok = (kp_ok > 0) & (lm_ok_ref[0:1, pl.ds(col0, tile_m)] > 0)
        d = jnp.where(in_r & in_l & ok, acc, int(INVALID))
        # ---- within-tile best / second / first-argmin
        tb = jnp.min(d, axis=1, keepdims=True)                # [TN, 1]
        lane = jax.lax.broadcasted_iota(jnp.int32, (tile_n, tile_m), 1)
        ti = jnp.min(jnp.where(d == tb, lane + col0, m_total),
                     axis=1, keepdims=True)
        d2 = jnp.where(lane + col0 == ti, int(INVALID), d)
        ts = jnp.min(d2, axis=1, keepdims=True)
        # ---- merge running (best, second, idx): second smallest of the
        # union {best, second, tb, ts} = min(second, ts, max(best, tb))
        second = jnp.minimum(jnp.minimum(second, ts),
                             jnp.maximum(best, tb))
        take = tb < best                       # strict: ties keep lower j
        idx = jnp.where(take, ti, idx)
        best = jnp.minimum(best, tb)

    best_ref[:] = best
    second_ref[:] = second
    idx_ref[:] = idx


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("lvl_min", "lvl_max",
                                             "tile_n", "tile_m",
                                             "interpret"))
def gated_match_pallas(kp_desc, kp_xy, kp_level, kp_ok,
                       lm_desc, lm_uv, lm_radius, lm_lvl, lm_ok,
                       lvl_min: int = -1, lvl_max: int = 1,
                       tile_n: int = 256, tile_m: int = 512,
                       interpret: bool = False):
    """Per-keypoint gated NN match against a landmark set.

    Returns (idx [N] int32, best [N] int32, second [N] int32): the
    landmark index with the smallest gated Hamming distance, its distance
    and the runner-up distance (INVALID when no pair passes the gates).
    Callers apply the accept tests (max distance / ratio) — see
    `ops/hamming.match_nn`.
    """
    n, m = kp_desc.shape[0], lm_desc.shape[0]
    np_, mp_ = _round_up(max(n, 1), tile_n), _round_up(max(m, 1), tile_m)

    def padn(x, fill=0):
        return jnp.pad(x, ((0, np_ - n),) + ((0, 0),) * (x.ndim - 1),
                       constant_values=fill)

    def padm(x, fill=0):
        return jnp.pad(x, ((0, mp_ - m),) + ((0, 0),) * (x.ndim - 1),
                       constant_values=fill)

    args = (
        padn(kp_desc.astype(jnp.uint32)),                       # [Np, 8]
        padn(kp_xy[:, 0:1].astype(jnp.float32)),                # [Np, 1]
        padn(kp_xy[:, 1:2].astype(jnp.float32)),
        padn(kp_level.astype(jnp.int32))[:, None],              # [Np, 1]
        padn(kp_ok.astype(jnp.int32))[:, None],
        padm(lm_desc.astype(jnp.uint32)).T,                     # [8, Mp]
        padm(lm_uv[:, 0].astype(jnp.float32))[None, :],         # [1, Mp]
        padm(lm_uv[:, 1].astype(jnp.float32))[None, :],
        padm((lm_radius.astype(jnp.float32) ** 2))[None, :],
        padm(lm_lvl.astype(jnp.int32))[None, :],
        padm(lm_ok.astype(jnp.int32))[None, :],
    )
    kernel = functools.partial(
        _match_kernel, tile_n=tile_n, tile_m=tile_m, m_total=mp_,
        lvl_min=lvl_min, lvl_max=lvl_max)
    out_sds = jax.ShapeDtypeStruct((np_, 1), jnp.int32)
    out_spec = pl.BlockSpec((tile_n, 1), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    best, second, idx = pl.pallas_call(
        kernel,
        grid=(np_ // tile_n,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(args),
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=(out_sds, out_sds, out_sds),
        interpret=interpret,
    )(*args)
    return idx[:n, 0], best[:n, 0], second[:n, 0]


def gated_match_xla(kp_desc, kp_xy, kp_level, kp_ok,
                    lm_desc, lm_uv, lm_radius, lm_lvl, lm_ok,
                    lvl_min: int = -1, lvl_max: int = 1):
    """Reference semantics via the dense masked-matrix path (for tests
    and as the documentation of what the kernel computes). The radius
    gate uses the direct (du^2 + dv^2) form the kernel computes — the
    production path's `radius_pair_mask` norm-expansion differs by float
    rounding only on pixels exactly at the radius boundary."""
    from . import hamming as hm
    d = lm_uv[:, None, :] - kp_xy[None, :, :]                # [M, N, 2]
    pm = jnp.sum(d * d, axis=-1) <= lm_radius[:, None] ** 2
    lv = hm.level_pair_mask(lm_lvl, kp_level, lvl_min, lvl_max)
    dist = hm.masked_hamming_matrix(lm_desc, lm_ok, kp_desc, kp_ok,
                                    pair_mask=pm & lv)
    neg = -dist.T
    top2, idx2 = jax.lax.top_k(neg, 2)
    return idx2[:, 0], -top2[:, 0], -top2[:, 1]

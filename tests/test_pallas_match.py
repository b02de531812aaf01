"""Fused gated-match pallas kernel == dense masked-matrix + top-2 path."""
import jax.numpy as jnp
import numpy as np
import pytest

from slam_dynamic_tpu.ops.pallas_match import (gated_match_pallas,
                                               gated_match_xla)


def _problem(rng, n, m, dup_frac=0.0):
    kp_desc = rng.integers(0, 2**32, (n, 8), dtype=np.uint32)
    lm_desc = rng.integers(0, 2**32, (m, 8), dtype=np.uint32)
    if dup_frac:   # duplicated descriptors force distance ties
        k = max(int(m * dup_frac), 1)
        lm_desc[rng.integers(0, m, k)] = lm_desc[rng.integers(0, m, k)]
        lm_desc[: k // 2] = kp_desc[: k // 2]
    kp_xy = rng.uniform(0, 640, (n, 2)).astype(np.float32)
    lm_uv = rng.uniform(-50, 690, (m, 2)).astype(np.float32)
    kp_level = rng.integers(0, 8, n).astype(np.int32)
    lm_lvl = rng.integers(0, 8, m).astype(np.int32)
    lm_radius = rng.uniform(5, 400, m).astype(np.float32)
    kp_ok = rng.uniform(size=n) < 0.9
    lm_ok = rng.uniform(size=m) < 0.9
    return tuple(jnp.asarray(x) for x in
                 (kp_desc, kp_xy, kp_level, kp_ok,
                  lm_desc, lm_uv, lm_radius, lm_lvl, lm_ok))


@pytest.mark.parametrize("n,m,dup", [(256, 512, 0.0), (300, 700, 0.1),
                                     (512, 1024, 0.3), (64, 64, 0.0)])
def test_gated_match_equals_dense(n, m, dup):
    rng = np.random.default_rng(n + m)
    args = _problem(rng, n, m, dup)
    ip, bp, sp = gated_match_pallas(*args, interpret=True)
    ix, bx, sx = gated_match_xla(*args)
    np.testing.assert_array_equal(np.asarray(bp), np.asarray(bx))
    np.testing.assert_array_equal(np.asarray(sp), np.asarray(sx))
    # index must agree wherever a valid match exists (both sides resolve
    # ties to the first minimal landmark index)
    has = np.asarray(bx) < (1 << 15)
    np.testing.assert_array_equal(np.asarray(ip)[has], np.asarray(ix)[has])


def test_gated_match_all_masked():
    rng = np.random.default_rng(7)
    args = list(_problem(rng, 128, 256))
    args[8] = jnp.zeros(256, bool)          # no landmark valid
    idx, best, second = gated_match_pallas(*args, interpret=True)
    assert (np.asarray(best) == (1 << 15)).all()
    assert (np.asarray(second) == (1 << 15)).all()


def test_gated_match_window():
    """Level window actually gates: widen it and matches may only gain."""
    rng = np.random.default_rng(9)
    args = _problem(rng, 256, 512)
    _, b_narrow, _ = gated_match_pallas(*args, lvl_min=0, lvl_max=0,
                                        interpret=True)
    _, b_wide, _ = gated_match_pallas(*args, lvl_min=-7, lvl_max=7,
                                      interpret=True)
    assert (np.asarray(b_wide) <= np.asarray(b_narrow)).all()

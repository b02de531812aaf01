"""Pallas Hamming kernel == MXU-matmul path == scalar popcount oracle.

Runs the kernel in interpreter mode (CPU backend, forced by conftest);
the same kernel compiles for real on TPU hardware.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from slam_dynamic_tpu.ops import hamming as hm
from slam_dynamic_tpu.ops.pallas_hamming import hamming_matrix_pallas


def _rand_desc(rng, n):
    return jnp.asarray(rng.integers(0, 2**32, (n, 8), dtype=np.uint32))


@pytest.mark.parametrize("n,m", [(256, 256), (300, 170), (1, 1), (2048, 512)])
def test_pallas_matches_matmul(n, m):
    rng = np.random.default_rng(0)
    a, b = _rand_desc(rng, n), _rand_desc(rng, m)
    d_pallas = np.asarray(hamming_matrix_pallas(a, b, interpret=True))
    d_mxu = np.asarray(hm.hamming_matrix(a, b))
    np.testing.assert_array_equal(d_pallas, d_mxu)


def test_pallas_matches_scalar_oracle():
    rng = np.random.default_rng(1)
    a, b = _rand_desc(rng, 64), _rand_desc(rng, 48)
    d = np.asarray(hamming_matrix_pallas(a, b, interpret=True))
    # scalar oracle on a few random pairs
    an, bn = np.asarray(a), np.asarray(b)
    for i, j in rng.integers(0, (64, 48), (20, 2)):
        expect = bin(int.from_bytes(an[i].tobytes(), "little")
                     ^ int.from_bytes(bn[j].tobytes(), "little")).count("1")
        assert d[i, j] == expect, (i, j)


def test_pallas_identical_rows_zero():
    rng = np.random.default_rng(2)
    a = _rand_desc(rng, 128)
    d = np.asarray(hamming_matrix_pallas(a, a, interpret=True))
    assert (np.diag(d) == 0).all()
    assert (d >= 0).all() and (d <= 256).all()

import numpy as np
import jax.numpy as jnp

from slam_dynamic_tpu.ops import hamming as hm


def rand_desc(rng, n):
    return rng.integers(0, 2**32, size=(n, 8), dtype=np.uint32)


def np_hamming(a, b):
    x = np.bitwise_xor(a[:, None, :], b[None, :, :])
    return np.unpackbits(x.view(np.uint8), axis=-1).sum(-1)


def test_popcount(rng):
    x = rng.integers(0, 2**32, size=(1024,), dtype=np.uint32)
    got = np.asarray(hm.popcount32(jnp.asarray(x)))
    want = np.array([bin(int(v)).count("1") for v in x])
    np.testing.assert_array_equal(got, want)


def test_hamming_matrix_matches_popcount(rng):
    a, b = rand_desc(rng, 64), rand_desc(rng, 96)
    got = np.asarray(hm.hamming_matrix(jnp.asarray(a), jnp.asarray(b)))
    want = np_hamming(a, b)
    np.testing.assert_array_equal(got, want)
    pair = np.asarray(hm.hamming_pairs(jnp.asarray(a), jnp.asarray(a)))
    np.testing.assert_array_equal(pair, 0)


def test_match_nn_ratio_and_mutual(rng):
    a = rand_desc(rng, 32)
    b = a.copy()
    # flip a few bits in b so best distance is small but nonzero
    b[:, 0] ^= 0b111
    dist = hm.masked_hamming_matrix(
        jnp.asarray(a), jnp.ones(32, bool), jnp.asarray(b),
        jnp.ones(32, bool))
    idx, d, ok = hm.match_nn(dist, max_dist=50, ratio=0.9, mutual=True)
    np.testing.assert_array_equal(np.asarray(idx), np.arange(32))
    assert np.asarray(ok).all()
    np.testing.assert_array_equal(np.asarray(d), 3)


def test_match_nn_respects_mask(rng):
    a = rand_desc(rng, 16)
    valid_b = np.ones(16, bool)
    valid_b[3] = False
    dist = hm.masked_hamming_matrix(
        jnp.asarray(a), jnp.ones(16, bool), jnp.asarray(a),
        jnp.asarray(valid_b))
    idx, d, ok = hm.match_nn(dist, max_dist=100)
    assert not bool(ok[3])  # its identical twin is masked; next best is far


def test_rotation_consistency(rng):
    n = 100
    ang_a = rng.uniform(0, 2 * np.pi, n).astype(np.float32)
    ang_b = ang_a - 0.5  # consistent rotation for all but outliers
    ang_b[:5] = rng.uniform(0, 2 * np.pi, 5)  # 5 inconsistent
    idx = np.arange(n)
    ok = np.ones(n, bool)
    kept = np.asarray(hm.rotation_consistency(
        jnp.asarray(ang_a), jnp.asarray(ang_b), jnp.asarray(idx),
        jnp.asarray(ok)))
    assert kept[5:].all()
    assert kept[:5].sum() <= 2


def test_radius_pair_mask():
    uv_a = jnp.asarray([[0.0, 0.0], [10.0, 10.0]])
    uv_b = jnp.asarray([[1.0, 0.0], [30.0, 30.0]])
    m = np.asarray(hm.radius_pair_mask(uv_a, uv_b, jnp.asarray([2.0, 2.0])))
    assert m.tolist() == [[True, False], [False, False]]

"""Reference-scale (10^6-word) vocabulary: transform + place recognition.

The reference ships and loads a ~1M-word tree (/root/reference/Thirdparty/
DBoW2/DBoW2/TemplatedVocabulary.h:1338). These tests exercise that scale
end-to-end: a k=10 L=6 tree (10^6 leaves, 32 MB bottom centroid table)
built by extending the shipped trained 10^5 tree one level
(tools/make_vocab_1m.py), descent over 6 gather+argmin rounds, sparse-BoW
construction, and KFDB place-recognition queries whose cost is independent
of n_words."""
import numpy as np
import jax.numpy as jnp
import pytest

from slam_dynamic_tpu.models import vocabulary as voc_mod
from slam_dynamic_tpu.worldmap import kfdb as kfdb_mod


@pytest.fixture(scope="module")
def voc_pair():
    import sys
    sys.path.insert(0, ".")
    from tools.make_vocab_1m import extend_one_level
    base = voc_mod.load(voc_mod.default_vocab_path())
    return base, extend_one_level(base)


def _frame_desc(rng, n=512):
    return jnp.asarray(
        rng.integers(0, 2 ** 32, (n, 8), dtype=np.uint32)), \
        jnp.ones(n, bool)


def test_million_word_transform_consistent(voc_pair, rng):
    base, big = voc_pair
    assert big.n_words == 10 ** 6
    assert np.asarray(big.centroids[-1]).shape == (10 ** 6, 8)
    desc, valid = _frame_desc(rng)
    bv5 = voc_mod.transform(base, desc, valid)
    bv6 = voc_mod.transform(big, desc, valid)
    w5 = np.asarray(bv5.word)
    w6 = np.asarray(bv6.word)
    assert (w6 >= 0).all() and (w6 < 10 ** 6).all()
    # the first five levels are unchanged, so every descent path agrees
    # with the 10^5 tree above the new bottom level
    np.testing.assert_array_equal(w6 // 10, w5)


def test_million_word_place_recognition(voc_pair, rng):
    """KFDB queries at 10^6 words: a revisit of KF 2's scene must rank
    KF 2 top; cost is independent of n_words (sparse searchsorted)."""
    _, big = voc_pair
    K, top_w = 8, 512
    db = kfdb_mod.KFDatabase.empty(K, top_w=top_w)
    descs = []
    for k in range(4):
        d, v = _frame_desc(rng)
        descs.append(d)
        sb = voc_mod.sparse_bow(voc_mod.transform(big, d, v), top_w=top_w)
        db = kfdb_mod.add(db, jnp.int32(k), sb)
    # query = KF 2's descriptors with 20% resampled (a noisy revisit)
    d2 = np.asarray(descs[2]).copy()
    n = d2.shape[0]
    swap = rng.integers(0, n, n // 5)
    d2[swap] = np.asarray(descs[0])[swap]
    q = voc_mod.sparse_bow(
        voc_mod.transform(big, jnp.asarray(d2), jnp.ones(n, bool)),
        top_w=top_w)
    s = np.asarray(kfdb_mod.scores(db, q)[0])[:4]
    assert s.argmax() == 2, s
    assert s[2] > 2.0 * np.delete(s, 2).max(), s

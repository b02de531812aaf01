"""Vocabulary training/transform/scoring + KF database + PnP."""
import numpy as np
import jax
import jax.numpy as jnp

from slam_dynamic_tpu.models import vocabulary as voc
from slam_dynamic_tpu.worldmap import kfdb
from slam_dynamic_tpu.ops.pnp import ransac_pnp
from slam_dynamic_tpu.utils.camera import Intrinsics, project
from slam_dynamic_tpu.utils import se3


def rand_desc(rng, n):
    return rng.integers(0, 2**32, size=(n, 8), dtype=np.uint32)


def corrupt(rng, d, nbits):
    """Flip nbits random bits in each descriptor."""
    out = d.copy()
    for i in range(len(out)):
        for _ in range(nbits):
            lane = rng.integers(0, 8)
            bit = np.uint32(1) << np.uint32(rng.integers(0, 32))
            out[i, lane] ^= bit
    return out


def test_train_transform_consistency(rng):
    corpus = rand_desc(rng, 3000)
    v = voc.train(corpus, k=4, levels=3, seed=0)
    assert v.n_words == 64
    bv = voc.transform(v, jnp.asarray(corpus[:128]), jnp.ones(128, bool))
    w = np.asarray(bv.word)
    assert ((w >= 0) & (w < 64)).all()
    # slightly corrupted descriptors mostly map to the same word
    noisy = corrupt(rng, corpus[:128], 8)
    bv2 = voc.transform(v, jnp.asarray(noisy), jnp.ones(128, bool))
    same = (np.asarray(bv2.word) == w).mean()
    assert same > 0.55, same
    # direct-index node at level 2 is the word's parent in heap layout
    np.testing.assert_array_equal(np.asarray(bv.node), w)  # di_level=2=leaf here


def clustered_desc(rng, protos, n, nbits=10):
    """Corpus clustered around prototypes (real descriptors cluster; uniform
    random ones are the worst case for BoW)."""
    base = protos[rng.integers(0, len(protos), n)]
    return corrupt(rng, base, nbits)


def test_bow_scoring_discriminates(rng):
    protos = rand_desc(rng, 64)
    corpus = clustered_desc(rng, protos, 4000)
    v = voc.train(corpus, k=4, levels=3, seed=1)
    a = clustered_desc(rng, protos[:20], 300)    # scene A: subset of words
    a_noisy = corrupt(rng, a, 6)
    b = clustered_desc(rng, protos[40:], 300)    # scene B: disjoint words
    ones = jnp.ones(300, bool)
    ha = voc.bow_histogram(voc.transform(v, jnp.asarray(a), ones), 64)
    han = voc.bow_histogram(voc.transform(v, jnp.asarray(a_noisy), ones), 64)
    hb = voc.bow_histogram(voc.transform(v, jnp.asarray(b), ones), 64)
    s_same = float(voc.l1_score(ha, han))
    s_diff = float(voc.l1_score(ha, hb))
    assert s_same > s_diff + 0.1, (s_same, s_diff)
    assert float(voc.l1_score(ha, ha)) > 0.999


def test_kfdb_query_prefers_revisit(rng):
    corpus = rand_desc(rng, 4000)
    v = voc.train(corpus, k=4, levels=3, seed=2)
    K, W = 16, 64
    db = kfdb.KFDatabase.empty(K, W)
    frames = [rand_desc(rng, 200) for _ in range(6)]
    ones = jnp.ones(200, bool)
    for k, f in enumerate(frames):
        h = voc.bow_histogram(voc.transform(v, jnp.asarray(f), ones), W)
        db = kfdb.add(db, k, h)
    # query = noisy copy of frame 3
    q = corrupt(rng, frames[3], 5)
    hq = voc.bow_histogram(voc.transform(v, jnp.asarray(q), ones), W)
    covis = jnp.zeros((K, K), jnp.int32)
    cand = kfdb.query(db, hq, covis, jnp.zeros(K, bool))
    assert int(jnp.argmax(cand.score)) == 3
    # excluding 3 finds someone else
    excl = jnp.zeros(K, bool).at[3].set(True)
    cand2 = kfdb.query(db, hq, covis, excl)
    assert int(jnp.argmax(cand2.score)) != 3


def test_ransac_pnp(rng):
    cam = Intrinsics.create(fx=500.0, fy=500.0, cx=320.0, cy=240.0)
    pts = np.stack([rng.uniform(-3, 3, 120), rng.uniform(-2, 2, 120),
                    rng.uniform(3, 9, 120)], 1).astype(np.float32)
    xi = np.concatenate([rng.normal(0, 0.3, 3), rng.normal(0, 0.1, 3)])
    R_gt, t_gt = se3.se3_exp(jnp.asarray(xi, jnp.float32))
    uv = np.array(project(cam, se3.se3_apply(R_gt, t_gt, jnp.asarray(pts))))
    uv += rng.normal(0, 0.5, uv.shape)
    uv[:30] += rng.uniform(30, 100, (30, 2))   # 25% outliers
    res = ransac_pnp(cam, jnp.asarray(pts), jnp.asarray(uv, jnp.float32),
                     jnp.ones(120, bool), jax.random.PRNGKey(0))
    assert int(res.n_inliers) > 70
    assert np.asarray(res.inliers)[:30].sum() <= 3
    t_err = np.linalg.norm(np.asarray(res.t) - np.asarray(t_gt))
    assert t_err < 0.1, t_err   # coarse; LM polish tightens afterwards

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
        sb = voc.sparse_bow(voc.transform(v, jnp.asarray(f), ones), W)
        db = kfdb.add(db, k, sb)
    # query = noisy copy of frame 3
    q = corrupt(rng, frames[3], 5)
    sq = voc.sparse_bow(voc.transform(v, jnp.asarray(q), ones), W)
    covis = jnp.zeros((K, K), jnp.int32)
    cand = kfdb.query(db, sq, covis, jnp.zeros(K, bool))
    assert int(jnp.argmax(cand.score)) == 3
    # excluding 3 finds someone else
    excl = jnp.zeros(K, bool).at[3].set(True)
    cand2 = kfdb.query(db, sq, covis, excl)
    assert int(jnp.argmax(cand2.score)) != 3


def test_sparse_bow_matches_dense_histogram(rng):
    """sparse_bow + searchsorted scoring must equal the dense-histogram
    L1 identity sum_i min(q_i, w_i) == 1 - 0.5|q - w|_1 bit-for-bit
    (within float tolerance) when W covers all distinct words."""
    corpus = rand_desc(rng, 3000)
    v = voc.train(corpus, k=4, levels=3, seed=3)   # 64 words
    n_words = v.n_words
    ones = jnp.ones(150, bool)
    frames = [rand_desc(rng, 150) for _ in range(5)]
    K, W = 8, 128                                  # W > n_words: exact
    db = kfdb.KFDatabase.empty(K, W)
    hists = []
    for k, f in enumerate(frames):
        bv = voc.transform(v, jnp.asarray(f), ones)
        db = kfdb.add(db, k, voc.sparse_bow(bv, W))
        hists.append(voc.bow_histogram(bv, n_words))
    q = rand_desc(rng, 150)
    bq = voc.transform(v, jnp.asarray(q), ones)
    s_sparse, shared = kfdb.scores(db, voc.sparse_bow(bq, W))
    hq = voc.bow_histogram(bq, n_words)
    for k in range(5):
        dense = float(voc.l1_score(hq, hists[k]))
        assert abs(float(s_sparse[k]) - dense) < 1e-5, (k, dense)
    assert (np.asarray(s_sparse[5:]) == 0).all()


def test_sparse_bow_partial_frame_and_dup_words(rng):
    """Invalid slots are dropped; duplicate words sum their tf-idf."""
    v = voc.train(rand_desc(rng, 2000), k=4, levels=2, seed=4)  # 16 words
    d = rand_desc(rng, 64)
    d[1] = d[0]          # force a duplicate word
    valid = np.ones(64, bool)
    valid[32:] = False
    bv = voc.transform(v, jnp.asarray(d), jnp.asarray(valid))
    sb = voc.sparse_bow(bv, 64)
    w = np.asarray(sb.word)
    real = w < int(voc.PAD_WORD)
    assert (np.diff(w[real]) > 0).all()            # sorted, unique
    np.testing.assert_allclose(float(np.asarray(sb.weight).sum()), 1.0,
                               rtol=1e-5)          # L1-normalized
    hist = np.asarray(voc.bow_histogram(bv, v.n_words))
    for wid, wt in zip(w[real], np.asarray(sb.weight)[real]):
        np.testing.assert_allclose(wt, hist[wid], rtol=1e-5)


def test_kfdb_query_cost_independent_of_vocab_size():
    """The scoring path must never materialize an [n_words] array: the
    same jitted scores/query executables serve a 10^6-word vocabulary —
    every traced shape depends only on (K, W)."""
    K, W = 8, 32
    db = kfdb.KFDatabase.empty(K, W)
    # words drawn from a 10^6-word id space; dense histograms would need
    # 4 MB per query and O(K * n_words) for the database
    big_words = jnp.asarray(
        np.sort(np.random.RandomState(0).choice(10**6, W, replace=False))
        .astype(np.int32))
    sb = voc.SparseBow(big_words, jnp.full(W, 1.0 / W, jnp.float32))
    db = kfdb.add(db, 0, sb)
    jaxpr = jax.make_jaxpr(
        lambda d, q: kfdb.scores(d, q))(db, sb)
    sizes = [np.prod(v.aval.shape) for eqn in jaxpr.eqns
             for v in eqn.outvars if hasattr(v.aval, "shape")]
    assert max(sizes, default=0) <= K * W, max(sizes)
    s, shared = kfdb.scores(db, sb)
    assert abs(float(s[0]) - 1.0) < 1e-5           # self-similarity = 1
    assert int(shared[0]) == W


def test_ransac_pnp_coplanar(rng):
    """ALL world points on one plane (wall/floor/facade): the 6-point DLT
    is degenerate here — the planar-homography hypotheses in the same
    RANSAC batch must recover the pose (ref PnPsolver.cc EPnP handles
    coplanarity via its control points)."""
    cam = Intrinsics.create(fx=500.0, fy=500.0, cx=320.0, cy=240.0)
    # plane z = 0.3*x - 0.2*y + 6 (tilted wall)
    x = rng.uniform(-3, 3, 120)
    y = rng.uniform(-2, 2, 120)
    pts = np.stack([x, y, 0.3 * x - 0.2 * y + 6.0], 1).astype(np.float32)
    xi = np.concatenate([rng.normal(0, 0.25, 3), rng.normal(0, 0.08, 3)])
    R_gt, t_gt = se3.se3_exp(jnp.asarray(xi, jnp.float32))
    uv = np.array(project(cam, se3.se3_apply(R_gt, t_gt, jnp.asarray(pts))))
    uv += rng.normal(0, 0.4, uv.shape)
    uv[:25] += rng.uniform(30, 90, (25, 2))       # ~20% outliers
    res = ransac_pnp(cam, jnp.asarray(pts), jnp.asarray(uv, jnp.float32),
                     jnp.ones(120, bool), jax.random.PRNGKey(1))
    assert int(res.n_inliers) > 70, int(res.n_inliers)
    t_err = np.linalg.norm(np.asarray(res.t) - np.asarray(t_gt))
    assert t_err < 0.15, t_err


def test_scoring_family_matches_dense(rng):
    """The DBoW2 scoring family (ScoringObject.cpp: L1/L2/chi2/KL/
    Bhattacharyya/dot) computed on SparseBow must match dense-histogram
    formulas."""
    v = voc.train(rand_desc(rng, 2500), k=4, levels=3, seed=6)  # 64 words
    n = v.n_words
    ones = jnp.ones(120, bool)
    ba = voc.transform(v, jnp.asarray(rand_desc(rng, 120)), ones)
    bb = voc.transform(v, jnp.asarray(rand_desc(rng, 120)), ones)
    qa, qb = voc.sparse_bow(ba, 128), voc.sparse_bow(bb, 128)
    ha = np.asarray(voc.bow_histogram(ba, n))
    hb = np.asarray(voc.bow_histogram(bb, n))
    assert abs(float(voc.score_l1(qa, qb))
               - (1 - 0.5 * np.abs(ha - hb).sum())) < 1e-5
    na, nb = np.linalg.norm(ha), np.linalg.norm(hb)
    l2 = 1 - np.sqrt(max(1 - float(ha @ hb) / (na * nb), 0))
    assert abs(float(voc.score_l2(qa, qb)) - l2) < 1e-5
    chi = float(np.sum(np.where(ha + hb > 0, 2 * ha * hb /
                                np.maximum(ha + hb, 1e-18), 0)))
    assert abs(float(voc.score_chi_square(qa, qb)) - chi) < 1e-5
    assert abs(float(voc.score_bhattacharyya(qa, qb))
               - float(np.sqrt(ha * hb).sum())) < 1e-5
    assert abs(float(voc.score_dot(qa, qb)) - float(ha @ hb)) < 1e-6
    eps = 2.2204460492503131e-16
    sel = ha > 0
    kl = float(np.sum(ha[sel] * (np.log(ha[sel]) - np.log(
        np.where(hb[sel] > 0, hb[sel], eps)))))
    assert abs(float(voc.score_kl(qa, qb)) - kl) < 1e-4
    # self-similarity extremes
    assert float(voc.score_l1(qa, qa)) > 0.999
    assert float(voc.score_kl(qa, qa)) < 1e-5


def test_orbvoc_text_roundtrip(rng, tmp_path):
    """save_orbvoc_text -> load_orbvoc_text preserves transform exactly
    (word assignment + idf weights) — the DBoW2 ORBvoc.txt format,
    TemplatedVocabulary.h:1338."""
    corpus = rand_desc(rng, 2000)
    v = voc.train(corpus, k=3, levels=3, seed=5)
    p = str(tmp_path / "voc.txt")
    voc.save_orbvoc_text(p, v)
    v2 = voc.load_orbvoc_text(p)
    assert v2.k == 3 and v2.levels == 3
    q = rand_desc(rng, 200)
    ones = jnp.ones(200, bool)
    b1 = voc.transform(v, jnp.asarray(q), ones)
    b2 = voc.transform(v2, jnp.asarray(q), ones)
    np.testing.assert_array_equal(np.asarray(b1.word), np.asarray(b2.word))
    np.testing.assert_allclose(np.asarray(b1.weight),
                               np.asarray(b2.weight), rtol=1e-6)


def test_orbvoc_text_incomplete_tree(tmp_path):
    """DBoW2 trees need not be complete: leaves can sit above the bottom
    and nodes can have < k children. The importer's hole filling must
    keep descent exact — real children always beat their pad copies."""
    def line(parent, leaf, desc_byte, weight):
        d = " ".join([str(desc_byte)] * 32)
        return f"{parent} {leaf} {d} {weight}\n"
    # k=2, L=2. Root children: node1 (leaf at level 0! desc 0x00,
    # weight .7), node2 (internal, desc 0xFF). node2 has ONE child:
    # node3 (leaf, desc 0xF0, weight .3) — second slot is a hole.
    p = str(tmp_path / "voc.txt")
    with open(p, "w") as f:
        f.write("2 2  0 0\n")
        f.write(line(0, 1, 0, 0.7))      # node1: shallow leaf
        f.write(line(0, 0, 255, 0.0))    # node2: internal
        f.write(line(2, 1, 240, 0.3))    # node3: node2's only child
    v = voc.load_orbvoc_text(p)
    assert v.n_words == 4
    # descriptor near 0x00 -> descends into node1's propagated subtree,
    # lands on its leftmost bottom word (id 0) with weight .7
    q = np.zeros((1, 8), np.uint32)
    bv = voc.transform(v, jnp.asarray(q), jnp.ones(1, bool))
    assert int(bv.word[0]) == 0
    np.testing.assert_allclose(float(bv.weight[0]), 0.7, rtol=1e-6)
    # descriptor 0xFF... -> node2, then node3 beats its hole-pad copy
    # (equal distance, smaller index wins) -> word id 2, weight .3
    q2 = np.full((1, 8), 0xFFFFFFFF, np.uint32)
    bv2 = voc.transform(v, jnp.asarray(q2), jnp.ones(1, bool))
    assert int(bv2.word[0]) == 2
    np.testing.assert_allclose(float(bv2.weight[0]), 0.3, rtol=1e-6)


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

"""Visual vocabulary: tensorized bag-of-binary-words.

TPU-native equivalent of DBoW2's TemplatedVocabulary + FORB
(/root/reference/Thirdparty/DBoW2/DBoW2/TemplatedVocabulary.h — k-ary tree
of 256-bit ORB centroids, `transform` descriptor->word, L1 `score`;
FORB.cpp:193 Hamming distance + meanValue bit-vote). The pointer tree
becomes a dense per-level child table: descent for ALL descriptors of a
frame is L gather+argmin steps on the MXU (Hamming via bipolar matmul
against each level's candidate centroids).

Also provides training (binary k-medians, the k-means++ style seeding of
DBoW2's `HKmeansStep`) so the framework can build vocabularies from any
corpus — the reference ships a pretrained 1M-word text file instead
(ORBvoc.txt, loadFromTextFile TemplatedVocabulary.h:1338); `save`/`load`
use .npz.

BoW vectors are fixed-shape sparse: per frame, the (word id, tf weight)
of each descriptor; scoring/accumulation uses segment sums.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import hamming as hm


class Vocabulary(NamedTuple):
    """Packed k^L-ary tree. Level l has k^(l+1) nodes; children of node n at
    level l are nodes [n*k, (n+1)*k) at level l+1 (implicit heap layout).

    centroids[l]: [k^(l+1), 8] uint32 — centroid descriptors per level.
    weights: [k^L] float32 — idf weight per leaf word.
    k, levels: branching factor and depth.
    """

    centroids: tuple      # tuple of [k^(l+1), 8] uint32 arrays
    weights: jnp.ndarray  # [n_words]
    k: int
    levels: int

    @property
    def n_words(self):
        return self.k ** self.levels


# ----------------------------------------------------------------------------
# training (host/numpy: one-off offline step)
# ----------------------------------------------------------------------------

_POPCNT8 = np.array([bin(i).count("1") for i in range(256)], np.uint8)


def _hamming_np(a, b, block=1 << 16):
    """[N,8]x[M,8] uint32 -> [N,M] int popcount distances (numpy).

    Popcount via byte LUT, blocked over N: the naive unpackbits form
    materializes [N, M, 256] bytes — 7+ GB at the corpus sizes a trained
    10^6-word tree needs (root k-medians over ~3M descriptors)."""
    if len(a) <= block:
        x = np.bitwise_xor(a[:, None, :], b[None, :, :]).view(np.uint8)
        return _POPCNT8[x].sum(-1, dtype=np.int32)
    out = np.empty((len(a), len(b)), np.int32)
    for i in range(0, len(a), block):
        out[i:i + block] = _hamming_np(a[i:i + block], b, block)
    return out


def _bit_vote_mean(desc):
    """Majority-vote mean of binary descriptors (FORB::meanValue)."""
    if len(desc) == 0:
        return np.zeros(8, np.uint32)
    bits = np.unpackbits(desc.view(np.uint8), axis=-1,
                         bitorder="little")            # [N, 256]
    mean = (bits.sum(0) * 2 >= len(desc)).astype(np.uint8)
    return np.packbits(mean, bitorder="little").view(np.uint32)


def _kmedians(desc, k, rs, iters=8):
    """Binary k-medians with k-means++-ish seeding; returns [k,8] uint32."""
    n = len(desc)
    if n <= k:
        out = np.zeros((k, 8), np.uint32)
        out[:n] = desc
        if n > 0:
            out[n:] = desc[rs.randint(0, n, k - n)]
        return out
    centers = [desc[rs.randint(n)]]
    for _ in range(k - 1):
        d = _hamming_np(desc, np.stack(centers)).min(1).astype(np.float64)
        s = d.sum()
        if s <= 0:        # all members equal the centers (duplicate-heavy
            centers.append(desc[rs.randint(n)])   # deep node): uniform
            continue
        centers.append(desc[rs.choice(n, p=d / s)])
    C = np.stack(centers)
    for _ in range(iters):
        assign = _hamming_np(desc, C).argmin(1)
        newC = np.stack([
            _bit_vote_mean(desc[assign == j]) if (assign == j).any()
            else desc[rs.randint(n)] for j in range(k)])
        if (newC == C).all():
            break
        C = newC
    return C


def train(descriptors: np.ndarray, k: int = 10, levels: int = 4,
          seed: int = 0, max_train: int = 200_000) -> Vocabulary:
    """Build a k^levels vocabulary from a [N, 8] uint32 descriptor corpus."""
    rs = np.random.RandomState(seed)
    desc = np.asarray(descriptors, np.uint32)
    if len(desc) > max_train:
        desc = desc[rs.choice(len(desc), max_train, replace=False)]

    # recursively split; store centroids level by level in heap layout
    cents = [np.zeros((k ** (l + 1), 8), np.uint32)
             for l in range(levels)]
    groups = {0: desc}           # node index at current level -> members
    for l in range(levels):
        next_groups = {}
        for node in range(k ** l):
            members = groups.get(node, np.zeros((0, 8), np.uint32))
            C = _kmedians(members, k, rs)
            cents[l][node * k:(node + 1) * k] = C
            if len(members):
                assign = _hamming_np(members, C).argmin(1)
                for j in range(k):
                    sel = members[assign == j]
                    if len(sel):
                        next_groups[node * k + j] = sel
        groups = next_groups

    # idf weights from training corpus occupancy (DBoW2 TF_IDF default).
    # Assignment by TREE DESCENT (k comparisons per level), matching
    # `transform` exactly — brute force against all k^levels leaves would
    # be O(n_words) per descriptor and unusable at 10^4+ words.
    def descend(block):
        node = np.zeros(len(block), np.int64)
        for l in range(levels):
            idx = node[:, None] * k + np.arange(k)[None, :]   # [n, k]
            cand = cents[l][idx]                              # [n, k, 8]
            x = np.bitwise_xor(cand, block[:, None, :])
            d = np.unpackbits(x.view(np.uint8), axis=-1).sum(-1)
            node = idx[np.arange(len(block)), d.argmin(1)]
        return node

    assign = np.concatenate([
        descend(desc[i:i + 32768]) for i in range(0, len(desc), 32768)]) \
        if len(desc) else np.zeros(0, np.int64)
    counts = np.bincount(assign, minlength=k ** levels)
    n_docs = max(len(desc) / 500.0, 1.0)   # pseudo-documents of 500 feats
    idf = np.log(n_docs / np.maximum(counts / 500.0, 1e-3))
    idf = np.clip(idf, 0.1, None).astype(np.float32)
    return Vocabulary(tuple(jnp.asarray(c) for c in cents),
                      jnp.asarray(idf), k, levels)


def default_vocab_path():
    """Path of the shipped pretrained vocabulary asset (trained offline by
    tools/train_vocab.py on the synthetic multi-trajectory corpus — the
    analog of the reference's bundled ORBvoc.txt), or None if absent.
    Prefers the 10^5-word tree (k=10, levels=5); the 10^4 tree remains as
    a smaller fallback. A reference ORBvoc.txt (10^6 words) drops in via
    `load_orbvoc_text` + `save` + cfg.vocabulary.path."""
    import os
    base = os.path.join(os.path.dirname(__file__), "..", "assets")
    for name in ("vocab_synth_100k.npz", "vocab_synth.npz"):
        p = os.path.join(base, name)
        if os.path.exists(p):
            return p
    return None


def load_orbvoc_text(path: str) -> Vocabulary:
    """Import a DBoW2 text vocabulary (the reference's bundled
    Vocabulary/ORBvoc.txt, written by TemplatedVocabulary::saveToTextFile
    and read by loadFromTextFile, /root/reference/Thirdparty/DBoW2/DBoW2/
    TemplatedVocabulary.h:1338-1422).

    Format: header `k L scoring weighting`; then one node per line
    `parent_id is_leaf b0..b31 weight`, node ids implicit (1-based, file
    order; parents always precede children), leaves possible at ANY depth
    (a cluster with < k members ends early).

    DBoW2's pointer tree maps onto this module's COMPLETE k-ary heap
    layout: each node's children occupy heap rows [r*k, (r+1)*k) of the
    next level. Holes are filled so descent behavior is preserved:
    - missing siblings copy the group's first real child (Hamming ties
      resolve to the smaller index, so a real child always wins);
    - a leaf above the bottom propagates its descriptor down the whole
      subtree (descent through the copies reaches the leftmost bottom
      word, which carries the leaf's idf weight).
    All fill passes are vectorized per level — importing the ~10^6-word
    ORBvoc.txt takes seconds, not minutes.
    """
    with open(path) as f:
        hdr = f.readline().split()
        k, L = int(hdr[0]), int(hdr[1])
        if not (0 < k <= 20 and 1 <= L <= 10):
            raise ValueError(f"not a DBoW2 text vocabulary header: {hdr}")
        rows = np.loadtxt(f, dtype=np.float64, ndmin=2)
    if rows.shape[1] != 2 + 32 + 1:
        raise ValueError(f"expected 35 columns/node, got {rows.shape[1]}")
    n = rows.shape[0]
    parent = rows[:, 0].astype(np.int64)           # node id (0=root)
    is_leaf = rows[:, 1] > 0
    desc = np.ascontiguousarray(
        rows[:, 2:34].astype(np.uint8)).view(np.uint32)   # [n, 8]
    w_leaf = rows[:, 34].astype(np.float32)

    # child rank within parent (children keep file order, = DBoW2 order)
    order = np.argsort(parent, kind="stable")
    sp = parent[order]
    group_start = np.r_[0, np.flatnonzero(sp[1:] != sp[:-1]) + 1]
    counts = np.diff(np.r_[group_start, n])
    rank_sorted = np.arange(n) - np.repeat(group_start, counts)
    child_rank = np.empty(n, np.int64)
    child_rank[order] = rank_sorted
    if (child_rank >= k).any():
        raise ValueError("node with more than k children")

    # level + heap row per node (wave propagation: parents precede
    # children in id order, trees are <= L deep -> L passes suffice)
    lev = np.full(n + 1, -2, np.int64)     # indexed by node id; root = -1
    heap = np.zeros(n + 1, np.int64)
    lev[0] = -1
    ids = np.arange(1, n + 1)
    for _ in range(L + 1):
        known = lev[parent] != -2
        upd = (lev[ids] == -2) & known
        lev[ids[upd]] = lev[parent[upd]] + 1
        heap[ids[upd]] = heap[parent[upd]] * k + child_rank[upd]
        if not upd.any():
            break
    if (lev[1:] < 0).any() or (lev[1:] >= L).any():
        raise ValueError("malformed tree: node level out of [0, L)")

    cents = [np.zeros((k ** (l + 1), 8), np.uint32) for l in range(L)]
    filled = [np.zeros(k ** (l + 1), bool) for l in range(L)]
    wts = np.zeros(k ** L, np.float32)
    for l in range(L):
        sel = lev[1:] == l
        cents[l][heap[1:][sel]] = desc[sel]
        filled[l][heap[1:][sel]] = True
    # hole filling, top level downward (vectorized per level)
    for l in range(L):
        g_desc = cents[l].reshape(-1, k, 8)
        g_fill = filled[l].reshape(-1, k)
        any_fill = g_fill.any(1)
        first = g_fill.argmax(1)                       # rank of first real
        gi = np.arange(g_fill.shape[0])
        sib = g_desc[gi, first]                        # [G, 8]
        if l == 0:                                     # one group: the root
            fill_src = sib
        else:
            # a group with no real child = a propagated-leaf subtree:
            # copy the parent's descriptor down
            fill_src = np.where(any_fill[:, None], sib, cents[l - 1])
        g_desc[:] = np.where(g_fill[:, :, None], g_desc,
                             fill_src[:, None, :])
        filled[l][:] = True
    # leaf idf weights: a leaf at level l owns the leftmost bottom word
    # of its propagated subtree
    leaf_sel = is_leaf
    word = heap[1:][leaf_sel] * (k ** (L - 1 - lev[1:][leaf_sel]))
    wts[word] = w_leaf[leaf_sel]
    return Vocabulary(tuple(jnp.asarray(c) for c in cents),
                      jnp.asarray(wts), k, L)


def save_orbvoc_text(path: str, voc: Vocabulary):
    """Export to the DBoW2 text format (saveToTextFile analog,
    TemplatedVocabulary.h:1428-1449) — round-trip partner of
    load_orbvoc_text; writes the complete heap tree (scoring=L1_NORM=0,
    weighting=TF_IDF=0)."""
    k, L = voc.k, voc.levels
    with open(path, "w") as f:
        f.write(f"{k} {L}  0 0\n")
        # file order must put parents before children: level by level;
        # node id of heap row r at level l is offset(l) + r + 1
        offs = np.cumsum([0] + [k ** (l + 1) for l in range(L)])
        wts = np.asarray(voc.weights)
        for l in range(L):
            C = np.asarray(voc.centroids[l]).view(np.uint8).reshape(-1, 32)
            par = (np.zeros(len(C), np.int64) if l == 0
                   else offs[l - 1] + np.arange(len(C)) // k + 1)
            leaf = 1 if l == L - 1 else 0
            for r in range(len(C)):
                d = " ".join(str(int(b)) for b in C[r])
                w = float(wts[r]) if leaf else 0.0
                f.write(f"{par[r]} {leaf} {d} {w}\n")


def save(path: str, voc: Vocabulary):
    np.savez_compressed(
        path, k=voc.k, levels=voc.levels, weights=np.asarray(voc.weights),
        **{f"c{l}": np.asarray(c) for l, c in enumerate(voc.centroids)})


def load(path: str) -> Vocabulary:
    z = np.load(path)
    k = int(z["k"]); levels = int(z["levels"])
    cents = tuple(jnp.asarray(z[f"c{l}"]) for l in range(levels))
    return Vocabulary(cents, jnp.asarray(z["weights"]), k, levels)


# ----------------------------------------------------------------------------
# transform + scoring (device)
# ----------------------------------------------------------------------------

class BowVector(NamedTuple):
    """Fixed-shape sparse BoW: per keypoint slot, its word + node ids."""

    word: jnp.ndarray     # [N] int32 leaf word id (-1 invalid)
    node: jnp.ndarray     # [N] int32 direct-index node id at di_level
    weight: jnp.ndarray   # [N] float32 idf weight of the word


@functools.partial(jax.jit, static_argnames=("voc_k", "voc_levels",
                                             "di_level"))
def _transform_impl(centroids, weights, desc, valid, voc_k: int,
                    voc_levels: int, di_level: int) -> BowVector:
    N = desc.shape[0]
    node = jnp.zeros(N, jnp.int32)
    di_node = jnp.zeros(N, jnp.int32)
    for l in range(voc_levels):
        cand = centroids[l]                          # [k^(l+1), 8]
        # children of `node`: rows node*k .. node*k+k-1
        child_base = node * voc_k
        # gather each descriptor's k candidate centroids -> hamming argmin.
        idx = child_base[:, None] + jnp.arange(voc_k)[None, :]   # [N, k]
        cand_desc = cand[idx]                        # [N, k, 8]
        d = hm.popcount32(jnp.bitwise_xor(
            cand_desc, desc[:, None, :])).sum(-1)    # [N, k]
        best = jnp.argmin(d, axis=1).astype(jnp.int32)
        node = child_base + best
        if l == di_level:
            di_node = node
    word = jnp.where(valid, node, -1)
    w = jnp.where(valid, weights[jnp.clip(node, 0, weights.shape[0] - 1)],
                  0.0)
    return BowVector(word, jnp.where(valid, di_node, -1), w)


def transform(voc: Vocabulary, desc, valid, di_level: int = 2) -> BowVector:
    """All descriptors of a frame -> words + direct-index nodes, one pass
    (DBoW2 transform with levelsup, used by Frame::ComputeBoW
    /root/reference/src/Frame.cc:803-810)."""
    return _transform_impl(voc.centroids, voc.weights, desc, valid,
                           voc.k, voc.levels, di_level)


@functools.partial(jax.jit, static_argnames=("n_words",))
def bow_histogram(bv: BowVector, n_words: int):
    """Dense L1-normalized tf-idf histogram [n_words] (for scoring).

    O(n_words) memory — use only for small vocabularies / tests; the
    production scoring path is `sparse_bow` + kfdb searchsorted
    intersection, whose cost is independent of n_words."""
    w = jnp.where(bv.word >= 0, bv.weight, 0.0)
    hist = jnp.zeros(n_words + 1).at[
        jnp.where(bv.word >= 0, bv.word, n_words)].add(w)[:n_words]
    return hist / jnp.maximum(jnp.sum(jnp.abs(hist)), 1e-9)


# sorts after every real word id (vocabularies are < 2^30 words); pad
# value of SparseBow.word so searchsorted never matches a pad
PAD_WORD = np.int32(1 << 30)


class SparseBow(NamedTuple):
    """Fixed-shape sparse L1-normalized tf-idf vector of ONE frame.

    The scalable replacement of `bow_histogram`: a frame touches at most
    n_keypoints distinct words, so the vector is (word, weight) pairs
    SORTED by word id, padded with PAD_WORD — no [n_words] array is ever
    materialized, keeping query cost independent of vocabulary size
    (the reference's ORBvoc has ~10^6 words,
    /root/reference/Thirdparty/DBoW2/DBoW2/TemplatedVocabulary.h)."""

    word: jnp.ndarray     # [W] int32, ascending, PAD_WORD padding
    weight: jnp.ndarray   # [W] float32 (0 at pads), L1-normalized


@functools.partial(jax.jit, static_argnames=("top_w",))
def _sparse_bow_impl(word, weight, top_w: int):
    N = word.shape[0]
    wid = jnp.where(word >= 0, word, PAD_WORD)
    order = jnp.argsort(wid)
    sw = wid[order]
    wt = jnp.where(word >= 0, weight, 0.0)[order]
    # first occurrence of each distinct word in the sorted run
    first = jnp.concatenate([jnp.ones((1,), bool), sw[1:] != sw[:-1]])
    first = first & (sw < PAD_WORD)
    # segment-sum duplicate words into their first-occurrence slot
    seg = jnp.clip(jnp.cumsum(first.astype(jnp.int32)) - 1, 0, N - 1)
    sums = jnp.zeros(N, wt.dtype).at[seg].add(wt)
    u_weight = jnp.where(first, sums[seg], 0.0)
    u_word = jnp.where(first, sw, PAD_WORD)
    # keep the top_w heaviest words (exact when distinct words <= top_w),
    # then re-sort by word id for searchsorted consumers
    kk = min(top_w, N)
    vals, idx = jax.lax.top_k(u_weight, kk)
    sel_word = jnp.where(vals > 0, u_word[idx], PAD_WORD)
    o2 = jnp.argsort(sel_word)
    sel_word = sel_word[o2]
    sel_weight = jnp.where(sel_word < PAD_WORD, vals[o2], 0.0)
    if kk < top_w:
        sel_word = jnp.concatenate(
            [sel_word, jnp.full((top_w - kk,), PAD_WORD, sel_word.dtype)])
        sel_weight = jnp.concatenate(
            [sel_weight, jnp.zeros(top_w - kk, sel_weight.dtype)])
    denom = jnp.maximum(jnp.sum(wt), 1e-9)     # L1 norm of the FULL vector
    return SparseBow(sel_word.astype(jnp.int32), sel_weight / denom)


def sparse_bow(bv: BowVector, top_w: int = 1024) -> SparseBow:
    """BowVector -> fixed-shape sparse tf-idf vector (duplicates summed,
    L1-normalized, sorted by word)."""
    return _sparse_bow_impl(bv.word, bv.weight, top_w)


@jax.jit
def l1_score(hist_a, hist_b):
    """DBoW2 L1 similarity in [0,1]: 1 - 0.5*|a/|a| - b/|b||_1
    (ScoringObject.h L1Norm)."""
    return 1.0 - 0.5 * jnp.sum(jnp.abs(hist_a - hist_b), axis=-1)


# ----------------------------------------------------------------------------
# DBoW2 scoring family on sparse vectors
# (ScoringObject.cpp: L1, L2, ChiSquare, KL, Bhattacharyya, DotProduct —
# ORB-SLAM2 uses L1; the rest complete the vendored-library surface)
# ----------------------------------------------------------------------------

def _sparse_gather(q: SparseBow, w: SparseBow):
    """(q_i, w_i) aligned on w's support via binary search of q."""
    Wq = q.word.shape[0]
    pos = jnp.clip(jnp.searchsorted(q.word, w.word), 0, Wq - 1)
    hit = (q.word[pos] == w.word) & (w.word < PAD_WORD)
    return jnp.where(hit, q.weight[pos], 0.0), w.weight, hit


@jax.jit
def score_l1(q: SparseBow, w: SparseBow):
    """1 - 0.5|q - w|_1 == sum_i min(q_i, w_i) for L1-normalized inputs."""
    qv, wv, hit = _sparse_gather(q, w)
    return jnp.sum(jnp.where(hit, jnp.minimum(qv, wv), 0.0))


@jax.jit
def score_l2(q: SparseBow, w: SparseBow):
    """1 - 0.5|q/|q|_2 - w/|w|_2|_2 expanded: needs only the dot product
    over the intersection (ScoringObject.cpp L2Scoring)."""
    nq = jnp.sqrt(jnp.maximum(jnp.sum(q.weight ** 2), 1e-18))
    nw = jnp.sqrt(jnp.maximum(jnp.sum(w.weight ** 2), 1e-18))
    qv, wv, hit = _sparse_gather(q, w)
    dot = jnp.sum(jnp.where(hit, qv * wv, 0.0)) / (nq * nw)
    return 1.0 - jnp.sqrt(jnp.maximum(1.0 - dot, 0.0))


@jax.jit
def score_chi_square(q: SparseBow, w: SparseBow):
    """sum_i 2 q_i w_i / (q_i + w_i) (the intersection-only form DBoW2
    accumulates; zero terms vanish)."""
    qv, wv, hit = _sparse_gather(q, w)
    return jnp.sum(jnp.where(hit, 2.0 * qv * wv
                             / jnp.maximum(qv + wv, 1e-18), 0.0))


@jax.jit
def score_bhattacharyya(q: SparseBow, w: SparseBow):
    qv, wv, hit = _sparse_gather(q, w)
    return jnp.sum(jnp.where(hit, jnp.sqrt(qv * wv), 0.0))


@jax.jit
def score_dot(q: SparseBow, w: SparseBow):
    qv, wv, hit = _sparse_gather(q, w)
    return jnp.sum(jnp.where(hit, qv * wv, 0.0))


@jax.jit
def score_kl(q: SparseBow, w: SparseBow):
    """KL(q || w) with DBoW2's LOG_EPS floor for words of q missing from
    w (ScoringObject.cpp KLScoring; lower = more similar)."""
    LOG_EPS = jnp.log(jnp.float32(2.2204460492503131e-16))
    Ww = w.word.shape[0]
    pos = jnp.clip(jnp.searchsorted(w.word, q.word), 0, Ww - 1)
    hit = (w.word[pos] == q.word) & (q.word < PAD_WORD)
    real = q.word < PAD_WORD
    wv = jnp.where(hit, w.weight[pos], 0.0)
    lq = jnp.log(jnp.maximum(q.weight, 1e-18))
    term = jnp.where(hit, lq - jnp.log(jnp.maximum(wv, 1e-18)),
                     lq - LOG_EPS)
    return jnp.sum(jnp.where(real & (q.weight > 0), q.weight * term, 0.0))

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

def _hamming_np(a, b):
    """[N,8]x[M,8] uint32 -> [N,M] int popcount distances (numpy)."""
    x = np.bitwise_xor(a[:, None, :], b[None, :, :])
    return np.unpackbits(x.view(np.uint8), axis=-1).sum(-1)


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
        p = d / max(d.sum(), 1e-9)
        centers.append(desc[rs.choice(n, p=p)])
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
    analog of the reference's bundled ORBvoc.txt), or None if absent."""
    import os
    p = os.path.join(os.path.dirname(__file__), "..", "assets",
                     "vocab_synth.npz")
    return p if os.path.exists(p) else None


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
    """Dense L1-normalized tf-idf histogram [n_words] (for scoring)."""
    w = jnp.where(bv.word >= 0, bv.weight, 0.0)
    hist = jnp.zeros(n_words + 1).at[
        jnp.where(bv.word >= 0, bv.word, n_words)].add(w)[:n_words]
    return hist / jnp.maximum(jnp.sum(jnp.abs(hist)), 1e-9)


@jax.jit
def l1_score(hist_a, hist_b):
    """DBoW2 L1 similarity in [0,1]: 1 - 0.5*|a/|a| - b/|b||_1
    (ScoringObject.h L1Norm)."""
    return 1.0 - 0.5 * jnp.sum(jnp.abs(hist_a - hist_b), axis=-1)

"""Keyframe database for loop detection and relocalization.

TPU-native redesign of KeyFrameDatabase (/root/reference/src/
KeyFrameDatabase.cc:40-311). The inverted file (word -> keyframe list)
becomes a SPARSE per-keyframe word list: each KF stores its top-W
(word id, tf-idf weight) pairs SORTED by word, so database memory is
[K, W] — independent of vocabulary size (the reference's vocabulary has
~10^6 words; a dense [K, n_words] matrix would not scale past ~10^4).

Scoring uses the identity: for L1-normalized histograms q, w,
    1 - 0.5*|q - w|_1  ==  sum_i min(q_i, w_i),
which only needs the INTERSECTION of supports. The query arrives as a
SparseBow (sorted (word, weight) pairs, models/vocabulary.py) and each
stored row intersects it by binary search (searchsorted) — cost
O(K * W * log Wq), INDEPENDENT of n_words; no [n_words] array is ever
materialized on either side. Exact when W covers every nonzero word of
the KF (distinct words per KF <= keypoints), a top-weight truncation
otherwise. The candidate logic (share >= 0.8*max, score >= min_score,
covisibility-group accumulation, 0.75*best cut — ref :76-198) is
unchanged masked reductions.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models.vocabulary import BowVector, SparseBow, PAD_WORD

# default per-KF sparse capacity: >= distinct words of a 1000-feature frame
TOP_WORDS = 1024


class KFDatabase(NamedTuple):
    word: jnp.ndarray       # [K, W] int32 word ids sorted asc (-1 = empty)
    weight: jnp.ndarray     # [K, W] float32 L1-normalized tf-idf weights
    valid: jnp.ndarray      # [K] bool

    @staticmethod
    def empty(K: int, top_w: int = TOP_WORDS) -> "KFDatabase":
        return KFDatabase(jnp.full((K, top_w), -1, jnp.int32),
                          jnp.zeros((K, top_w), jnp.float32),
                          jnp.zeros(K, bool))


@jax.jit
def add(db: KFDatabase, k, sb: SparseBow) -> KFDatabase:
    """Insert keyframe k's sparse BoW vector as a row (top-W words,
    sorted by word id; PAD_WORD pads become -1)."""
    word = jnp.where(sb.word < PAD_WORD, sb.word, -1)
    return KFDatabase(db.word.at[k].set(word),
                      db.weight.at[k].set(sb.weight),
                      db.valid.at[k].set(True))


@jax.jit
def erase(db: KFDatabase, k) -> KFDatabase:
    return db._replace(valid=db.valid.at[k].set(False))


@jax.jit
def scores(db: KFDatabase, sb: SparseBow):
    """L1 similarity of the query vs every stored KF: sum_i min(q_i, w_i)
    over the support intersection, found by binary search of each stored
    word in the sorted query vector. Returns ([K] score, [K] shared-word
    count). Cost independent of vocabulary size."""
    Wq = sb.word.shape[0]
    pos = jnp.clip(jnp.searchsorted(sb.word, db.word), 0, Wq - 1)
    hit = (sb.word[pos] == db.word) & (db.word >= 0)
    qv = jnp.where(hit, sb.weight[pos], 0.0)
    s = jnp.sum(jnp.where(hit, jnp.minimum(qv, db.weight), 0.0), axis=1)
    shared = jnp.sum(hit, axis=1).astype(jnp.int32)
    return s, shared


class Candidates(NamedTuple):
    score: jnp.ndarray       # [K] L1 similarity (0 where filtered out)
    shared: jnp.ndarray      # [K] shared-word counts
    accumulated: jnp.ndarray  # [K] covisibility-group accumulated score


@jax.jit
def query(db: KFDatabase, sb: SparseBow, covis, exclude_mask,
          min_score=0.0) -> Candidates:
    """Score a query BoW against all keyframes.

    covis: [K, K] covisibility weights (for group accumulation, ref
    :147-186); exclude_mask: [K] bool keyframes to ignore (the query's own
    covisible set for loop detection, ref :87-95).
    Implements: share-word count gate (>= 0.8 * max, ref :121-133), L1
    score gate (>= min_score), and accumulated group score.
    """
    score, shared = scores(db, sb)
    shared = jnp.where(db.valid & ~exclude_mask, shared, 0)
    max_shared = jnp.max(shared)
    ok = shared >= jnp.maximum((0.8 * max_shared).astype(jnp.int32), 1)
    score = jnp.where(ok & (score >= min_score), score, 0.0)

    # group accumulation: each candidate's score + scores of its top-10
    # covisible KFs that are also candidates
    w = covis * (score > 0)[None, :]
    topw, topi = jax.lax.top_k(w, min(10, w.shape[1]))
    group = score + jnp.sum(jnp.where(topw > 0, score[topi], 0.0), axis=1)
    group = jnp.where(score > 0, group, 0.0)
    # final cut: accumulated >= 0.75 * best accumulated (ref :188-198)
    best = jnp.max(group)
    final = jnp.where(group >= 0.75 * best, score, 0.0)
    return Candidates(final, shared, group)

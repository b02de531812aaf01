"""Keyframe database for loop detection and relocalization.

TPU-native redesign of KeyFrameDatabase (/root/reference/src/
KeyFrameDatabase.cc:40-311): the inverted file (word -> keyframe list) is
replaced by a dense [K, n_words] tf-idf matrix; share-word counting and L1
scoring over ALL keyframes are single MXU matmuls — at K<=1024,
n_words<=10^4 this is strictly faster than list walks, and the candidate
logic (share >= 0.8*max, score >= min_score, covisibility-group
accumulation, 0.75*best cut — ref :76-198) becomes masked reductions.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models.vocabulary import BowVector, bow_histogram


class KFDatabase(NamedTuple):
    hists: jnp.ndarray      # [K, n_words] L1-normalized tf-idf
    has: jnp.ndarray        # [K, n_words] bool word-presence
    valid: jnp.ndarray      # [K] bool

    @staticmethod
    def empty(K: int, n_words: int) -> "KFDatabase":
        return KFDatabase(jnp.zeros((K, n_words), jnp.float32),
                          jnp.zeros((K, n_words), bool),
                          jnp.zeros(K, bool))


@jax.jit
def add(db: KFDatabase, k, hist) -> KFDatabase:
    return KFDatabase(db.hists.at[k].set(hist), db.has.at[k].set(hist > 0),
                      db.valid.at[k].set(True))


@jax.jit
def erase(db: KFDatabase, k) -> KFDatabase:
    return db._replace(valid=db.valid.at[k].set(False))


class Candidates(NamedTuple):
    score: jnp.ndarray       # [K] L1 similarity (0 where filtered out)
    shared: jnp.ndarray      # [K] shared-word counts
    accumulated: jnp.ndarray  # [K] covisibility-group accumulated score


@jax.jit
def query(db: KFDatabase, hist, covis, exclude_mask,
          min_score=0.0) -> Candidates:
    """Score a query BoW against all keyframes.

    covis: [K, K] covisibility weights (for group accumulation, ref
    :147-186); exclude_mask: [K] bool keyframes to ignore (the query's own
    covisible set for loop detection, ref :87-95).
    Implements: share-word count gate (>= 0.8 * max, ref :121-133), L1
    score gate (>= min_score), and accumulated group score.
    """
    has_q = hist > 0
    shared = jnp.sum(db.has & has_q[None, :], axis=1).astype(jnp.int32)
    shared = jnp.where(db.valid & ~exclude_mask, shared, 0)
    max_shared = jnp.max(shared)
    ok = shared >= jnp.maximum((0.8 * max_shared).astype(jnp.int32), 1)

    score = 1.0 - 0.5 * jnp.sum(jnp.abs(db.hists - hist[None, :]), axis=1)
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

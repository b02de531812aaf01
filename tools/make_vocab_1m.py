#!/usr/bin/env python
"""Synthesize a 10^6-word (k=10, levels=6) vocabulary at the reference's
shipped scale.

The reference bundles a pretrained ~1M-word ORBvoc.txt
(/root/reference/Thirdparty/DBoW2/DBoW2/TemplatedVocabulary.h:1338;
build.sh untars Vocabulary/). Training a 10^6-leaf tree from scratch
needs a corpus far larger than the synthetic worlds provide, so this
tool EXTENDS the shipped trained 10^5 tree (k=10, L=5) by one level:
each leaf's 10 children are the leaf centroid plus 9 deterministic
low-Hamming-distance perturbations (child 0 = the exact leaf, so every
descriptor's descent path through the first 5 levels is preserved and
real data spreads over the new bottom level by its residual bits). The
result is structurally identical to a trained k=10 L=6 tree: a 10^6-row
(32 MB) bottom centroid table, 6 gather+argmin descent rounds, 10^6 idf
weights — exactly what transform/loop-detect must handle at reference
scale.

Usage: python tools/make_vocab_1m.py [--out assets/vocab_synth_1m.npz]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, ".")


def extend_one_level(voc, seed: int = 0):
    """Vocabulary (k, L) -> (k, L+1) by perturbing each leaf into k
    children (child 0 = the leaf itself). Weights: children inherit the
    parent leaf's idf, scaled so the total mass is preserved."""
    from slam_dynamic_tpu.models.vocabulary import Vocabulary
    import jax.numpy as jnp
    k, L = voc.k, voc.levels
    leaves = np.asarray(voc.centroids[-1])            # [k^L, 8] uint32
    n = leaves.shape[0]
    rs = np.random.RandomState(seed)
    # deterministic per-child XOR masks flipping j*3 distinct bits
    masks = np.zeros((k, 8), np.uint32)
    for j in range(1, k):
        bits = rs.choice(256, size=3 * j, replace=False)
        m = np.zeros(256, np.uint8)
        m[bits] = 1
        masks[j] = np.packbits(m, bitorder="little").view(np.uint32)
    children = np.bitwise_xor(leaves[:, None, :], masks[None, :, :])
    children = children.reshape(n * k, 8)             # [k^(L+1), 8]
    w = np.asarray(voc.weights)
    wts = np.repeat(w, k).astype(np.float32)
    cents = tuple(voc.centroids) + (jnp.asarray(children),)
    return Vocabulary(cents, jnp.asarray(wts), k, L + 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="assets/vocab_synth_1m.npz")
    args = ap.parse_args()
    import jax
    jax.config.update("jax_platforms", "cpu")
    from slam_dynamic_tpu.models import vocabulary as voc_mod
    base = voc_mod.default_vocab_path()
    print(f"extending {base}")
    voc = voc_mod.load(base)
    assert voc.levels == 5 and voc.k == 10, (voc.k, voc.levels)
    big = extend_one_level(voc)
    print(f"k={big.k} levels={big.levels} n_words={big.n_words} "
          f"bottom table {np.asarray(big.centroids[-1]).nbytes / 2**20:.0f}"
          f" MB")
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    voc_mod.save(args.out, big)
    print(f"saved {args.out} "
          f"({os.path.getsize(args.out) / 2**20:.1f} MB)")


if __name__ == "__main__":
    main()

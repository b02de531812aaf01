#!/usr/bin/env python
"""Place-recognition recall: trained 10^6 tree vs leaf-extended vs 10^5.

The reference ships a ~1M-word vocabulary TRAINED on real imagery
(/root/reference/Thirdparty/DBoW2/DBoW2/TemplatedVocabulary.h:1338 loads
it; build.sh untars it). The repo has shipped two 10^6 trees: a
leaf-EXTENSION of the trained 10^5 tree (tools/make_vocab_1m.py) and,
since round 5, a tree trained end-to-end on a ~3M-descriptor synthetic
corpus (tools/train_vocab.py --levels 6 --sequences 48). This benchmark
measures what the training buys on HELD-OUT worlds (seeds disjoint from
every training seed).

Protocol: S held-out sequences; every `stride`th frame of each goes into
one shared KFDatabase; every other frame queries it. A query is correct
(recall@1) when the top-scoring database entry is a temporal neighbor
(within one insertion) from the SAME sequence — cross-sequence hits are
confusions. `margin` is the mean ratio of the best-correct score to the
best WRONG-sequence score (discriminability; >1 means separable).

Usage: python tools/vocab_recall_bench.py [--sequences 4] [--frames 50]
"""
import argparse
import os
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from slam_dynamic_tpu.config import ORBConfig  # noqa: E402
from slam_dynamic_tpu.frontend.extractor import extract_np  # noqa: E402
from slam_dynamic_tpu.io.synthetic import SynthConfig, generate  # noqa: E402
from slam_dynamic_tpu.models import vocabulary as voc_mod  # noqa: E402
from slam_dynamic_tpu.worldmap import kfdb as kfdb_mod  # noqa: E402

TOP_W = 512


def heldout_descriptors(n_seq: int, n_frames: int):
    """[seq][frame] -> (desc, valid); seeds disjoint from training (train
    used sweep 0..23 and orbit 100..123; eval uses 600+)."""
    orb = ORBConfig(n_features=1000)
    out = []
    for i in range(n_seq):
        traj = "orbit" if i % 2 else "sweep"
        scfg = SynthConfig(n_frames=n_frames, width=640, height=480,
                           fx=260.0, fy=260.0, cx=319.5, cy=239.5,
                           seed=600 + 7 * i, trajectory=traj,
                           texture_cells=2.0 + 0.37 * i)
        seq = generate(scfg)
        frames = []
        for f in range(n_frames):
            kp = extract_np(seq.gray[f], orb)
            frames.append((np.asarray(kp.desc), np.asarray(kp.valid)))
        out.append(frames)
    return out


def evaluate(voc, corpus, stride: int):
    """Insert every `stride`th frame of all sequences into one DB; query
    the rest. Returns (recall@1, mean margin, transform ms/frame)."""
    entries = []                     # (seq, frame) per DB slot
    bows = {}
    t_tr = 0.0
    n_tr = 0
    for s, frames in enumerate(corpus):
        for f, (desc, valid) in enumerate(frames):
            t0 = time.time()
            bv = voc_mod.transform(voc, jnp.asarray(desc),
                                   jnp.asarray(valid))
            sb = voc_mod.sparse_bow(bv, top_w=TOP_W)
            jax.block_until_ready(sb.word)
            t_tr += time.time() - t0
            n_tr += 1
            bows[(s, f)] = sb
            if f % stride == 0:
                entries.append((s, f))
    K = len(entries)
    db = kfdb_mod.KFDatabase.empty(K, top_w=TOP_W)
    for k, key in enumerate(entries):
        db = kfdb_mod.add(db, jnp.int32(k), bows[key])

    hits = 0
    seq_hits = 0
    total = 0
    margins = []
    for s, frames in enumerate(corpus):
        for f in range(len(frames)):
            if f % stride == 0:
                continue
            sc = np.asarray(kfdb_mod.scores(db, bows[(s, f)])[0])
            total += 1
            top = int(sc.argmax())
            ts, tf = entries[top]
            hits += ts == s and abs(tf - f) <= stride
            seq_hits += ts == s          # a wrong-seq top-1 is the failure
            # mode that creates FALSE loop closures downstream
            same = np.array([e[0] == s for e in entries])
            if same.any() and (~same).any():
                margins.append(sc[same].max() / max(sc[~same].max(), 1e-9))
    return hits / max(total, 1), seq_hits / max(total, 1), \
        float(np.mean(margins)), 1e3 * t_tr / max(n_tr, 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sequences", type=int, default=4)
    ap.add_argument("--frames", type=int, default=50)
    ap.add_argument("--stride", type=int, default=5)
    args = ap.parse_args()

    assets = os.path.join(os.path.dirname(__file__), "..",
                          "slam_dynamic_tpu", "assets")
    voc_100k = voc_mod.load(os.path.join(assets, "vocab_synth_100k.npz"))
    from tools.make_vocab_1m import extend_one_level
    voc_1m_ext = extend_one_level(voc_100k)
    trained_path = os.path.join(assets, "vocab_synth_1m_trained.npz")
    voc_1m_trn = voc_mod.load(trained_path) \
        if os.path.exists(trained_path) else None

    print(f"[corpus] {args.sequences} held-out seqs x {args.frames} frames",
          file=sys.stderr)
    corpus = heldout_descriptors(args.sequences, args.frames)

    rows = [("10^5 trained (default)", voc_100k),
            ("10^6 leaf-extended", voc_1m_ext)]
    if voc_1m_trn is not None:
        rows.append(("10^6 trained (3M corpus)", voc_1m_trn))
    print(f"{'vocabulary':28s} {'recall@1':>9s} {'seq@1':>7s} "
          f"{'margin':>8s} {'ms/frame':>9s}")
    for name, voc in rows:
        r, rs, m, ms = evaluate(voc, corpus, args.stride)
        print(f"{name:28s} {r:9.3f} {rs:7.3f} {m:8.2f} {ms:9.2f}")


if __name__ == "__main__":
    main()

"""Offline vocabulary training on a synthetic multi-trajectory corpus.

The reference ships a pretrained ~1M-word DBoW2 tree (ORBvoc.txt, loaded by
TemplatedVocabulary.h:1338); with zero egress we build our own pretrained
asset from the in-repo synthetic world: several trajectories x textures x
seeds, ORB-extracted, then binary k-medians (models/vocabulary.train).

Usage:
    python tools/train_vocab.py --out slam_dynamic_tpu/assets/vocab_synth.npz
    python tools/train_vocab.py --k 10 --levels 4 --frames 40
"""
import argparse
import dataclasses
import os
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

from slam_dynamic_tpu.config import ORBConfig  # noqa: E402
from slam_dynamic_tpu.frontend.extractor import extract_np  # noqa: E402
from slam_dynamic_tpu.io.synthetic import SynthConfig, generate  # noqa: E402
from slam_dynamic_tpu.models import vocabulary as voc_mod  # noqa: E402


def build_corpus(frames_per_seq: int, width: int, height: int,
                 n_sequences: int = 6, n_features: int = 1000) -> np.ndarray:
    """ORB descriptors from a diverse synthetic corpus.

    `n_sequences` pairs of (sweep, orbit) sequences with distinct world
    seeds and texture frequencies; a trained 10^6-leaf tree (reference
    ORBvoc scale, TemplatedVocabulary.h:1338 trained on real imagery)
    needs several MILLION descriptors — use ~48 sequences x 60 frames x
    2000 features."""
    base = dict(n_frames=frames_per_seq, width=width, height=height,
                fx=260.0, fy=260.0, cx=width / 2 - 0.5, cy=height / 2 - 0.5)
    seq_cfgs = []
    for i in range(max(1, n_sequences // 2)):
        seq_cfgs.append(SynthConfig(
            **base, seed=i, trajectory="sweep",
            texture_cells=1.8 + 0.23 * i))
        seq_cfgs.append(SynthConfig(
            **base, seed=100 + i, trajectory="orbit",
            texture_cells=2.2 + 0.31 * i))
    seq_cfgs = seq_cfgs[:max(1, n_sequences)]
    orb = ORBConfig(n_features=n_features)
    out = []
    for i, scfg in enumerate(seq_cfgs):
        seq = generate(scfg)
        for f in range(seq.gray.shape[0]):
            kp = extract_np(seq.gray[f], orb)
            valid = np.asarray(kp.valid)
            out.append(np.asarray(kp.desc)[valid])
        print(f"[corpus] seq {i + 1}/{len(seq_cfgs)}: "
              f"{sum(len(d) for d in out)} descriptors", file=sys.stderr)
    return np.concatenate(out, axis=0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "slam_dynamic_tpu", "assets",
        "vocab_synth.npz"))
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--levels", type=int, default=4)
    ap.add_argument("--frames", type=int, default=40,
                    help="frames per synthetic sequence (6 sequences)")
    ap.add_argument("--width", type=int, default=424)
    ap.add_argument("--height", type=int, default=320)
    ap.add_argument("--max-train", type=int, default=150_000)
    ap.add_argument("--sequences", type=int, default=6)
    ap.add_argument("--n-features", type=int, default=1000)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    t0 = time.time()
    corpus = build_corpus(args.frames, args.width, args.height,
                          n_sequences=args.sequences,
                          n_features=args.n_features)
    print(f"[corpus] total {len(corpus)} descriptors "
          f"({time.time() - t0:.1f}s)", file=sys.stderr)
    t0 = time.time()
    voc = voc_mod.train(corpus, k=args.k, levels=args.levels,
                        seed=args.seed, max_train=args.max_train)
    print(f"[train] k={args.k} levels={args.levels} -> {voc.n_words} words "
          f"({time.time() - t0:.1f}s)", file=sys.stderr)
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    voc_mod.save(args.out, voc)
    print(f"[save] {args.out}")


if __name__ == "__main__":
    main()

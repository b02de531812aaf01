#!/usr/bin/env python
"""Distributed-BA scaling benchmark on a virtual device mesh.

Measures the landmark-sharded Schur-reduction BA step (parallel/
sharded_ba.py) at several shard counts with a FIXED total problem (strong
scaling), reporting step time and parallel efficiency. Runs on the
8-virtual-device CPU mesh by default (the same code path drives real
multi-chip meshes; BASELINE.md asks for >=0.8 efficiency at N=2).

Usage: python tools/scaling_bench.py [--devices 8] [--kfs 64]
       [--landmarks 16384] [--obs-per-lm 6]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--kfs", type=int, default=64)
    ap.add_argument("--landmarks", type=int, default=16384)
    ap.add_argument("--obs-per-lm", type=int, default=6)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--tpu", action="store_true",
                    help="use the real backend instead of virtual CPU mesh")
    args = ap.parse_args()

    if not args.tpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        flags = os.environ.get("XLA_FLAGS", "")
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.devices}"
        ).strip()
    import jax
    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P
    from slam_dynamic_tpu.parallel.mesh import make_mesh
    from slam_dynamic_tpu.parallel import sharded_ba as sba
    from slam_dynamic_tpu.utils.camera import Intrinsics, project_stereo
    from slam_dynamic_tpu.utils import se3

    cam = Intrinsics.create(fx=500.0, fy=500.0, cx=320.0, cy=240.0, bf=50.0)
    rng = np.random.default_rng(0)
    K, L = args.kfs, args.landmarks
    O = L * args.obs_per_lm

    # synthetic global BA problem: trajectory + landmarks + noisy obs
    pts = np.stack([rng.uniform(-6, 6, L), rng.uniform(-4, 4, L),
                    rng.uniform(4, 20, L)], 1).astype(np.float32)
    kf_R = np.zeros((K, 3, 3), np.float32)
    kf_t = np.zeros((K, 3), np.float32)
    for k in range(K):
        xi = np.array([0.3 * k, 0, 0, 0, 0.002 * k, 0], np.float32)
        R, t = se3.se3_exp(jnp.asarray(xi))
        kf_R[k] = np.asarray(R)
        kf_t[k] = np.asarray(t)
    obs_kf = rng.integers(0, K, O).astype(np.int32)
    obs_lm = np.repeat(np.arange(L, dtype=np.int32), args.obs_per_lm)
    xc = np.einsum("oij,oj->oi", kf_R[obs_kf], pts[obs_lm]) + kf_t[obs_kf]
    uvr = np.array(project_stereo(cam, jnp.asarray(xc)))
    uvr += rng.normal(0, 0.5, uvr.shape).astype(np.float32)
    good = xc[:, 2] > 0.5

    results = {}
    counts = [d for d in (1, 2, 4, 8) if d <= args.devices]
    for nd in counts:
        mesh = make_mesh(nd)
        perm, valid_out, ok = sba.partition_obs_by_landmark(
            obs_lm, good, nd, L, O)
        problem = sba.ShardedBAProblem(
            kf_R=jnp.asarray(kf_R), kf_t=jnp.asarray(
                kf_t + rng.normal(0, 0.05, kf_t.shape).astype(np.float32)),
            kf_fixed=jnp.asarray(np.arange(K) == 0),
            kf_valid=jnp.ones(K, bool),
            points=jnp.asarray(pts + rng.normal(0, 0.05, pts.shape
                                                ).astype(np.float32)),
            lm_valid=jnp.ones(L, bool),
            obs_kf=jnp.asarray(obs_kf[perm]),
            obs_lm=jnp.asarray(obs_lm[perm]),
            obs_uv=jnp.asarray(uvr[perm]),
            obs_inv_sigma2=jnp.ones(O, jnp.float32),
            obs_valid=jnp.asarray(valid_out),
            obs_ur_weight=jnp.ones(O, jnp.float32))

        def put(x, spec):
            return jax.device_put(x, NamedSharding(mesh, spec))
        problem = problem._replace(
            points=put(problem.points, P("lm")),
            lm_valid=put(problem.lm_valid, P("lm")),
            obs_kf=put(problem.obs_kf, P("lm")),
            obs_lm=put(problem.obs_lm, P("lm")),
            obs_uv=put(problem.obs_uv, P("lm")),
            obs_inv_sigma2=put(problem.obs_inv_sigma2, P("lm")),
            obs_valid=put(problem.obs_valid, P("lm")),
            obs_ur_weight=put(problem.obs_ur_weight, P("lm")))
        run = sba.make_sharded_ba(mesh, cam, K=K, L=L, O=O, stereo=True,
                                  iters=args.iters)
        out = run(problem)
        jax.block_until_ready(out)
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            out = run(problem)
            jax.block_until_ready(out)
        dt = (time.time() - t0) / reps
        results[nd] = dt
        err = float(jnp.abs(out[1] - jnp.asarray(kf_t)).max())
        print(f"shards={nd}: {dt*1e3:.1f} ms/solve  (pose err {err:.4f})",
              flush=True)

    base = results[counts[0]]
    out = {"metric": "distributed BA strong-scaling",
           "problem": {"K": K, "L": L, "O": O, "iters": args.iters},
           "times_ms": {str(k): round(v * 1e3, 1)
                        for k, v in results.items()},
           "efficiency": {str(k): round(base / (v * k), 3)
                          for k, v in results.items()}}
    print(json.dumps(out))


if __name__ == "__main__":
    main()

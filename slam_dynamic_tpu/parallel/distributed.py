"""Multi-host runtime bring-up (SURVEY §5.8).

The reference is a single-process pthreads program; its "distributed
backend" is a mutex table. Here, multi-host scaling is jax.distributed +
a global device mesh: every host runs the same program, local devices of
all hosts form one mesh, and the sharded solvers (parallel/sharded_ba.py,
parallel/sharded_pose_graph.py) communicate through XLA collectives that
ride ICI inside a slice and DCN across slices — no bespoke RPC layer.

Launch path (N hosts, one process per host):

    # host i (i = 0..N-1), HOST0 reachable by all:
    python your_driver.py --distributed \
        --coordinator HOST0:8476 --num-processes N --process-id i

    # inside the driver, BEFORE any other jax use:
    from slam_dynamic_tpu.parallel.distributed import init_distributed
    init_distributed(coordinator, num_processes, process_id)

On a TPU pod slice, `init_distributed()` with no arguments auto-detects
the topology from the TPU environment (jax.distributed.initialize()
defaults). On CPU hosts the collectives run over Gloo — this is how the
2-process test in tests/test_distributed.py validates the path without a
multi-host TPU.

Roles (the per-host streaming frontend of SURVEY §2.4):
  - every host tracks its own camera stream / sequence shard with a local
    System (host-parallel frontend — tracking is latency-bound and stays
    off the interconnect);
  - the heavy map solves (global BA, essential graph) run as GLOBAL
    sharded programs over the full mesh: landmarks (BA) or edges (pose
    graph) are sharded across all hosts' devices, poses replicated, one
    psum per GN iteration.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None,
                     local_device_ids: Optional[Sequence[int]] = None):
    """Initialize the multi-process runtime. Call before any jax op.

    No arguments: TPU pod auto-detection (the usual production path).
    Explicit arguments: manual bring-up (CPU hosts / custom topologies).
    """
    kw = {}
    if coordinator is not None:
        kw.update(coordinator_address=coordinator,
                  num_processes=num_processes, process_id=process_id)
    if local_device_ids is not None:
        kw.update(local_device_ids=local_device_ids)
    jax.distributed.initialize(**kw)


def global_mesh(axis_name: str = "lm") -> Mesh:
    """1-D mesh over ALL devices of ALL processes."""
    return Mesh(np.asarray(jax.devices()), (axis_name,))


def host_sharded_array(mesh: Mesh, global_shape, local_block,
                       axis_name: str = "lm"):
    """Assemble a globally-sharded array from each host's local block
    (the standard multi-host jax.make_array_from_callback pattern)."""
    spec = P(axis_name, *([None] * (len(global_shape) - 1)))
    sharding = NamedSharding(mesh, spec)
    local_block = np.asarray(local_block)
    n = mesh.shape[axis_name]
    block = global_shape[0] // n

    def cb(index):
        # index.start is the global offset of this device's block; each
        # host only materializes its own slice
        start = index[0].start or 0
        off = start - jax.process_index() * (global_shape[0]
                                             // jax.process_count())
        return local_block[off:off + block]

    return jax.make_array_from_callback(tuple(global_shape), sharding, cb)

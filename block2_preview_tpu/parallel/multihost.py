"""Multi-host distributed initialization + global mesh construction.

The reference scales across nodes with an MPI communicator
(src/core/parallel_mpi.hpp:81 MPICommunicator: allreduce/bcast over the
distributed-operator axis).  The TPU-native analog is
``jax.distributed``: every host runs the same program, the coordinator
rendezvouses the processes, and ``jax.devices()`` then spans ALL hosts
— a single ``jax.sharding.Mesh`` over the global device list makes the
existing ``shard_map``/``psum`` engines (ops/blockv2, ops/tilev2,
parallel/shard) multi-host with no further changes, because XLA lowers
the same ``psum`` to ICI collectives within a slice and DCN collectives
across slices.

Environment contract (the standard JAX multi-process convention):
  B2TPU_COORDINATOR  host:port of process 0 (or JAX_COORDINATOR_ADDRESS)
  B2TPU_NUM_PROCS    total process count      (or JAX_NUM_PROCESSES)
  B2TPU_PROC_ID      this process's rank      (or JAX_PROCESS_ID)

With none of these set, :func:`ensure_distributed` is a no-op and the
global mesh degrades to the single-process mesh — the fallback path
exercised by tests/test_multihost.py (real multi-host hardware is not
available in this environment; the contract is compile-level).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

_INITIALIZED = False


def distributed_spec() -> Optional[Tuple[str, int, int]]:
    """(coordinator, num_processes, process_id) from the environment,
    or None when running single-process."""
    coord = os.environ.get("B2TPU_COORDINATOR") \
        or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not coord:
        return None
    nproc = int(os.environ.get("B2TPU_NUM_PROCS")
                or os.environ.get("JAX_NUM_PROCESSES") or 1)
    pid = int(os.environ.get("B2TPU_PROC_ID")
              or os.environ.get("JAX_PROCESS_ID") or 0)
    return coord, nproc, pid


def ensure_distributed() -> bool:
    """Initialize jax.distributed once when a multi-process spec is
    present; returns True when running multi-process."""
    global _INITIALIZED
    spec = distributed_spec()
    if spec is None:
        return False
    if not _INITIALIZED:
        import jax
        coord, nproc, pid = spec
        jax.distributed.initialize(coordinator_address=coord,
                                   num_processes=nproc,
                                   process_id=pid)
        _INITIALIZED = True
    return True


def global_mesh(axis: str = "op"):
    """1-D mesh over every device of every process (after
    ensure_distributed); single-process it is the local mesh.

    The operator axis is the reference's distributed-operator
    parallelism (parallel_rule.hpp ParallelRule); laying the mesh over
    the global device list keeps each psum on ICI within a slice and
    only the final reduction on DCN."""
    import jax
    from jax.sharding import Mesh
    ensure_distributed()
    import numpy as np
    return Mesh(np.asarray(jax.devices()), (axis,))


def process_info() -> Tuple[int, int]:
    """(process_index, process_count) — 0/1 single-process."""
    import jax
    return jax.process_index(), jax.process_count()


def host_local_slice(n: int) -> slice:
    """Round-robin-free contiguous slice of n work items owned by this
    process (for host-side plan building ahead of a global mesh step)."""
    pid, np_ = process_info()
    per = -(-n // np_)
    return slice(pid * per, min((pid + 1) * per, n))

"""Multi-chip operator sharding of sigma-vector plans.

TPU-native counterpart of block2's distributed-operator parallelism (axis 1 of
SURVEY.md section 2.6): each MPI rank owns a subset of complementary operators
via ParallelRuleQC hash rules and partial sigma-vectors are allreduced
(reference src/dmrg/qc_parallel_rule.hpp:44-80,
src/core/parallel_tensor_functions.hpp:204-219 allreduce_sum(vmats)).

Here the ownership rule is simply "shard the bucketed GEMM batch dimension
across the mesh axis"; the allreduce is a ``jax.lax.psum`` over ICI inside
``shard_map``.  Because every (LW block x psi block x RW block) triple is an
independent contribution to sigma, this is an exact, loss-free decomposition —
the same property block2 exploits with owner-computes + allreduce.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from ..ops.exec_jax import PlanExecutor, _round_dim


def _partial_sigma(x, buckets, axis_name):
    sigma = jnp.zeros(x.shape[0] + 1, dtype=x.dtype)
    xp = jnp.concatenate([x, jnp.zeros(1, dtype=x.dtype)])
    for (A, R, pidx, oidx) in buckets:
        Pg = xp[pidx]
        out = jnp.einsum("bak,bkn,bpn->bap", A, Pg, R,
                         preferred_element_type=x.dtype)
        sigma = sigma.at[oidx].add(out, mode="drop")
    return jax.lax.psum(sigma[:-1], axis_name)


class ShardedPlanExecutor:
    """Operator-sharded sigma-vector executor over a device mesh axis."""

    def __init__(self, eff, mesh: Mesh, axis: str = "op", dtype=np.float64):
        self.size = eff.size
        self.dtype = dtype
        self.mesh = mesh
        self.axis = axis
        n_dev = mesh.shape[axis]
        base = PlanExecutor(eff, dtype=dtype)
        self.size_p = base.size_p
        # pad every bucket's batch dim to a multiple of the mesh axis size
        padded = []
        for (A, R, pidx, oidx) in base.device_buckets:
            A, R = np.asarray(A), np.asarray(R)
            pidx, oidx = np.asarray(pidx), np.asarray(oidx)
            B = A.shape[0]
            Bp = ((B + n_dev - 1) // n_dev) * n_dev
            if Bp != B:
                pad = Bp - B
                A = np.concatenate([A, np.zeros((pad,) + A.shape[1:],
                                                dtype=A.dtype)])
                R = np.concatenate([R, np.zeros((pad,) + R.shape[1:],
                                                dtype=R.dtype)])
                pidx = np.concatenate(
                    [pidx, np.full((pad,) + pidx.shape[1:], self.size_p,
                                   dtype=pidx.dtype)])
                oidx = np.concatenate(
                    [oidx, np.full((pad,) + oidx.shape[1:], self.size_p,
                                   dtype=oidx.dtype)])
            padded.append((A, R, pidx, oidx))

        bucket_specs = tuple((P(axis), P(axis), P(axis), P(axis))
                             for _ in padded)
        shard = jax.shard_map(
            lambda x, b: _partial_sigma(x, b, axis),
            mesh=mesh, in_specs=(P(), bucket_specs), out_specs=P())
        self._fn = jax.jit(shard)
        # place bucket shards on devices
        self.device_buckets = tuple(
            tuple(jax.device_put(arr, NamedSharding(mesh, P(axis)))
                  for arr in bk)
            for bk in padded)

    def matvec_device(self, xj):
        """Device-resident sharded matvec: padded replicated input array
        in, padded replicated sigma out — no host round-trip, for use
        inside device-side solver loops (the production path; the v2
        resident engine's sharded matvec follows the same contract)."""
        return self._fn(xj, self.device_buckets)

    def pad_device(self, x: np.ndarray):
        xp = np.zeros(self.size_p, dtype=self.dtype)
        xp[:self.size] = x
        return jax.device_put(xp, NamedSharding(self.mesh, P()))

    def matvec(self, x: np.ndarray) -> np.ndarray:
        # host-convenience wrapper (tests / host Davidson); production
        # loops keep x on device via matvec_device
        return np.asarray(self.matvec_device(self.pad_device(x)),
                          dtype=np.float64)[:self.size]


def default_mesh(n_devices: int | None = None, axis: str = "op") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        assert len(devs) >= n_devices, \
            f"need {n_devices} devices, have {len(devs)}"
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))

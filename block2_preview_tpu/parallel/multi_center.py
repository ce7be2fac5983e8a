"""Multi-center parallel MPS sweeps (conn_centers) — parallelism over sites.

TPU-framework counterpart of block2's ParallelMPS + unordered sweep
(reference src/dmrg/parallel_mps.hpp:37 multi-center MPS with conn_centers;
src/dmrg/sweep_algorithm.hpp:2701 partial_sweep, :2765 connection_sweep,
:2851 unordered_sweep; CLI keyword `conn_centers`,
docs/source/user/keywords.rst:129).  The chain is split at connection
centers into segments; each outer iteration
  1. sweeps every segment over its own site range in its own alternating
     direction (block2 runs these on separate process groups — the
     information flow between segments is exactly the segment-boundary
     environments, refreshed once per outer iteration), then
  2. runs a two-site `connection sweep` across every boundary bond, which
     transfers entanglement between neighboring segments (block2's
     para_merge / para_split pair).

This is the deterministic single-host reference implementation of the
axis-4 parallelism; a multi-host deployment runs step 1 concurrently per
segment and exchanges only the boundary environments and connection
matrices, as the reference does over MPI groups.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..dmrg.mpo import MPO
from ..dmrg.mps import MPS
from ..dmrg.sweep import DMRG


class MultiCenterDMRG:
    def __init__(self, mpo: MPO, mps: MPS, conn_centers: Sequence[int],
                 backend: str = "numpy", iprint: int = 0,
                 mesh=None, mesh_axis: str = "op"):
        L = mpo.n_sites
        self.conn = sorted(int(c) for c in conn_centers)
        assert all(1 < c < L - 1 for c in self.conn), "bad conn center"
        bounds = [0] + self.conn + [L]
        self.segments: List[Tuple[int, int]] = [
            (bounds[i], bounds[i + 1]) for i in range(len(bounds) - 1)]
        assert all(b - a >= 2 for a, b in self.segments), \
            "segments need at least 2 sites"
        self.base = DMRG(mpo, mps, backend=backend, iprint=0)
        self.mpo = mpo
        self.mps = mps
        self.iprint = iprint
        self.center = mps.center  # current canonical center (site index)
        self.energies: List[float] = []
        # two-level nesting (reference ParallelRule::split,
        # parallel_rule.hpp:358-369: site-parallel groups wrap
        # operator-parallelism): the device mesh splits into one
        # operator sub-mesh per segment; each segment's local solves
        # shard over its own device group
        self.seg_meshes = None
        self.mesh_axis = mesh_axis
        if mesh is not None:
            from jax.sharding import Mesh
            devs = list(np.asarray(mesh.devices).ravel())
            n_seg = len(self.segments)
            per = max(len(devs) // n_seg, 1)
            self.seg_meshes = []
            for i in range(n_seg):
                grp = devs[i * per:(i + 1) * per] or devs[:1]
                self.seg_meshes.append(
                    Mesh(np.asarray(grp), (mesh_axis,)))
            # per-segment resident caches: device structures live on the
            # segment's own device group
            self._seg_caches = [dict() for _ in range(n_seg)]

    def _use_segment_mesh(self, ip: int) -> None:
        if self.seg_meshes is None:
            return
        me = self.base.me
        if me.mesh is self.seg_meshes[ip]:
            return
        me.mesh = self.seg_meshes[ip]
        me.mesh_axis = self.mesh_axis
        if hasattr(self.base, "_res_caches"):
            self.base._res_caches = self._seg_caches[ip]
        # environments chained across the segment boundary live on the
        # previous group's devices; re-place device pools onto the new
        # sub-mesh (the inter-group transfer of block2's 2-level scheme)
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P
        sh = NamedSharding(me.mesh, P())
        for dname in ("_stk_l", "_stk_r"):
            d = getattr(me, dname, None)
            if not d:
                continue
            for k, v in list(d.items()):
                if v is None:
                    continue
                meta, pool = v[0], v[1]
                if hasattr(pool, "addressable_shards"):
                    d[k] = (meta, jax.device_put(pool, sh)) + tuple(v[2:])

    # -- canonical-center moves (block2 ParallelMPS::move_left/right with
    # the serial engine's env refresh) --------------------------------
    def _ensure_left_env(self, t: int) -> None:
        me = self.base.me
        for u in range(0, t):
            if me.left_envs[u + 1] is None:
                me.update_left(u)

    def _ensure_right_env(self, t: int) -> None:
        me = self.base.me
        for u in range(self.mpo.n_sites - 1, t - 1, -1):
            if me.right_envs[u] is None:
                me.update_right(u)

    def _move_center_to(self, target: int) -> None:
        me = self.base.me
        while self.center < target:
            s = self.center
            self.mps.left_canonicalize_site(s)
            self._ensure_left_env(s)
            me.update_left(s)
            me.invalidate_left(s + 1)
            me.invalidate_right(s + 1)
            self.center += 1
        while self.center > target:
            s = self.center
            self.mps.right_canonicalize_site(s)
            self._ensure_right_env(s + 1)
            me.update_right(s)
            me.invalidate_right(s - 1)
            me.invalidate_left(s - 1)
            self.center -= 1
        self.base._center_tensors = None

    def _ensure_envs(self, a: int, b: int) -> None:
        """Make left env at a and right env at b available (block2
        MovingEnvironment::partial_prepare)."""
        self._ensure_left_env(a)
        self._ensure_right_env(b)

    def _segment_sweep(self, ip: int, forward: bool, bond_dim: int,
                       noise: float, dav_thrd: float) -> float:
        a, b = self.segments[ip]
        self._use_segment_mesh(ip)
        self._move_center_to(a if forward else b - 2)
        self._ensure_envs(a, b)
        emin = np.inf
        rng = range(a, b - 1) if forward else range(b - 2, a - 1, -1)
        for t in rng:
            e, dw, nmv = self.base.update_two_dot(t, forward, bond_dim,
                                                  noise, dav_thrd)
            emin = min(emin, float(np.min(e)))
            self.center = t + 1 if forward else t
            if self.iprint >= 2:
                print(f"  PAR{ip:3d} {'-->' if forward else '<--'} "
                      f"site {t:3d} E = {np.min(e):.10f}")
        return emin

    def _connection_sweep(self, ip: int, bond_dim: int, noise: float,
                          dav_thrd: float) -> float:
        c = self.conn[ip]
        # connection bonds belong to the left segment's device group
        self._use_segment_mesh(ip)
        self._move_center_to(c - 1)
        self._ensure_envs(c - 1, c + 1)
        e, dw, nmv = self.base.update_two_dot(c - 1, True, bond_dim,
                                              noise, dav_thrd)
        self.center = c
        if self.iprint >= 2:
            print(f"  CON{ip:3d}     bond {c:3d} E = {np.min(e):.10f}")
        return float(np.min(e))

    def sweep(self, it: int, bond_dim: int, noise: float,
              dav_thrd: float) -> float:
        """One unordered outer iteration (reference
        sweep_algorithm.hpp:2851)."""
        emin = np.inf
        for ip in range(len(self.segments)):
            fwd = ((it & 1) == 0) ^ ((ip & 1) == 1)
            emin = min(emin, self._segment_sweep(ip, fwd, bond_dim, noise,
                                                 dav_thrd))
        for ip in range(len(self.conn)):
            emin = min(emin, self._connection_sweep(ip, bond_dim, noise,
                                                    dav_thrd))
        return emin

    def solve(self, bond_dims: Sequence[int], noises: Sequence[float],
              dav_thrds: Sequence[float], n_sweeps: int = 16,
              tol: float = 1e-9) -> float:
        def sched(lst, i):
            return lst[min(i, len(lst) - 1)]

        last = np.inf
        for it in range(n_sweeps):
            e = self.sweep(it, sched(bond_dims, it), sched(noises, it),
                           sched(dav_thrds, it))
            self.energies.append(e)
            if self.iprint >= 1:
                print(f"unordered sweep {it:3d}  E = {e:.12f}")
            if abs(e - last) < tol and sched(noises, it) == 0:
                break
            last = e
        return self.energies[-1]

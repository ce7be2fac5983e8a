"""Two-site DMRG sweep driver.

TPU-native counterpart of block2's DMRG sweep algorithm (reference
src/dmrg/sweep_algorithm.hpp:71: update_two_dot at :811, blocking :2491,
sweep :2551, solve :3032) with density-matrix decimation + perturbative-style
noise (reference src/dmrg/moving_environment.hpp density_matrix /
split_density_matrix; effective_hamiltonian.hpp:253 perturbative_noise).

The Davidson outer loop runs on host; the sigma-vector matvec is pluggable
("numpy" reference executor here; the jit-compiled bucketed executor in
ops/exec_jax.py is selected with backend="jax").
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..core.symmetry import QN
from ..ops.davidson import davidson
from .effective import EffectiveHamiltonian2, Key2
from .environment import MovingEnvironment
from .mpo import MPO
from .mps import MPS, MPSTensor


def _split_forward(eff: EffectiveHamiltonian2, psi: Dict[Key2, np.ndarray],
                   bond_dim: int, noise: float, trunc_cutoff: float = 1e-16
                   ) -> Tuple[Dict[QN, np.ndarray], float]:
    """Left density matrix + eigh decimation; returns kept rotation per qL
    sector and the discarded weight."""
    g, target = eff.g, eff.target
    rho: Dict[QN, np.ndarray] = {}
    for (qL, qR), b in psi.items():
        acc = rho.get(qL)
        rho[qL] = b @ b.T if acc is None else acc + b @ b.T
    if noise > 0:
        rho_n: Dict[QN, np.ndarray] = {}
        for m, lw in eff.LW.items():
            xs: Dict[Tuple[QN, QN], np.ndarray] = {}
            for (qLb, qLk), blk in lw.items():
                pk = (qLk, g.sub(target, qLk))
                if pk not in psi:
                    continue
                x = blk @ psi[pk]
                key = (qLb, pk[1])
                xs[key] = xs.get(key, 0) + x
            for (qLb, _), x in xs.items():
                acc = rho_n.get(qLb)
                rho_n[qLb] = x @ x.T if acc is None else acc + x @ x.T
        tr = sum(np.trace(v) for v in rho_n.values())
        if tr > 1e-30:
            for q, v in rho_n.items():
                blk = rho.get(q)
                add = (noise / tr) * v
                rho[q] = add if blk is None else blk + add
    return _decimate(rho, bond_dim, trunc_cutoff)


def _split_backward(eff: EffectiveHamiltonian2, psi: Dict[Key2, np.ndarray],
                    bond_dim: int, noise: float, trunc_cutoff: float = 1e-16
                    ) -> Tuple[Dict[QN, np.ndarray], float]:
    g, target = eff.g, eff.target
    rho: Dict[QN, np.ndarray] = {}
    for (qL, qR), b in psi.items():
        acc = rho.get(qR)
        rho[qR] = b.T @ b if acc is None else acc + b.T @ b
    if noise > 0:
        rho_n: Dict[QN, np.ndarray] = {}
        for m, rw in eff.RW.items():
            xs: Dict[Tuple[QN, QN], np.ndarray] = {}
            for (qRb, qRk), blk in rw.items():
                pk = (g.sub(target, qRk), qRk)
                if pk not in psi:
                    continue
                x = psi[pk] @ blk.T
                key = (pk[0], qRb)
                xs[key] = xs.get(key, 0) + x
            for (_, qRb), x in xs.items():
                acc = rho_n.get(qRb)
                rho_n[qRb] = x.T @ x if acc is None else acc + x.T @ x
        tr = sum(np.trace(v) for v in rho_n.values())
        if tr > 1e-30:
            for q, v in rho_n.items():
                blk = rho.get(q)
                add = (noise / tr) * v
                rho[q] = add if blk is None else blk + add
    return _decimate(rho, bond_dim, trunc_cutoff)


def _decimate(rho: Dict[QN, np.ndarray], bond_dim: int, trunc_cutoff: float
              ) -> Tuple[Dict[QN, np.ndarray], float]:
    eigs: List[Tuple[float, QN, int]] = []
    vecs: Dict[QN, np.ndarray] = {}
    for q, r in rho.items():
        w, v = np.linalg.eigh(0.5 * (r + r.T))
        vecs[q] = v
        for i, x in enumerate(w):
            eigs.append((float(x), q, i))
    eigs.sort(key=lambda z: -z[0])
    total = sum(max(x, 0.0) for x, _, _ in eigs)
    kept: Dict[QN, List[int]] = {}
    kept_w = 0.0
    for (x, q, i) in eigs[:bond_dim]:
        if x <= max(trunc_cutoff * max(total, 1e-300), 0.0):
            break
        kept.setdefault(q, []).append(i)
        kept_w += x
    rot: Dict[QN, np.ndarray] = {}
    for q, idxs in kept.items():
        rot[q] = vecs[q][:, idxs]
    dw = max(0.0, (total - kept_w) / max(total, 1e-300))
    return rot, dw


@dataclass
class SweepResults:
    energies: List[float] = field(default_factory=list)
    discarded: List[float] = field(default_factory=list)
    n_matvec: int = 0


class DMRG:
    """Ground-state two-site DMRG (reference sweep_algorithm.hpp:71)."""

    def __init__(self, mpo: MPO, mps: MPS, backend: str = "numpy",
                 iprint: int = 1, dtype=np.float64):
        self.mpo = mpo
        self.mps = mps
        self.backend = backend
        self.dtype = dtype
        self.iprint = iprint
        self.me = MovingEnvironment(mpo, mps)
        self.me.init_environments()
        self.energies: List[float] = []
        self.discarded_weights: List[float] = []
        self._jax_cache = None

    # ------------------------------------------------------------------
    def _matvec_fn(self, eff: EffectiveHamiltonian2):
        if self.backend == "jax":
            from ..ops.exec_jax import PlanExecutor
            return PlanExecutor(eff, dtype=self.dtype).matvec
        return eff.matvec_np

    def update_two_dot(self, t: int, forward: bool, bond_dim: int,
                       noise: float, dav_thrd: float) -> Tuple[float, float, int]:
        eff = EffectiveHamiltonian2(self.me, t)
        x0 = eff.flatten(eff.initial_guess())
        nrm = np.linalg.norm(x0)
        if nrm < 1e-14:
            x0 = np.random.RandomState(42).standard_normal(eff.size)
        x0 /= np.linalg.norm(x0)
        diag = eff.diagonal()
        if self.backend == "jax":
            from ..ops.exec_jax import FusedPlanExecutor
            ex = FusedPlanExecutor(eff, dtype=self.dtype)
            th, xv, nmv = ex.solve_ground_state(
                x0, diag, conv_thrd=dav_thrd, max_iter=200, max_subspace=20)
            energy = th + self.mpo.const_e
            psi = eff.unflatten(xv)
        else:
            w, v, nmv = davidson(self._matvec_fn(eff), diag, x0,
                                 conv_thrd=dav_thrd)
            energy = float(w[0]) + self.mpo.const_e
            psi = eff.unflatten(v[:, 0])
        g, target = eff.g, eff.target

        if forward:
            rot, dw = _split_forward(eff, psi, bond_dim, noise)
            a_blocks: Dict[Tuple[QN, QN, QN], np.ndarray] = {}
            for qL, vmat in rot.items():
                for (ql, qp, off, dl, dp) in eff.fl.maps[qL]:
                    a_blocks[(ql, qp, qL)] = vmat[off:off + dl * dp, :] \
                        .reshape(dl, dp, -1)
            c_blocks: Dict[Tuple[QN, QN, QN], np.ndarray] = {}
            for qL, vmat in rot.items():
                qR = g.sub(target, qL)
                pk = (qL, qR)
                if pk not in psi:
                    continue
                mmat = vmat.T @ psi[pk]
                for (qp, qc2, off, dp, db) in eff.fr.maps[qR]:
                    qr2 = g.sub(target, qc2)
                    blk = mmat[:, off:off + dp * db].reshape(-1, dp, db)
                    key = (qL, qp, qr2)
                    c_blocks[key] = c_blocks.get(key, 0) + blk
            self.mps.tensors[t] = MPSTensor(g, a_blocks)
            self.mps.tensors[t + 1] = MPSTensor(g, c_blocks)
            self.me.update_left(t)
            self.me.invalidate_right(t + 1)
        else:
            rot, dw = _split_backward(eff, psi, bond_dim, noise)
            b_blocks: Dict[Tuple[QN, QN, QN], np.ndarray] = {}
            for qR, vmat in rot.items():
                ql_new = g.sub(target, qR)
                for (qp, qc2, off, dp, db) in eff.fr.maps[qR]:
                    qr2 = g.sub(target, qc2)
                    b_blocks[(ql_new, qp, qr2)] = vmat[off:off + dp * db, :] \
                        .T.reshape(-1, dp, db)
            c_blocks = {}
            for qR, vmat in rot.items():
                qL = g.sub(target, qR)
                pk = (qL, qR)
                if pk not in psi:
                    continue
                mmat = psi[pk] @ vmat
                for (ql, qp, off, dl, dp) in eff.fl.maps[qL]:
                    blk = mmat[off:off + dl * dp, :].reshape(dl, dp, -1)
                    key = (ql, qp, qL)
                    c_blocks[key] = c_blocks.get(key, 0) + blk
            self.mps.tensors[t + 1] = MPSTensor(g, b_blocks)
            self.mps.tensors[t] = MPSTensor(g, c_blocks)
            self.me.update_right(t + 1)
            self.me.invalidate_left(t)
        return energy, dw, nmv

    # ------------------------------------------------------------------
    def sweep(self, forward: bool, bond_dim: int, noise: float,
              dav_thrd: float) -> SweepResults:
        L = self.mpo.n_sites
        res = SweepResults()
        rng = range(L - 1) if forward else range(L - 2, -1, -1)
        for t in rng:
            e, dw, nmv = self.update_two_dot(t, forward, bond_dim, noise,
                                             dav_thrd)
            res.energies.append(e)
            res.discarded.append(dw)
            res.n_matvec += nmv
            if self.iprint >= 2:
                print(f"   {'-->' if forward else '<--'} site {t:3d} "
                      f"E = {e:.12f}  dw = {dw:.2e}  nmv = {nmv}")
        return res

    def solve(self, bond_dims: List[int], noises: List[float],
              dav_thrds: List[float], n_sweeps: int = 20,
              tol: float = 1e-8) -> float:
        def sched(lst, i, last=None):
            if i < len(lst):
                return lst[i]
            return lst[-1] if last is None else last

        forward = True
        last_e = np.inf
        for isw in range(n_sweeps):
            bd = sched(bond_dims, isw)
            ns = sched(noises, isw)
            dt = sched(dav_thrds, isw)
            res = self.sweep(forward, bd, ns, dt)
            e = min(res.energies)
            dw = max(res.discarded) if res.discarded else 0.0
            self.energies.append(e)
            self.discarded_weights.append(dw)
            if self.iprint >= 1:
                print(f"sweep {isw:3d} {'F' if forward else 'B'} D={bd:5d} "
                      f"noise={ns:.1e}  E = {e:.12f}  dE = {e - last_e:+.3e} "
                      f" dw = {dw:.2e}  nmv = {res.n_matvec}")
            if abs(e - last_e) < tol and ns == 0:
                break
            last_e = e
            forward = not forward
        return self.energies[-1] if self.energies else np.nan

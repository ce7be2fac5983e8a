"""Two-site effective Hamiltonian: fused bases, complementary-operator pairs,
sigma-vector contraction, and density-matrix decimation.

TPU-native counterpart of block2's EffectiveHamiltonian (reference
src/dmrg/effective_hamiltonian.hpp:98: ConnectionInfo precompute + operator()
sigma-vector at :449, eigs at :471) and the density-matrix/split helpers in
MovingEnvironment (reference src/dmrg/moving_environment.hpp: density_matrix,
split_density_matrix).

The effective operator is assembled as H = sum_m LW[m] (x) RW[m], where m runs
over the MPO symbols of the center bond: LW[m] acts on the fused
(left bond (x) site t) basis and RW[m] on the fused (site t+1 (x) right
complement) basis.  This is exactly block2's left/right complementary-operator
factorization (DelayedOperatorTensor, reference src/core/operator_tensor.hpp:209);
the list of matching (LW block, psi block, RW block) GEMM triples is the
static contraction plan that the device executor buckets into batched matmuls.

Charge conventions: a psi sector is (qL, qR) with qL + qR = target; qL is the
accumulated charge of sites <= t and qR the charge of sites >= t+1 (bond
quanta of the right half are stored complemented: qc = target - q_bond).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from ..core.blocks import FusedBasis
from ..core.state_info import StateInfo
from ..core.symmetry import QN
from .environment import MovingEnvironment
from .mpo import MPO
from .mps import MPS

Key2 = Tuple[QN, QN]


class EffectiveHamiltonian2:
    def __init__(self, me: MovingEnvironment, t: int):
        self.me = me
        self.t = t
        mpo, mps = me.mpo, me.ket
        g = mpo.group
        self.g = g
        self.target = mps.info.target
        L = mpo.n_sites
        assert 0 <= t < L - 1

        bond_l = mps.bond_info_at(t)
        bond_r = mps.bond_info_at(t + 2) if t + 2 <= L else None
        if t + 2 == L:
            bond_r = StateInfo.single(g, self.target)
        else:
            # derive from tensor t+1 left index? use tensor t+2's left index
            dims = {}
            for (ql, qp, qr), b in mps.tensors[t + 2].blocks.items():
                dims[ql] = max(dims.get(ql, 0), b.shape[0])
            bond_r = StateInfo(g, dims)
        site_l = mps.info.site_infos[t]
        site_r = mps.info.site_infos[t + 1]
        # complemented right bond: qc = target - q
        comp_r = StateInfo(g, {g.sub(self.target, q): d
                               for q, d in bond_r.items()})
        self.fl = FusedBasis(g, bond_l, site_l)
        self.fr = FusedBasis(g, site_r, comp_r)

        # active sectors
        self.psi_keys: List[Key2] = []
        for qL in self.fl.sectors():
            qR = g.sub(self.target, qL)
            if qR in self.fr.maps:
                self.psi_keys.append((qL, qR))
        self.psi_keys.sort()
        self.shapes = {
            (qL, qR): (self.fl.info[qL], self.fr.info[qR])
            for (qL, qR) in self.psi_keys}
        self.offsets: Dict[Key2, int] = {}
        off = 0
        for k in self.psi_keys:
            self.offsets[k] = off
            dl, dr = self.shapes[k]
            off += dl * dr
        self.size = off

        self._assemble(t)
        self._build_triples()

    # ------------------------------------------------------------------
    def _assemble(self, t: int) -> None:
        """Assemble LW[m]/RW[m] block operators on the fused bases."""
        g, mpo, me = self.g, self.me.mpo, self.me
        env_l = me.left_envs[t]
        env_r = me.right_envs[t + 2]
        assert env_l is not None and env_r is not None
        target = self.target
        active_l = {qL for (qL, _) in self.psi_keys}
        active_r = {qR for (_, qR) in self.psi_keys}
        quanta_l = mpo.site_quanta[t]
        quanta_r = mpo.site_quanta[t + 1]

        # LW[m][(qLb, qLk)] built from E_L[i] and W_t[(i, m)]
        LW: Dict[int, Dict[Key2, np.ndarray]] = {}
        for (i, m), w in mpo.tensors[t].items():
            if i not in env_l:
                continue
            e = env_l[i]
            for pb, pk in zip(*np.nonzero(w)):
                coef = w[pb, pk]
                qpb, qpk = quanta_l[int(pb)], quanta_l[int(pk)]
                for (qlb, qlk), eb in e.blocks.items():
                    qLb, qLk = g.add(qlb, qpb), g.add(qlk, qpk)
                    if qLb not in active_l or qLk not in active_l:
                        continue
                    ob, dlb, _ = self.fl.sub_offset(qLb, qlb, qpb)
                    ok, dlk, _ = self.fl.sub_offset(qLk, qlk, qpk)
                    dm = LW.setdefault(m, {})
                    blk = dm.get((qLb, qLk))
                    if blk is None:
                        blk = np.zeros((self.fl.info[qLb], self.fl.info[qLk]))
                        dm[(qLb, qLk)] = blk
                    blk[ob:ob + dlb, ok:ok + dlk] += coef * eb

        # RW[m][(qRb, qRk)] built from W_{t+1}[(m, o)] and E_R[o]
        RW: Dict[int, Dict[Key2, np.ndarray]] = {}
        for (m, o), w in mpo.tensors[t + 1].items():
            if o not in env_r:
                continue
            e = env_r[o]
            for pb, pk in zip(*np.nonzero(w)):
                coef = w[pb, pk]
                qpb, qpk = quanta_r[int(pb)], quanta_r[int(pk)]
                for (qb2, qk2), eb in e.blocks.items():
                    qRb = g.add(qpb, g.sub(target, qb2))
                    qRk = g.add(qpk, g.sub(target, qk2))
                    if qRb not in active_r or qRk not in active_r:
                        continue
                    ob, _, dbb = self.fr.sub_offset(
                        qRb, qpb, g.sub(target, qb2))
                    ok, _, dbk = self.fr.sub_offset(
                        qRk, qpk, g.sub(target, qk2))
                    dm = RW.setdefault(m, {})
                    blk = dm.get((qRb, qRk))
                    if blk is None:
                        blk = np.zeros((self.fr.info[qRb], self.fr.info[qRk]))
                        dm[(qRb, qRk)] = blk
                    blk[ob:ob + dbb, ok:ok + dbk] += coef * eb
        self.LW, self.RW = LW, RW

    def _build_triples(self) -> None:
        """Static contraction plan: (m, LW block key, psi key, RW block key,
        out psi key) for every nonvanishing sigma contribution."""
        g, target = self.g, self.target
        triples = []
        for m, lw in self.LW.items():
            rw = self.RW.get(m)
            if rw is None:
                continue
            for (qLb, qLk) in lw:
                qRk = g.sub(target, qLk)
                qRb = g.sub(target, qLb)
                if (qLk, qRk) not in self.shapes:
                    continue
                if (qRb, qRk) in rw and (qLb, qRb) in self.shapes:
                    triples.append((m, (qLb, qLk), (qLk, qRk),
                                    (qRb, qRk), (qLb, qRb)))
        self.triples = triples

    # ------------------------------------------------------------------
    def flatten(self, blocks: Dict[Key2, np.ndarray]) -> np.ndarray:
        x = np.zeros(self.size)
        for k, b in blocks.items():
            if k in self.offsets:
                off = self.offsets[k]
                x[off:off + b.size] = b.ravel()
        return x

    def unflatten(self, x: np.ndarray) -> Dict[Key2, np.ndarray]:
        out = {}
        for k in self.psi_keys:
            dl, dr = self.shapes[k]
            off = self.offsets[k]
            out[k] = x[off:off + dl * dr].reshape(dl, dr)
        return out

    # ------------------------------------------------------------------
    def matvec_np(self, x: np.ndarray) -> np.ndarray:
        psi = self.unflatten(x)
        sig = {k: np.zeros(self.shapes[k]) for k in self.psi_keys}
        for (m, lk, pk, rk, ok) in self.triples:
            sig[ok] += self.LW[m][lk] @ psi[pk] @ self.RW[m][rk].T
        return self.flatten(sig)

    def diagonal(self) -> np.ndarray:
        diag = {k: np.zeros(self.shapes[k]) for k in self.psi_keys}
        for m, lw in self.LW.items():
            rw = self.RW.get(m)
            if rw is None:
                continue
            for (qL, qR) in self.psi_keys:
                lb = lw.get((qL, qL))
                rb = rw.get((qR, qR))
                if lb is not None and rb is not None:
                    diag[(qL, qR)] += np.diag(lb)[:, None] * np.diag(rb)[None, :]
        return self.flatten(diag)

    # ------------------------------------------------------------------
    def initial_guess(self, tensor_l=None, tensor_r=None
                      ) -> Dict[Key2, np.ndarray]:
        """psi from contracting MPS tensors at t, t+1 into the fused bases.
        tensor_l/tensor_r override the site tensors (per-root centers for
        state-averaged sweeps, MultiMPS analog)."""
        g, target = self.g, self.target
        mps = self.me.ket
        Tl = tensor_l if tensor_l is not None else mps.tensors[self.t]
        Tr = tensor_r if tensor_r is not None else mps.tensors[self.t + 1]
        psi = {k: np.zeros(self.shapes[k]) for k in self.psi_keys}
        # index right blocks by left bond quantum
        rby: Dict[QN, List] = {}
        for (qm, qp, qr2), b in Tr.blocks.items():
            rby.setdefault(qm, []).append((qp, qr2, b))
        for (ql, qp, qm), bl in Tl.blocks.items():
            qL = g.add(ql, qp)
            if g.sub(target, qL) not in self.fr.maps:
                continue
            for (qp2, qr2, br) in rby.get(qm, []):
                qR = g.sub(target, qL)
                qc2 = g.sub(target, qr2)
                try:
                    lo, dl, dp = self.fl.sub_offset(qL, ql, qp)
                    ro, dp2, db = self.fr.sub_offset(qR, qp2, qc2)
                except KeyError:
                    continue
                mat = np.einsum("lpm,mqr->lpqr", bl, br, optimize=True)
                dl_, dp_, dq_, dr_ = mat.shape
                psi[(qL, qR)][lo:lo + dl_ * dp_, ro:ro + dq_ * dr_] += \
                    mat.reshape(dl_ * dp_, dq_ * dr_)
        return psi

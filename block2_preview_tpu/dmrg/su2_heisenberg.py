"""Spin-adapted (SU(2)) DMRG prototype: Heisenberg chain.

First non-abelian sweep engine, built on core/clebsch_gordan.py.  This is the
reduced-matrix (Wigner-Eckart) formulation of block2's SU2 universe
(reference src/core/sparse_matrix.hpp ConnectionInfo 9j recoupling;
src/dmrg/qc_mpo.hpp:1851 SU2 MPOQC) specialized to the spin-1/2 chain
H = J sum_i S_i . S_{i+1} = -sqrt(3) J sum_i [S_i (x) S_{i+1}]^0.

Conventions (validated numerically in tests/test_su2_recoupling.py):
  * Wigner-Eckart:  <j' m'| T^k_q |j m> = <j m; k q | j' m'> <j'||T||j>
  * coupled-product reduced element on a CG-fused basis:
      <(ja' jb') j' || [A^{k1} x B^{k2}]^{k} || (ja jb) j>
        = sqrt((2j+1)(2k+1)(2ja'+1)(2jb'+1))
          * 9j{ja jb j; k1 k2 k; ja' jb' j'} * <ja'||A||ja> <jb'||B||jb>
  * plain-coefficient convention: MPS tensors are reduced coefficients of
    fusion isometries, so canonical gauge is the unweighted sum_jr B B^T = 1
  * singlet-target reduced density matrix: rho(jL) =
      sum_{jR=jL} psi psi^T / (2jL+1)

All spins are DOUBLED integers.  The prototype omits center-wavefunction
propagation (the 6j fused-form flip, reference mps.hpp flip_fused_form) —
each center is solved from a random Davidson start; the fixed point is
identical.  MPO symbols: 0 = I (rank 0), 1 = S-pending (rank 1), 2 = H
(rank 0), the hand-coded 3-symbol Heisenberg MPO.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from ..core.clebsch_gordan import clebsch_gordan, wigner_9j
from ..ops.davidson import davidson

TJ_SITE = 1          # site spin 1/2 (doubled)
TK_S = 2             # spin-operator rank (doubled)
RANK = {0: 0, 1: TK_S, 2: 0}       # MPO symbol -> operator rank


def coupled_factor(ja, jb, j, k1, k2, k, jap, jbp, jp) -> float:
    return (np.sqrt((j + 1.0) * (k + 1.0) * (jap + 1.0) * (jbp + 1.0))
            * wigner_9j(ja, jb, j, k1, k2, k, jap, jbp, jp))


def spin_reduced_element() -> float:
    return 0.5 / clebsch_gordan(1, 2, 1, 1, 0, 1)


# MPO entries (i, o, op_rank, is_S, coeff_factor); coeff for S->H carries
# the -sqrt(3) J coupling
def _entries(jcoup: float):
    return [(0, 0, 0, False, 1.0),
            (0, 1, TK_S, True, 1.0),
            (1, 2, TK_S, True, -np.sqrt(3.0) * jcoup),
            (2, 2, 0, False, 1.0)]


class SU2HeisenbergDMRG:
    def __init__(self, L: int, j_coupling: float = 1.0, bond_dim: int = 64,
                 seed: int = 7, iprint: int = 0):
        assert L % 2 == 0, "singlet target needs even L"
        self.L = L
        self.J = j_coupling
        self.D = bond_dim
        self.iprint = iprint
        self.red_s = spin_reduced_element()
        self.bonds = self._fci_bonds(L, bond_dim)
        rng = np.random.RandomState(seed)
        self.tensors: List[Dict[Tuple[int, int], np.ndarray]] = []
        for t in range(L):
            blk = {}
            for jl, dl in self.bonds[t].items():
                for jr in {abs(jl - 1), jl + 1}:
                    dr = self.bonds[t + 1].get(jr, 0)
                    if dr:
                        blk[(jl, jr)] = rng.standard_normal((dl, dr))
            self.tensors.append(blk)
        self._canonicalize_right()
        self.lenvs: List[Optional[Dict]] = [None] * (L + 1)
        self.renvs: List[Optional[Dict]] = [None] * (L + 1)
        self.lenvs[0] = {0: {(0, 0): np.ones((1, 1))}}
        self.renvs[L] = {2: {(0, 0): np.ones((1, 1))}}
        for t in range(L - 1, 1, -1):
            self.renvs[t] = self._right_contract(t)
        self.energies: List[float] = []

    # ------------------------------------------------------------------
    @staticmethod
    def _fci_bonds(L, maxd):
        left = [{0: 1}]
        for t in range(L):
            nxt: Dict[int, int] = {}
            for j, m in left[t].items():
                for j2 in {abs(j - 1), j + 1}:
                    nxt[j2] = nxt.get(j2, 0) + m
            left.append(nxt)
        right = [None] * (L + 1)
        right[L] = {0: 1}
        for t in range(L - 1, -1, -1):
            nxt = {}
            for j, m in right[t + 1].items():
                for j2 in {abs(j - 1), j + 1}:
                    nxt[j2] = nxt.get(j2, 0) + m
            right[t] = nxt
        bonds = []
        for t in range(L + 1):
            caps = {j: min(left[t][j], right[t][j])
                    for j in left[t] if j in right[t]}
            tot = sum(caps.values())
            if tot > maxd:
                caps = {j: max(1, int(round(c * maxd / tot)))
                        for j, c in caps.items()}
            bonds.append(caps)
        return bonds

    def _canonicalize_right(self):
        for t in range(self.L - 1, 0, -1):
            blk = self.tensors[t]
            by_jl: Dict[int, List] = {}
            for (jl, jr), b in blk.items():
                by_jl.setdefault(jl, []).append((jr, b))
            # plain-coefficient convention: block states |R: j a> =
            # sum_{jr,b} B[(j,jr)]_{ab} |(s x R'(jr,b)) j>, so orthonormality
            # is sum_jr B B^T = 1 (no dimension weights)
            lmats = {}
            for jl, items in by_jl.items():
                items.sort(key=lambda x: x[0])
                m = np.concatenate([b for _, b in items], axis=1)
                q, r = np.linalg.qr(m.T)
                qt = q.T
                off = 0
                for (jr, b) in items:
                    blk[(jl, jr)] = qt[:, off:off + b.shape[1]]
                    off += b.shape[1]
                lmats[jl] = r.T
            prev = self.tensors[t - 1]
            for (jl, jr), b in list(prev.items()):
                if jr in lmats:
                    prev[(jl, jr)] = b @ lmats[jr]
                else:
                    del prev[(jl, jr)]

    # ------------------------------------------------------------------
    def _left_contract(self, t: int) -> Dict:
        """E'[o] on bond t+1 = rotate (E[i] x w) through A[t]."""
        env = self.lenvs[t]
        A = self.tensors[t]
        out: Dict[int, Dict[Tuple[int, int], np.ndarray]] = {}
        for (i, o, k_w, is_s, cf) in _entries(self.J):
            e = env.get(i)
            if e is None:
                continue
            red = cf * (self.red_s if is_s else 1.0)
            k_i, k_o = RANK[i], RANK[o]
            for (jlb, jlk), eb in e.items():
                for (jlb2, jrb), ab in A.items():
                    if jlb2 != jlb:
                        continue
                    for (jlk2, jrk), ak in A.items():
                        if jlk2 != jlk:
                            continue
                        fac = coupled_factor(jlk, TJ_SITE, jrk, k_i, k_w,
                                             k_o, jlb, TJ_SITE, jrb)
                        if abs(fac) < 1e-14:
                            continue
                        d = out.setdefault(o, {})
                        key = (jrb, jrk)
                        contrib = (fac * red) * (ab.T @ eb @ ak)
                        d[key] = d.get(key, 0) + contrib
        return out

    def _right_contract(self, t: int) -> Dict:
        """E'[i] on bond t = rotate (w x E[o]) through B[t]; right blocks are
        fused as (site x block)."""
        env = self.renvs[t + 1]
        B = self.tensors[t]
        out: Dict[int, Dict[Tuple[int, int], np.ndarray]] = {}
        for (i, o, k_w, is_s, cf) in _entries(self.J):
            e = env.get(o)
            if e is None:
                continue
            red = cf * (self.red_s if is_s else 1.0)
            k_i, k_o = RANK[i], RANK[o]
            for (jrb2, jrk2), eb in e.items():
                for (jlb, jrb), bb in B.items():
                    if jrb != jrb2:
                        continue
                    for (jlk, jrk), bk in B.items():
                        if jrk != jrk2:
                            continue
                        fac = coupled_factor(TJ_SITE, jrk, jlk, k_w, k_o,
                                             k_i, TJ_SITE, jrb, jlb)
                        if abs(fac) < 1e-14:
                            continue
                        d = out.setdefault(i, {})
                        key = (jlb, jlk)
                        contrib = (fac * red) * (bb @ eb @ bk.T)
                        d[key] = d.get(key, 0) + contrib
        return out

    # ------------------------------------------------------------------
    def _effective(self, t: int):
        """Two-site effective H at (t, t+1): fused-left sectors jL with runs
        (jl), fused-right sectors jR with runs (jr2 of bond t+2)."""
        env_l = self.lenvs[t]
        env_r = self.renvs[t + 2]
        bond_l = self.bonds_actual(t, "left")
        bond_r = self.bonds_actual(t + 2, "right")
        # fused sector runs
        fl: Dict[int, List[Tuple[int, int, int]]] = {}   # jL -> [(jl, off, d)]
        for jl, d in sorted(bond_l.items()):
            for jL in {abs(jl - 1), jl + 1}:
                runs = fl.setdefault(jL, [])
                off = sum(r[2] for r in runs)
                runs.append((jl, off, d))
        fr: Dict[int, List[Tuple[int, int, int]]] = {}
        for jr2, d in sorted(bond_r.items()):
            for jR in {abs(jr2 - 1), jr2 + 1}:
                runs = fr.setdefault(jR, [])
                off = sum(r[2] for r in runs)
                runs.append((jr2, off, d))
        # psi sectors: triangle(jL, jR, 0) -> jR == jL
        keys = sorted(set(fl) & set(fr))
        dims = {j: (sum(r[2] for r in fl[j]), sum(r[2] for r in fr[j]))
                for j in keys}
        offsets = {}
        off = 0
        for j in keys:
            offsets[j] = off
            off += dims[j][0] * dims[j][1]
        size = off

        # LW[m][(jLb, jLk)] from E_L[i] (x) w_t;  RW[m] from w_{t+1} (x) E_R
        LW: Dict[int, Dict[Tuple[int, int], np.ndarray]] = {}
        for (i, m, k_w, is_s, cf) in _entries(self.J):
            e = env_l.get(i)
            if e is None:
                continue
            red = cf * (self.red_s if is_s else 1.0)
            k_i, k_m = RANK[i], RANK[m]
            for (jlb, jlk), eb in e.items():
                for jLb in {abs(jlb - 1), jlb + 1}:
                    for jLk in {abs(jlk - 1), jlk + 1}:
                        if jLb not in fl or jLk not in fl:
                            continue
                        fac = coupled_factor(jlk, TJ_SITE, jLk, k_i, k_w,
                                             k_m, jlb, TJ_SITE, jLb)
                        if abs(fac) < 1e-14:
                            continue
                        ob = dict((r[0], (r[1], r[2])) for r in fl[jLb])
                        ok = dict((r[0], (r[1], r[2])) for r in fl[jLk])
                        if jlb not in ob or jlk not in ok:
                            continue
                        o1, d1 = ob[jlb]
                        o2, d2 = ok[jlk]
                        dm = LW.setdefault(m, {})
                        blk = dm.get((jLb, jLk))
                        if blk is None:
                            blk = np.zeros((sum(r[2] for r in fl[jLb]),
                                            sum(r[2] for r in fl[jLk])))
                            dm[(jLb, jLk)] = blk
                        blk[o1:o1 + d1, o2:o2 + d2] += (fac * red) * eb
        RW: Dict[int, Dict[Tuple[int, int], np.ndarray]] = {}
        for (m, o, k_w, is_s, cf) in _entries(self.J):
            e = env_r.get(o)
            if e is None:
                continue
            red = cf * (self.red_s if is_s else 1.0)
            k_m, k_o = RANK[m], RANK[o]
            for (jr2b, jr2k), eb in e.items():
                for jRb in {abs(jr2b - 1), jr2b + 1}:
                    for jRk in {abs(jr2k - 1), jr2k + 1}:
                        if jRb not in fr or jRk not in fr:
                            continue
                        fac = coupled_factor(TJ_SITE, jr2k, jRk, k_w, k_o,
                                             k_m, TJ_SITE, jr2b, jRb)
                        if abs(fac) < 1e-14:
                            continue
                        ob = dict((r[0], (r[1], r[2])) for r in fr[jRb])
                        ok = dict((r[0], (r[1], r[2])) for r in fr[jRk])
                        if jr2b not in ob or jr2k not in ok:
                            continue
                        o1, d1 = ob[jr2b]
                        o2, d2 = ok[jr2k]
                        dm = RW.setdefault(m, {})
                        blk = dm.get((jRb, jRk))
                        if blk is None:
                            blk = np.zeros((sum(r[2] for r in fr[jRb]),
                                            sum(r[2] for r in fr[jRk])))
                            dm[(jRb, jRk)] = blk
                        blk[o1:o1 + d1, o2:o2 + d2] += (fac * red) * eb

        # cross factors for total singlet: sigma = sum_m cross * LW psi RW^T
        def matvec(x):
            psi = {}
            for j in keys:
                o = offsets[j]
                d1, d2 = dims[j]
                psi[j] = x[o:o + d1 * d2].reshape(d1, d2)
            sig = {j: np.zeros(dims[j]) for j in keys}
            for m, lw in LW.items():
                rw = RW.get(m)
                if rw is None:
                    continue
                k_m = RANK[m]
                for (jLb, jLk), lb in lw.items():
                    if jLk not in keys or jLb not in keys:
                        continue
                    rb = rw.get((jLb, jLk))
                    if rb is None:
                        continue
                    cross = coupled_factor(jLk, jLk, 0, k_m, k_m, 0,
                                           jLb, jLb, 0)
                    if abs(cross) < 1e-14:
                        continue
                    sig[jLb] += cross * (lb @ psi[jLk] @ rb.T)
            out = np.zeros(size)
            for j in keys:
                o = offsets[j]
                out[o:o + sig[j].size] = sig[j].ravel()
            return out

        diag = np.zeros(size)
        for m, lw in LW.items():
            rw = RW.get(m)
            if rw is None:
                continue
            k_m = RANK[m]
            for j in keys:
                lb = lw.get((j, j))
                rb = rw.get((j, j))
                if lb is None or rb is None:
                    continue
                cross = coupled_factor(j, j, 0, k_m, k_m, 0, j, j, 0)
                o = offsets[j]
                d1, d2 = dims[j]
                diag[o:o + d1 * d2] += (cross * np.diag(lb)[:, None]
                                        * np.diag(rb)[None, :]).ravel()
        return keys, dims, offsets, size, fl, fr, matvec, diag

    def bonds_actual(self, t: int, side: str = "left") -> Dict[int, int]:
        """Bond-t dims.  side='left' reads tensors[t-1] columns (matches
        lenvs[t]); side='right' reads tensors[t] rows (matches renvs[t]) —
        the two differ transiently at the bond just decimated."""
        if t == 0 or t == self.L:
            return {0: 1}
        dims: Dict[int, int] = {}
        if side == "left":
            for (jl, jr), b in self.tensors[t - 1].items():
                dims[jr] = b.shape[1]
        else:
            for (jl, jr), b in self.tensors[t].items():
                dims[jl] = b.shape[0]
        return dims

    # ------------------------------------------------------------------
    def sweep(self, forward: bool, dav_thrd: float = 1e-9) -> float:
        L = self.L
        emin = np.inf
        rng = range(L - 1) if forward else range(L - 2, -1, -1)
        for t in rng:
            keys, dims, offsets, size, fl, fr, matvec, diag = \
                self._effective(t)
            x0 = np.random.RandomState(11 + t).standard_normal(size)
            x0 /= np.linalg.norm(x0)
            w, v, nmv = davidson(matvec, diag, x0, conv_thrd=dav_thrd,
                                 max_iter=120, max_subspace=25)
            emin = min(emin, float(w[0]))
            psi = {j: v[offsets[j]:offsets[j] + dims[j][0] * dims[j][1],
                        0].reshape(dims[j]) for j in keys}
            if forward:
                # rho(jL) = psi psi^T / (2jL+1)  (singlet target)
                eigs = []
                vecs = {}
                for j in keys:
                    r = psi[j] @ psi[j].T / (j + 1.0)
                    ww, vv = np.linalg.eigh(r)
                    vecs[j] = vv
                    eigs += [(float(x), j, i) for i, x in enumerate(ww)]
                eigs.sort(key=lambda z: -z[0])
                kept: Dict[int, List[int]] = {}
                budget = self.D
                for (x, j, i) in eigs:
                    if budget <= 0 or x <= 1e-14:
                        break
                    kept.setdefault(j, []).append(i)
                    budget -= 1
                new_tensor: Dict[Tuple[int, int], np.ndarray] = {}
                new_bond: Dict[int, int] = {}
                for j, idxs in kept.items():
                    vmat = vecs[j][:, idxs]
                    new_bond[j] = len(idxs)
                    for (jl, off, d) in fl[j]:
                        new_tensor[(jl, j)] = vmat[off:off + d, :]
                self.tensors[t] = new_tensor
                self.lenvs[t + 1] = self._left_contract(t)
                for u in range(t + 2, L + 1):
                    self.lenvs[u] = None
                for u in range(t + 1, -1, -1):
                    self.renvs[u] = None
            else:
                eigs = []
                vecs = {}
                for j in keys:
                    r = psi[j].T @ psi[j] / (j + 1.0)
                    ww, vv = np.linalg.eigh(r)
                    vecs[j] = vv
                    eigs += [(float(x), j, i) for i, x in enumerate(ww)]
                eigs.sort(key=lambda z: -z[0])
                kept = {}
                budget = self.D
                for (x, j, i) in eigs:
                    if budget <= 0 or x <= 1e-14:
                        break
                    kept.setdefault(j, []).append(i)
                    budget -= 1
                new_tensor = {}
                for j, idxs in kept.items():
                    vmat = vecs[j][:, idxs]        # (dimfr, k)
                    for (jr2, off, d) in fr[j]:
                        new_tensor[(j, jr2)] = vmat[off:off + d, :].T
                self.tensors[t + 1] = new_tensor
                self.renvs[t + 1] = self._right_contract(t + 1)
                for u in range(t, -1, -1):
                    self.renvs[u] = None
                for u in range(t + 1, L + 1):
                    self.lenvs[u] = None
                self.lenvs[0] = {0: {(0, 0): np.ones((1, 1))}}
            if self.iprint >= 2:
                print(f"  su2 {'-->' if forward else '<--'} site {t:3d} "
                      f"E = {w[0]:.10f} nmv={nmv}")
        self.energies.append(emin)
        return emin

    def solve(self, n_sweeps: int = 8, tol: float = 1e-9) -> float:
        last = np.inf
        forward = True
        for i in range(n_sweeps):
            e = self.sweep(forward)
            if self.iprint >= 1:
                print(f"su2 sweep {i}: E = {e:.12f}")
            if abs(e - last) < tol:
                break
            last = e
            forward = not forward
        return self.energies[-1]

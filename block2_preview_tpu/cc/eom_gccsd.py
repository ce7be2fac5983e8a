"""EOM-CCSD, lambda equations, and CC response densities.

TPU-native counterpart of the reference's Wick-generated EOM/lambda/RDM
coupled-cluster modules (reference pyblock2/cc/eom_gccsd.py,
lambda_gccsd.py, rdm_gccsd.py).  Rather than porting thousands of generated
contraction formulas, the similarity transform is evaluated *exactly* in
determinant space: T = T1 + T2 is a strictly excitation-raising (nilpotent)
sparse operator, so e^{T} is a finite polynomial and

    Hbar = e^{-T} H e^{T}

is exact.  Projecting Hbar onto the {0, singles, doubles} determinant basis
reproduces EOM-EE-CCSD matrices (and the {1h, 2h1p} / {1p, 2p1h} blocks give
IP/EA-EOM-CCSD); the ground-state left eigenvector is the Lambda vector, and
response densities follow as <0|(1+Lambda) e^{-T} p+q e^{T}|0>.  This is
algebraically identical to the formula-based route at small sizes (the
regime of the reference's numpy CC modules) and anchors in the tests:
the CC ground state is an exact right eigenvector of Hbar with eigenvalue
E_CCSD, EOM-EE == FCI for two-electron systems, and the response 1/2-RDMs
recontract to E_CCSD exactly.
"""

from __future__ import annotations

from itertools import combinations
from typing import Dict, List, Optional, Tuple

import numpy as np
import scipy.sparse as sp

from ..core.expr import build_term_table
from ..core.fcidump import FCIDUMP
from ..ops.local_ops import CRE_A, CRE_B, DES_A, DES_B
from ..utils.ed import term_table_to_sparse
from .gccsd import gccsd


def _so(p: int) -> Tuple[int, int]:
    """Spin-orbital p (site-major, alpha even) -> (site, cre code)."""
    return p // 2, (CRE_A if p % 2 == 0 else CRE_B)


def _op_string(L: int, ops: List[Tuple[int, bool]]) -> sp.csr_matrix:
    """Sparse many-body matrix of a product of spin-orbital c+/c ops;
    ops = [(spin_orbital, is_creation), ...] in operator order."""
    seq = []
    for p, cre in ops:
        site, code = _so(p)
        if not cre:
            code = {CRE_A: DES_A, CRE_B: DES_B}[code]
        seq.append((site, code))
    tt = build_term_table(L, [(1.0, seq)])
    return term_table_to_sparse(tt)


class GCCSDExact:
    """Determinant-space CCSD similarity transform for one FCIDUMP."""

    def __init__(self, fd: FCIDUMP, t1: Optional[np.ndarray] = None,
                 t2: Optional[np.ndarray] = None):
        self.fd = fd
        self.L = fd.n_sites
        self.n_so = 2 * self.L
        self.no = fd.n_elec
        if t1 is None:
            self.e_hf, self.e_corr, t1, t2 = gccsd(
                fd, return_amplitudes=True)
        self.t1, self.t2 = t1, t2
        self._build()

    # ------------------------------------------------------------------
    def _build(self):
        fd, L = self.fd, self.L
        from ..core.expr import qc_term_table
        self.h = term_table_to_sparse(qc_term_table(fd)).tocsr()
        no, n = self.no, self.n_so
        occ = range(no)
        vir = range(no, n)
        T = sp.csr_matrix(self.h.shape)
        for i in occ:
            for a in vir:
                c = self.t1[i, a - no]
                if abs(c) > 1e-14:
                    T = T + c * _op_string(L, [(a, True), (i, False)])
        for i in occ:
            for j in occ:
                if j <= i:
                    continue
                for a in vir:
                    for b in vir:
                        if b <= a:
                            continue
                        c = self.t2[i, j, a - no, b - no]
                        if abs(c) > 1e-14:
                            T = T + c * _op_string(
                                L, [(a, True), (b, True),
                                    (j, False), (i, False)])
        self.T = T.tocsr()
        # e^{+-T} by nilpotent Taylor series
        def expm(x):
            acc = sp.eye(x.shape[0], format="csr")
            term = sp.eye(x.shape[0], format="csr")
            k = 1
            while True:
                term = (term @ x) / k
                if term.nnz == 0:
                    break
                acc = acc + term
                k += 1
            return acc

        self.eT = expm(self.T)
        self.emT = expm(-self.T)
        self.hbar = (self.emT @ self.h @ self.eT).tocsr()

    # ------------------------------------------------------------------
    def _dets(self, n_elec: int, max_exc: int, twos: Optional[int] = None
              ) -> np.ndarray:
        """Product-basis indices of determinants within max_exc excitations
        of the aufbau reference, in the n_elec sector."""
        ref = frozenset(range(self.no))
        rows = []
        so_all = range(self.n_so)
        for occs in combinations(so_all, n_elec):
            s = frozenset(occs)
            # rank: 1h -> 1, 2h1p -> 2 (IP); 1p -> 1, 2p1h -> 2 (EA);
            # singles/doubles -> 1/2 (EE)
            if max(len(s - ref), len(ref - s)) > max_exc:
                continue
            if twos is not None:
                tz = sum(1 if p % 2 == 0 else -1 for p in occs)
                if tz != twos:
                    continue
            # encode as site-major base-4 product index
            idx = 0
            for t in range(self.L):
                a = (2 * t) in s
                b = (2 * t + 1) in s
                idx = idx * 4 + (3 if a and b else (1 if a else
                                                   (2 if b else 0)))
            rows.append(idx)
        return np.array(sorted(set(rows)), dtype=np.int64)

    # ------------------------------------------------------------------
    def eom_ee(self, n_roots: int = 4, twos: int = 0) -> np.ndarray:
        """EOM-EE-CCSD excitation energies (sorted, excluding the CC ground
        state), from Hbar in the {0, S, D} determinant space."""
        rows = self._dets(self.no, 2, twos=twos)
        hb = self.hbar[np.ix_(rows, rows)].toarray()
        w = np.linalg.eigvals(hb)
        w = np.sort(w.real)
        e_cc = self.e_hf + self.e_corr - self.fd.const_e
        # drop the ground state (equals e_cc)
        w = w[np.abs(w - e_cc) > 1e-9]
        return w[:n_roots] - e_cc

    def eom_ip(self, n_roots: int = 4) -> np.ndarray:
        """IP-EOM-CCSD ionization energies from the {1h, 2h1p} block."""
        rows = self._dets(self.no - 1, 2)
        hb = self.hbar[np.ix_(rows, rows)].toarray()
        w = np.sort(np.linalg.eigvals(hb).real)
        e_cc = self.e_hf + self.e_corr - self.fd.const_e
        return w[:n_roots] - e_cc

    def eom_ea(self, n_roots: int = 4) -> np.ndarray:
        """EA-EOM-CCSD electron-attachment energies ({1p, 2p1h} block)."""
        rows = self._dets(self.no + 1, 2)
        hb = self.hbar[np.ix_(rows, rows)].toarray()
        w = np.sort(np.linalg.eigvals(hb).real)
        e_cc = self.e_hf + self.e_corr - self.fd.const_e
        return w[:n_roots] - e_cc

    # ------------------------------------------------------------------
    def lambda_vector(self) -> Tuple[np.ndarray, np.ndarray]:
        """(l, r): ground-state left/right eigvectors of Hbar in {0,S,D},
        biorthonormalized <l|r> = 1 (the Lambda de-excitation state)."""
        if hasattr(self, "_lr_cache"):
            return self._lr_cache
        rows = self._dets(self.no, 2, twos=self.fd.twos)
        hb = self.hbar[np.ix_(rows, rows)].toarray()
        e_cc = self.e_hf + self.e_corr - self.fd.const_e
        w, vr = np.linalg.eig(hb)
        k = int(np.argmin(np.abs(w - e_cc)))
        r = vr[:, k].real
        wl, vl = np.linalg.eig(hb.T)
        kl = int(np.argmin(np.abs(wl - e_cc)))
        l = vl[:, kl].real
        l = l / (l @ r)
        self._rdm_rows = rows
        self._lr_cache = (l, r)
        return l, r

    def rdm1(self) -> np.ndarray:
        """Spin-orbital response 1-RDM
        gamma_pq = <l| e^{-T} p+ q e^{T} |r> (p+q in spin orbitals)."""
        l, r = self.lambda_vector()
        rows = self._rdm_rows
        n = self.n_so
        dm = np.zeros((n, n))
        for p in range(n):
            for q in range(n):
                if (p - q) % 2 != 0:
                    continue
                op = _op_string(self.L, [(p, True), (q, False)])
                m = (self.emT @ op @ self.eT)[np.ix_(rows, rows)]
                dm[p, q] = float(l @ (m @ r))
        return dm

    def rdm2(self) -> np.ndarray:
        """Spin-orbital response 2-RDM
        gamma_pqrs = <l| e^{-T} p+ q+ s r e^{T} |r>."""
        l, r = self.lambda_vector()
        rows = self._rdm_rows
        n = self.n_so
        dm = np.zeros((n, n, n, n))
        for p in range(n):
            for q in range(p + 1, n):
                for rr in range(n):
                    for ss in range(rr + 1, n):
                        op = _op_string(self.L, [(p, True), (q, True),
                                                 (ss, False), (rr, False)])
                        m = (self.emT @ op @ self.eT)[np.ix_(rows, rows)]
                        val = float(l @ (m @ r))
                        dm[p, q, rr, ss] = val
                        dm[q, p, rr, ss] = -val
                        dm[p, q, ss, rr] = -val
                        dm[q, p, ss, rr] = val
        return dm

    def energy_from_rdms(self) -> float:
        """E = const + sum h gamma1 + 1/4 sum <pq||rs> gamma2 — must equal
        E_CCSD (response densities are energy-consistent)."""
        from ..uc.mp import spin_orbital_integrals
        h, v = spin_orbital_integrals(self.fd)
        g1 = self.rdm1()
        g2 = self.rdm2()
        return float(np.einsum("pq,pq->", h, g1)
                     + 0.25 * np.einsum("pqrs,pqrs->", v, g2)
                     + self.fd.const_e)

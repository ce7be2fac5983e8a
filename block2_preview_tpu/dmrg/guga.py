"""GUGA distinct row table (DRT) and CSF spaces.

TPU-native counterpart of the reference's graphical-unitary-group
machinery (reference src/big_site/drt_big_site.hpp:51 DRT,
src/big_site/csf_big_site.hpp:43 CSFSpace, src/ic/guga_drt.hpp): the
spin-adapted configuration state function (CSF) basis as lattice walks
through the Paldus table.

A DRT row is (k, n, 2s): k orbitals remain, n electrons, total spin 2s.
Each orbital contributes a step d in {0, u, d, 2}:

    d=0 : empty          (n, 2s) -> (n,   2s)
    d=1 : singly, up     (n, 2s) -> (n-1, 2s-1)
    d=2 : singly, down   (n, 2s) -> (n-1, 2s+1)
    d=3 : doubly         (n, 2s) -> (n-2, 2s)

walked from the target row (norb, N, 2S) down to the vacuum (0, 0, 0).
CSF count obeys the Weyl-Paldus dimension formula (tested).  CSFs expand
into determinants via sequential Clebsch-Gordan coupling, giving
spin-pure CASCI/MRCI spaces (`CSFSpace.hamiltonian`), the basis of the
reference's CSF big site.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..core.clebsch_gordan import clebsch_gordan

# step -> (dn, d2s) walking DOWN the chain (removing one orbital)
_STEPS = ((0, 0), (1, 1), (1, -1), (2, 0))


class DRT:
    """Distinct row table for (n_orbs, n_elec, twos)."""

    def __init__(self, n_orbs: int, n_elec: int, twos: int):
        self.n_orbs = n_orbs
        self.n_elec = n_elec
        self.twos = twos
        # rows[k] = sorted list of (n, 2s) reachable with k orbitals left
        rows: List[List[Tuple[int, int]]] = [[] for _ in range(n_orbs + 1)]
        rows[n_orbs] = [(n_elec, twos)]
        for k in range(n_orbs, 0, -1):
            nxt = set()
            for (n, s2) in rows[k]:
                for (dn, ds) in _STEPS:
                    n2, s22 = n - dn, s2 - ds
                    # Paldus validity: a=(n-2s)/2 >= 0, b=2s >= 0,
                    # a+b <= k-1  <=>  n+2s <= 2(k-1) ... with s22 doubled
                    if n2 >= 0 and s22 >= 0 and (n2 - s22) % 2 == 0 \
                            and n2 + s22 <= 2 * (k - 1) \
                            and (n2 - s22) // 2 + s22 <= (k - 1):
                        nxt.add((n2, s22))
            rows[k - 1] = sorted(nxt)
        # prune rows that cannot reach the vacuum
        ok: List[set] = [set() for _ in range(n_orbs + 1)]
        ok[0] = {(0, 0)} & set(rows[0])
        for k in range(1, n_orbs + 1):
            for (n, s2) in rows[k]:
                for (dn, ds) in _STEPS:
                    if (n - dn, s2 - ds) in ok[k - 1]:
                        ok[k].add((n, s2))
                        break
        self.rows = [sorted(ok[k]) for k in range(n_orbs + 1)]
        self.row_id = [
            {r: i for i, r in enumerate(self.rows[k])}
            for k in range(n_orbs + 1)]
        # walk counts to vacuum (the "x" array of the Paldus table)
        self.counts: List[np.ndarray] = [
            np.zeros(len(self.rows[k]), dtype=np.int64)
            for k in range(n_orbs + 1)]
        if self.rows[0]:
            self.counts[0][:] = 1
        for k in range(1, n_orbs + 1):
            for i, (n, s2) in enumerate(self.rows[k]):
                tot = 0
                for (dn, ds) in _STEPS:
                    j = self.row_id[k - 1].get((n - dn, s2 - ds))
                    if j is not None:
                        tot += self.counts[k - 1][j]
                self.counts[k][i] = tot

    @property
    def n_csf(self) -> int:
        return int(self.counts[self.n_orbs][0]) if self.rows[self.n_orbs] \
            else 0

    def csfs(self) -> List[Tuple[int, ...]]:
        """All CSFs as step-vectors (d_1 ... d_norb), orbital 1 first."""
        out: List[Tuple[int, ...]] = []

        def walk(k, n, s2, acc):
            if k == 0:
                if (n, s2) == (0, 0):
                    out.append(tuple(reversed(acc)))
                return
            for d, (dn, ds) in enumerate(_STEPS):
                n2, s22 = n - dn, s2 - ds
                if (n2, s22) in self.row_id[k - 1]:
                    walk(k - 1, n2, s22, acc + [d])

        if self.rows[self.n_orbs]:
            walk(self.n_orbs, self.n_elec, self.twos, [])
        return out


def weyl_paldus_dim(n_orbs: int, n_elec: int, twos: int) -> int:
    """Weyl-Paldus dimension formula for the spin-adapted CI space."""
    from math import comb
    b = twos
    a = (n_elec - b) // 2
    n = n_orbs
    if a < 0 or a + b > n_elec or (n_elec - b) % 2:
        return 0
    return (b + 1) * comb(n + 1, a) * comb(n + 1, a + b + 1) // (n + 1)


def csf_to_determinants(steps: Sequence[int]
                        ) -> Dict[Tuple[int, ...], float]:
    """Expand one CSF (step vector) into Sz=S determinants.

    Returns {occ pattern (0/1/2/3 per orbital in the site-basis coding
    empty/up/down/double): coefficient}.  Sequential CG coupling: the
    partial state after k orbitals is a linear combination of
    determinant prefixes with total Sz = S_k (stretched state),
    recursively built with Clebsch-Gordan coefficients
    (reference csf_big_site.hpp:43 CSFSpace csf-det transform)."""
    # states: prefix -> {m2: <prefix | S_k, m2>}; sequential CG coupling
    s2 = 0
    states: Dict[Tuple[int, ...], Dict[int, float]] = {(): {0: 1.0}}
    for d in steps:
        new: Dict[Tuple[int, ...], Dict[int, float]] = {}
        if d == 0 or d == 3:
            occ = 0 if d == 0 else 3
            for pre, amps in states.items():
                new[pre + (occ,)] = dict(amps)
            s2_new = s2
        else:
            s2_new = s2 + 1 if d == 1 else s2 - 1
            for pre, amps in states.items():
                for m2, amp in amps.items():
                    for sz2, occ in ((1, 1), (-1, 2)):
                        m2n = m2 + sz2
                        if abs(m2n) > s2_new:
                            continue
                        cg = clebsch_gordan(s2, 1, s2_new, m2, sz2, m2n)
                        if abs(cg) < 1e-14:
                            continue
                        key = pre + (occ,)
                        dd = new.setdefault(key, {})
                        dd[m2n] = dd.get(m2n, 0.0) + amp * cg
        s2 = s2_new
        states = new
    # keep the stretched component m2 == s2 (Sz = S)
    out: Dict[Tuple[int, ...], float] = {}
    for pre, amps in states.items():
        c = amps.get(s2, 0.0)
        if abs(c) > 1e-14:
            out[pre] = c
    return out


class CSFSpace:
    """Spin-adapted CI space over `n_orbs` orbitals (reference
    csf_big_site.hpp CSFSpace): CSF list, determinant expansion matrix,
    and spin-pure Hamiltonians."""

    def __init__(self, n_orbs: int, n_elec: int, twos: int):
        self.drt = DRT(n_orbs, n_elec, twos)
        self.n_orbs = n_orbs
        self.n_elec = n_elec
        self.twos = twos
        self.csf_steps = self.drt.csfs()

    @property
    def n_csf(self):
        return len(self.csf_steps)

    def expansion(self) -> Tuple[np.ndarray, List[Tuple[int, ...]]]:
        """(C [n_det, n_csf], det list): CSF j = sum_d C[d, j] |det_d>,
        dets as site-basis occupation tuples with Sz = S."""
        det_id: Dict[Tuple[int, ...], int] = {}
        dets: List[Tuple[int, ...]] = []
        cols = []
        for steps in self.csf_steps:
            exp = csf_to_determinants(steps)
            col = []
            for det, c in exp.items():
                if det not in det_id:
                    det_id[det] = len(dets)
                    dets.append(det)
                col.append((det_id[det], c))
            cols.append(col)
        C = np.zeros((len(dets), len(cols)))
        for j, col in enumerate(cols):
            for (i, c) in col:
                C[i, j] = c
        return C, dets

    def hamiltonian(self, fd) -> np.ndarray:
        """H in the CSF basis (C^T H_det C), spin-pure by construction."""
        from ..core.expr import qc_term_table
        from ..utils.ed import term_table_to_sparse
        C, dets = self.expansion()
        h = term_table_to_sparse(qc_term_table(fd))
        # map dets (site tuples) to global product-basis indices
        idx = np.zeros(len(dets), dtype=np.int64)
        for i, det in enumerate(dets):
            v = 0
            for o in det:
                v = v * 4 + o
            idx[i] = v
        hd = h[np.ix_(idx, idx)].toarray()
        return C.T @ hd @ C


def su2_csf_coefficients(engine, cutoff: float = 1e-8,
                         max_csfs: int = 100000
                         ) -> List[Tuple[float, Tuple[int, ...]]]:
    """CSF (Gelfand / DRT-basis) coefficients of a spin-adapted MPS.

    The SU(2) engine's reduced MPS *is* a DRT-MPS (reference
    src/big_site/drt_mps.hpp:31 DRTMPS; DRT rows = the bond sectors
    (N, 2S, pg)): each GUGA step d in {0,1,2,3} picks the site
    multiplet (empty / singly with 2S' = 2S+1 / singly with 2S' = 2S-1
    / doubly occupied), and the coefficient of a CSF is the product of
    reduced matrix elements along its DRT path (machine-verified
    against the determinant expansion in tests/test_drt_mps.py).

    Returns [(coeff, steps)] sorted by |coeff| descending, filtered at
    `cutoff`.  Requires left-fusion form (center absorbed at the last
    site); a forward sweep is run if the engine last swept backward.
    """
    if engine._forward_next:
        engine.sweep(True, dav_thrd=1e-12)
    L = engine.L
    T = tuple(engine.T)
    LV = tuple(getattr(engine, "LV", (0, 0, 0)))
    pgs = [int(p) for p in engine.site_pgs]
    results: List[Tuple[float, Tuple[int, ...]]] = []

    def dfs(t: int, q, vec, steps):
        if len(results) >= max_csfs:
            return
        if t == L:
            if q == T and abs(vec[0]) >= cutoff:
                results.append((float(vec[0]), steps))
            return
        n, s2, pg = q
        for d, (m, q2) in enumerate((
                (0, (n, s2, pg)),
                (1, (n + 1, s2 + 1, pg ^ pgs[t])),
                (1, (n + 1, s2 - 1, pg ^ pgs[t])),
                (2, (n + 2, s2, pg ^ pgs[t])))):
            if q2[1] < 0:
                continue
            blk = engine.tensors[t].get((q, m, q2))
            if blk is None:
                continue
            v2 = vec @ blk
            if float(np.abs(v2).max(initial=0.0)) < 1e-14:
                continue
            dfs(t + 1, q2, v2, steps + (d,))

    dfs(0, LV, np.ones(1), ())
    results.sort(key=lambda x: -abs(x[0]))
    return results

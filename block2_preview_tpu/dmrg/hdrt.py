"""Hamiltonian distinct-row table (HDRT) and its path-factorized MPO.

TPU-native counterpart of the reference's Hamiltonian-DRT experiments
(reference src/big_site/drt_big_site.hpp:421 HDRT;
src/big_site/drt_mps.hpp:563 HDRTMPO): second-quantized operator
strings are enumerated as paths of a distinct-row table whose rows are
(level k, accumulated quantum, accumulated operator rank) and whose
steps are the per-site elementary-operator tuples occurring in the
Hamiltonian.  An operator is then a coefficient vector over the path
space, and HDRTMPO factorizes that vector into per-arc routing matrices
(the reference's from_ci_vector/to_ci_vector pair) — the symbolic
skeleton shared by DRT-MPS (dmrg/guga.su2_csf_coefficients) on the
operator side.

Row convention (site-ascending walk): a row at level k holds the
(quantum, rank) accumulated by the ops at sites >= k, so the single
terminal row at level L is (0, 0) and the init rows at level 0 are the
distinct (total delta quantum, total rank) of the operator.  A no-op
site is one structural step (d = 0) whose physical matrix is the
Jordan-Wigner Z iff the child row's remaining rank is odd — the same
dressing core/expr.term_row applies (reference src/dmrg/
qc_hamiltonian.hpp:40 SZ site-operator conventions).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..core.expr import RawTerm
from ..core.symmetry import SZ_GROUP, QN, SymmetryGroup
from ..ops.local_ops import SZ_SITE, SiteBasisSpec

Arc = Tuple[int, ...]          # per-site elementary-op tuple; () = no op


def _elem_dq(spec: SiteBasisSpec, group: SymmetryGroup, e: int) -> QN:
    """Delta quantum of elementary op e from its matrix sparsity."""
    m = spec.elem_mats[e]
    qs = spec.quanta(0)
    b, k = next(zip(*np.nonzero(m)))
    return group.sub(qs[int(b)], qs[int(k)])


class HDRT:
    """Distinct-row table over the operator strings of a term list.

    rows[k]: list of (QN, rank) at level k (k = 0..L); row_index[k] maps
    state -> position.  arcs[k]: dict (row at k, Arc) -> row at k+1.
    xs[k][j]: number of paths from rows[k][j] to the terminal row.
    """

    def __init__(self, n_sites: int, raw_terms: Sequence[RawTerm],
                 group: SymmetryGroup = SZ_GROUP,
                 spec: SiteBasisSpec = SZ_SITE,
                 site_pgs: Optional[Sequence[int]] = None):
        self.n_sites = L = n_sites
        self.group = g = group
        self.spec = spec
        self.pgs = [0] * L if site_pgs is None else [int(p)
                                                     for p in site_pgs]
        dq_of = {e: _elem_dq(spec, g, e) for e in spec.elem_mats}
        xor_ix = [i for i, k in enumerate(g.kinds) if k == "xor"]

        def _site_dq(t: int, arc: Arc) -> QN:
            q = g.zero
            for e in arc:
                q = g.add(q, dq_of[e])
            if (len(arc) & 1) and xor_ix:
                # odd-rank site ops carry the orbital's point-group
                # label (XOR), matching the term-table convention
                pq = list(g.zero)
                pq[xor_ix[0]] = self.pgs[t]
                q = g.add(q, tuple(pq))
            return q

        # per-site step alphabets + per-term per-site arcs
        per_term: List[Tuple[float, List[Arc]]] = []
        alpha: List[Dict[Arc, QN]] = [dict() for _ in range(L)]
        for coef, ops in raw_terms:
            arcs: List[List[int]] = [[] for _ in range(L)]
            for s, e in ops:
                arcs[s].append(e)
            row = [tuple(a) for a in arcs]
            per_term.append((coef, row))
            for t, a in enumerate(row):
                if a and a not in alpha[t]:
                    alpha[t][a] = _site_dq(t, a)
        self.alphabets = alpha

        # forward reachability (suffix-state convention: walk sites
        # ascending, subtracting each site's contribution from the
        # level-0 totals down to the (0,0) terminal); init rows are the
        # distinct term totals
        inits: Dict[Tuple[QN, int], None] = {}
        for coef, row in per_term:
            q, r = g.zero, 0
            for t, a in enumerate(row):
                if a:
                    q = g.add(q, alpha[t][a])
                    r += len(a)
            inits[(q, r)] = None
        fwd: List[Dict[Tuple[QN, int], None]] = [dict(inits)]
        for t in range(L):
            nxt: Dict[Tuple[QN, int], None] = {}
            for (q, r) in fwd[t]:
                nxt[(q, r)] = None                         # no-op step
                for a, dq in alpha[t].items():
                    if len(a) <= r:
                        nxt[(g.sub(q, dq), r - len(a))] = None
            fwd.append(nxt)
        # backward pruning from the terminal (0, 0)
        zero = (g.zero, 0)
        bwd: List[set] = [set() for _ in range(L + 1)]
        bwd[L] = {zero} if zero in fwd[L] else set()
        for t in range(L - 1, -1, -1):
            keep = set()
            for (q, r) in fwd[t]:
                if (q, r) in bwd[t + 1]:
                    keep.add((q, r))
                    continue
                for a, dq in alpha[t].items():
                    if len(a) <= r and \
                            (g.sub(q, dq), r - len(a)) in bwd[t + 1]:
                        keep.add((q, r))
                        break
            bwd[t] = keep
        self.rows: List[List[Tuple[QN, int]]] = [
            sorted(bwd[t], key=lambda s: (s[1], s[0])) for t in
            range(L + 1)]
        self.row_index: List[Dict[Tuple[QN, int], int]] = [
            {s: i for i, s in enumerate(rs)} for rs in self.rows]

        # arcs + path counts xs (suffix paths to terminal)
        self.arcs: List[Dict[Tuple[int, Arc], int]] = [dict()
                                                       for _ in range(L)]
        self.xs: List[np.ndarray] = [None] * (L + 1)
        self.xs[L] = np.ones(len(self.rows[L]), dtype=np.int64)
        for t in range(L - 1, -1, -1):
            cnt = np.zeros(len(self.rows[t]), dtype=np.int64)
            for j, (q, r) in enumerate(self.rows[t]):
                steps: List[Tuple[Arc, Tuple[QN, int]]] = [((), (q, r))]
                for a, dq in alpha[t].items():
                    if len(a) <= r:
                        steps.append((a, (g.sub(q, dq), r - len(a))))
                for a, child in steps:
                    ci = self.row_index[t + 1].get(child)
                    if ci is not None:
                        self.arcs[t][(j, a)] = ci
                        cnt[j] += self.xs[t + 1][ci]
            self.xs[t] = cnt
        self.n_paths = int(sum(self.xs[0][self.row_index[0][s]]
                               for s in inits if s in self.row_index[0]))
        # init row offsets in path-index order
        self.init_states = [s for s in sorted(
            inits, key=lambda s: (s[1], s[0])) if s in self.row_index[0]]
        self.init_offset: Dict[Tuple[QN, int], int] = {}
        off = 0
        for s in self.init_states:
            self.init_offset[s] = off
            off += int(self.xs[0][self.row_index[0][s]])
        self._per_term = per_term
        self._raw_terms = [(c, list(ops)) for c, ops in raw_terms]

    # ------------------------------------------------------------------
    def _arc_order(self, t: int, j: int) -> List[Tuple[Arc, int]]:
        """Deterministic arc ordering at (level t, row j): no-op first,
        then alphabet arcs sorted."""
        out = []
        if (j, ()) in self.arcs[t]:
            out.append(((), self.arcs[t][(j, ())]))
        for a in sorted(self.alphabets[t]):
            if (j, a) in self.arcs[t]:
                out.append((a, self.arcs[t][(j, a)]))
        return out

    def index(self, ops: Sequence[Tuple[int, int]]) -> int:
        """Path index of the operator string [(site, elem), ...]."""
        g = self.group
        arcs: List[List[int]] = [[] for _ in range(self.n_sites)]
        for s, e in ops:
            arcs[s].append(e)
        row = [tuple(a) for a in arcs]
        q, r = g.zero, 0
        for t, a in enumerate(row):
            if a:
                q = g.add(q, self.alphabets[t][a])
                r += len(a)
        state = (q, r)
        ix = self.init_offset[state]
        j = self.row_index[0][state]
        for t in range(self.n_sites):
            for a, child in self._arc_order(t, j):
                if a == row[t]:
                    j = child
                    break
                ix += int(self.xs[t + 1][child])
            else:
                raise KeyError(f"no arc for {row[t]} at site {t}")
        return ix

    def term(self, ix: int) -> List[Tuple[int, int]]:
        """Inverse of index(): operator string of a path index."""
        off = 0
        state = None
        for s in self.init_states:
            n = int(self.xs[0][self.row_index[0][s]])
            if ix < off + n:
                state = s
                break
            off += n
        if state is None:
            raise IndexError(ix)
        rem = ix - off
        j = self.row_index[0][state]
        ops: List[Tuple[int, int]] = []
        for t in range(self.n_sites):
            for a, child in self._arc_order(t, j):
                n = int(self.xs[t + 1][child])
                if rem < n:
                    ops.extend((t, e) for e in a)
                    j = child
                    break
                rem -= n
            else:
                raise IndexError(ix)
        return ops

    def coeff_vector(self) -> np.ndarray:
        """Coefficient vector of the constructing term list over the
        path space (duplicate strings accumulate).  Path strings are
        site-ascending, so each fermionic term's coefficient folds the
        sign of the stable site-sort of its original op order — the
        same convention core/expr.term_row applies."""
        from ..core.expr import _inversion_parity
        v = np.zeros(self.n_paths)
        fermi = self.spec.fermionic
        for (coef, row), (_, ops0) in zip(self._per_term,
                                          self._raw_terms):
            ops = [(t, e) for t, a in enumerate(row) for e in a]
            if fermi and _inversion_parity([s for s, _ in ops0]):
                coef = -coef
            v[self.index(ops)] += coef
        return v


class HDRTMPO:
    """Path-factorized operator over an HDRT (reference drt_mps.hpp:563
    HDRTMPO.from_ci_vector / to_ci_vector): per-arc routing matrices of
    shape [paths(parent), paths(child)] carrying 1s (selection) except
    at the first site, where the coefficient vector enters."""

    def __init__(self, hdrt: HDRT, coef: np.ndarray):
        self.hdrt = hdrt
        coef = np.asarray(coef, dtype=np.float64)
        assert coef.shape == (hdrt.n_paths,)
        L = hdrt.n_sites
        self.data: List[Dict[Tuple[int, Arc], np.ndarray]] = [
            dict() for _ in range(L)]
        for t in range(L):
            for (j, a), child in hdrt.arcs[t].items():
                pj = int(hdrt.xs[t][j])
                pc = int(hdrt.xs[t + 1][child])
                m = np.zeros((pj, pc))
                # paths through this arc occupy the contiguous slot
                # range [lo, lo + pc) of the parent's path ordering
                lo = 0
                for a2, c2 in hdrt._arc_order(t, j):
                    if a2 == a:
                        break
                    lo += int(hdrt.xs[t + 1][c2])
                if t == 0:
                    # coefficients enter at the first consumed site
                    # (reference from_ci_vector: init-row factors carry
                    # ci, every later factor is a 1.0 selection)
                    base = None
                    for s in hdrt.init_states:
                        if hdrt.row_index[0][s] == j:
                            base = hdrt.init_offset[s]
                            break
                    for x in range(pc):
                        m[lo + x, x] = coef[base + lo + x]
                else:
                    for x in range(pc):
                        m[lo + x, x] = 1.0
                self.data[t][(j, a)] = m

    def to_coeff_vector(self) -> np.ndarray:
        """Contract the factors back to the path-space vector (reference
        to_ci_vector): vec[row][x] = product of factor entries along
        path x below the row, accumulated right to left."""
        h = self.hdrt
        vecs: Dict[int, np.ndarray] = {
            h.row_index[h.n_sites][(h.group.zero, 0)]: np.ones(1)}
        for t in range(h.n_sites - 1, -1, -1):
            new: Dict[int, np.ndarray] = {}
            for j in range(len(h.rows[t])):
                v = None
                for a, child in h._arc_order(t, j):
                    cv = vecs.get(child)
                    m = self.data[t].get((j, a))
                    if cv is None or m is None:
                        continue
                    if v is None:
                        v = np.zeros(int(h.xs[t][j]))
                    v += m @ cv
                if v is not None:
                    new[j] = v
            vecs = new
        out = np.zeros(h.n_paths)
        for s in h.init_states:
            j = h.row_index[0][s]
            v = vecs.get(j)
            if v is not None:
                off = h.init_offset[s]
                out[off:off + len(v)] = v
        return out

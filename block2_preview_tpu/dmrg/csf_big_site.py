"""CSF big site: the external orbital space as ONE spin-adapted site.

TPU-native counterpart of block2's CSFBigSite (reference
src/big_site/csf_big_site.hpp:43 CSFSpace, :1060 CSFBigSite) used for
spin-adapted uncontracted MRCISD: the external orbitals are restricted
to <= 2 electrons and enter the SU(2) sweep engine (dmrg/su2_fermion.py)
as a single site whose multiplets are the CSF sectors (N, 2S, pg) of the
restricted space, with coupled-composite operator matrices reduced via
Wigner-Eckart.

The restricted determinant basis is polynomial — 1 + 2n + C(2n, 2)
states for n external orbitals — so everything here (multiplet
decomposition, operator products, reductions) is dense linear algebra
on a small space even for large n.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..core.clebsch_gordan import clebsch_gordan


class ExternalSpace:
    """Determinant space of n external orbitals with N <= max_elec,
    decomposed into SU(2) multiplets.

    Spin-orbital index = 2*orb + s (s=0 up, 1 dn); a determinant is the
    sorted tuple of occupied spin orbitals with the convention
    |d> = c+_{d1} c+_{d2} ... |0>, d1 < d2 < ...
    """

    def __init__(self, n_orbs: int, pgs: Optional[Sequence[int]] = None,
                 max_elec: int = 2, basis: str = "s2"):
        """basis: "s2" (multiplets from S^2 diagonalization) or "drt"
        (Gelfand CSFs enumerated from the GUGA distinct row table,
        reference src/big_site/drt_big_site.hpp:1964 DRTBigSite) — the
        same space in a different canonical basis."""
        self.n_orbs = n_orbs
        self.pgs = [0] * n_orbs if pgs is None else [int(p) for p in pgs]
        self.max_elec = max_elec
        self.basis = basis
        # arbitrary CI order (reference DRTBigSite drt_big_site.hpp:1964
        # supports any number of external electrons; max_elec=2 is the
        # MRCISD case, 3 = MRCISDT, ...); the determinant work space is
        # C(2n, max_elec+2) — guard against accidental blowups
        nso = 2 * n_orbs
        # WORK space: N <= max_elec + 2 so composites whose creation
        # parts act before their annihilation parts keep exact
        # intermediates; the multiplet (physical) basis below is
        # restricted to N <= max_elec
        from itertools import combinations
        work_max = min(max_elec + 2, nso)
        from math import comb
        work_dim = sum(comb(nso, ne) for ne in range(work_max + 1))
        assert work_dim <= 200_000, (
            f"external work space {work_dim} determinants is too large "
            f"for the dense composite construction (n_orbs={n_orbs}, "
            f"max_elec={max_elec})")
        dets: List[Tuple[int, ...]] = []
        for ne in range(work_max + 1):
            dets += list(combinations(range(nso), ne))
        self.dets = dets
        self.index = {d: i for i, d in enumerate(dets)}
        D = len(dets)
        self.dim = D

        # elementary creation matrices (within-space projection)
        self.cre = [np.zeros((D, D)) for _ in range(nso)]
        for i, d in enumerate(dets):
            for p in range(nso):
                if p in d:
                    continue
                nd = tuple(sorted(d + (p,)))
                j = self.index.get(nd)
                if j is None:
                    continue
                sign = (-1) ** sum(1 for x in d if x < p)
                self.cre[p][j, i] = sign
        self.des = [c.T.copy() for c in self.cre]

        # quantum numbers per det
        self.det_n = np.array([len(d) for d in dets])
        self.det_tsz = np.array([sum(1 if p % 2 == 0 else -1 for p in d)
                                 for d in dets])
        pg_of_so = [self.pgs[p // 2] for p in range(nso)]
        self.det_pg = np.array(
            [int(np.bitwise_xor.reduce([pg_of_so[p] for p in d]))
             if d else 0 for d in dets])

        # S^2 and lowering operator
        sp = np.zeros((D, D))
        for o in range(n_orbs):
            sp += self.cre[2 * o] @ self.des[2 * o + 1]
        sm = sp.T
        sz = 0.5 * np.diag(self.det_tsz.astype(np.float64))
        s2 = sm @ sp + sz @ (sz + np.eye(D))
        self._sminus = sm

        # multiplet decomposition: highest-weight states per (N, pg, S)
        self.mults: List[Tuple[int, int, int]] = []
        # component basis: U columns indexed by flat component id;
        # comp_cols[m] = {tsz: column index}
        self.comp_cols: List[Dict[int, int]] = []
        cols: List[np.ndarray] = []

        def add_multiplet(vec: np.ndarray, n_e: int, ts: int, pg: int):
            s = ts / 2.0
            self.mults.append((int(n_e), int(ts), int(pg)))
            cc: Dict[int, int] = {}
            cur = vec
            tszc = ts
            while True:
                cc[tszc] = len(cols)
                cols.append(cur.copy())
                if tszc == -ts:
                    break
                # S- |S, Sz> = sqrt(S(S+1)-Sz(Sz-1))|S, Sz-1>
                szv = tszc / 2.0
                fac = np.sqrt(s * (s + 1) - szv * (szv - 1))
                cur = (sm @ cur) / fac
                tszc -= 2
            self.comp_cols.append(cc)

        if basis == "drt":
            # Gelfand (GUGA) CSFs per (N, S) from the distinct row table;
            # highest-weight determinant expansions via sequential CG
            from .guga import DRT, csf_to_determinants
            for n_e in range(max_elec + 1):
                for ts in range(n_e % 2, n_e + 1, 2):
                    drt = DRT(n_orbs, n_e, ts)
                    for steps in drt.csfs():
                        vec = np.zeros(D)
                        pg = 0
                        for occ_pat, coef in \
                                csf_to_determinants(steps).items():
                            det = []
                            for o, code in enumerate(occ_pat):
                                if code in (1, 3):
                                    det.append(2 * o)
                                if code in (2, 3):
                                    det.append(2 * o + 1)
                            vec[self.index[tuple(det)]] = coef
                            pg = int(np.bitwise_xor.reduce(
                                [self.pgs[o] for o, c in
                                 enumerate(occ_pat) if c] or [0]))
                        add_multiplet(vec, n_e, ts, pg)
        else:
            for n_e in sorted(set(self.det_n)):
                if n_e > max_elec:
                    continue    # work-space sectors, not multiplets
                for pg in sorted(set(self.det_pg[self.det_n == n_e])):
                    for ts in range(n_e % 2, n_e + 1, 2):
                        sel = np.nonzero((self.det_n == n_e)
                                         & (self.det_pg == pg)
                                         & (self.det_tsz == ts))[0]
                        if len(sel) == 0:
                            continue
                        sub = s2[np.ix_(sel, sel)]
                        w, v = np.linalg.eigh(0.5 * (sub + sub.T))
                        s = ts / 2.0
                        hw = np.nonzero(np.abs(w - s * (s + 1))
                                        < 1e-8)[0]
                        for h in hw:
                            vec = np.zeros(D)
                            vec[sel] = v[:, h]
                            add_multiplet(vec, n_e, ts, pg)
        self.U = np.stack(cols, axis=1) if cols else np.zeros((D, 0))
        self.n_mult = len(self.mults)

    # -- spinor components -------------------------------------------
    def spinor(self, orb: int, kind: str) -> Tuple[Dict[int, np.ndarray],
                                                   int, int]:
        """Elementary spinor tensor at an external orbital in the
        conventions of su2_qc.ELEM: C = (c+_up, c+_dn),
        D~ = (c_dn, -c_up)."""
        u, d = self.cre[2 * orb], self.cre[2 * orb + 1]
        if kind == "C":
            return {1: u, -1: d}, 1, +1
        if kind == "D":
            return {1: d.T, -1: -u.T}, 1, -1
        raise KeyError(kind)

    # -- Wigner-Eckart reduction --------------------------------------
    def reduce(self, comp: Dict[int, np.ndarray], tk: int
               ) -> Optional[np.ndarray]:
        """Reduced (n_mult x n_mult) matrix of a rank-tk tensor given its
        m-resolved components in the determinant basis."""
        red = np.zeros((self.n_mult, self.n_mult))
        have = np.zeros((self.n_mult, self.n_mult), dtype=bool)
        for tq, mat in comp.items():
            cm = self.U.T @ mat @ self.U    # component-basis matrix
            for mb in range(self.n_mult):
                tsb = self.mults[mb][1]
                for mk in range(self.n_mult):
                    tsk = self.mults[mk][1]
                    for tszk, ck in self.comp_cols[mk].items():
                        tszb = tszk + tq
                        cb = self.comp_cols[mb].get(tszb)
                        if cb is None:
                            continue
                        v = cm[cb, ck]
                        cg = clebsch_gordan(tsk, tk, tsb, tszk, tq, tszb)
                        if abs(cg) < 1e-12:
                            if abs(v) > 1e-9:
                                raise ValueError(
                                    f"not a rank-{tk} tensor")
                            continue
                        r = v / cg
                        if have[mb, mk]:
                            if abs(r - red[mb, mk]) > 1e-8:
                                raise ValueError("Wigner-Eckart violated")
                        else:
                            red[mb, mk] = r
                            have[mb, mk] = True
        if np.max(np.abs(red)) < 1e-14:
            return None
        return red


def couple_components(a: Dict[int, np.ndarray], ka: int,
                      b: Dict[int, np.ndarray], kb: int, k: int
                      ) -> Dict[int, np.ndarray]:
    """[A x B]^k via plain operator products (the determinant-space
    matrices carry the fermionic signs intrinsically)."""
    dim = next(iter(a.values())).shape[0]
    out = {tq: np.zeros((dim, dim)) for tq in range(-k, k + 1, 2)}
    for tqa, ma in a.items():
        for tqb, mb in b.items():
            tq = tqa + tqb
            if abs(tq) > k:
                continue
            cg = clebsch_gordan(ka, kb, k, tqa, tqb, tq)
            if abs(cg) > 1e-14:
                out[tq] += cg * (ma @ mb)
    return out


def su2_mrcisd_dmrg(h1e: np.ndarray, g2e: Optional[np.ndarray],
                    ecore: float, n_int: int, n_elec: int, twos: int,
                    bond_dim: int = 200, pgs: Optional[Sequence[int]] = None,
                    ipg: int = 0, n_sweeps: int = 12, tol: float = 1e-9,
                    noises: Sequence[float] = (1e-4, 1e-5, 0.0),
                    iprint: int = 0, basis: str = "s2",
                    ci_order: int = 2, n_inactive: int = 0,
                    hole_order: Optional[int] = None, **kw):
    """Spin-adapted uncontracted MRCISD: DMRG over the internal orbitals
    with the external space (orbitals >= n_int, <= 2 electrons) as a CSF
    big site (reference DMRGBigSite + CSFBigSite,
    src/big_site/sweep_algorithm_big_site.hpp:33).  Returns
    (energy, engine)."""
    from .su2_fermion import SU2FermionDMRG
    from .su2_qc import compile_su2_entries, qc_su2_big_term_table

    K = h1e.shape[0]
    pgs = [0] * K if pgs is None else [int(p) for p in pgs]
    ext = ExternalSpace(K - n_int, pgs[n_int:], max_elec=ci_order,
                        basis=basis)
    tt = qc_su2_big_term_table(h1e, g2e, ecore, n_int, ext)
    entries, n_sym, sym_dn, sym_rank, registry = compile_su2_entries(tt)
    site_mults = [[(0, 0, 0), (1, 1, pgs[t]), (2, 0, 0)]
                  for t in range(n_int)] + [list(ext.mults)]
    site_ops = {n_int: {"I": (np.eye(ext.n_mult), 0, 0)}}
    if hole_order is not None and n_inactive > 0:
        # at most `hole_order` holes in the first n_inactive orbitals
        # (reference MRCIMPSInfo hole restriction, mps.hpp:1400)
        n_min = [0] * (n_int + 2)
        n_max = [n_elec] * (n_int + 2)
        for t in range(n_inactive + 1):
            n_min[t] = max(0, 2 * t - hole_order)
            n_max[t] = min(n_elec, 2 * t)
        kw = dict(kw, bond_nrange=(n_min, n_max))
    eng = SU2FermionDMRG(
        n_int + 1, entries, n_sym, sym_dn,
        target=(n_elec, twos, ipg), bond_dim=bond_dim,
        iprint=iprint, ops=registry, ranks=sym_rank,
        site_pgs=pgs[:n_int] + [0],
        site_mults=site_mults, site_ops=site_ops, **kw)
    e = eng.solve(n_sweeps=n_sweeps, tol=tol, noises=list(noises),
                  dav_thrds=[1e-10])
    return e, eng

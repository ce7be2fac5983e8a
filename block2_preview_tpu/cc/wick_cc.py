"""Machine-generated polynomial EOM-CCSD / Lambda / CC response RDMs.

The reference ships Wick-generated einsum code for these
(pyblock2/cc/eom_rccsd.py, lambda_gccsd.py, rdm_gccsd.py, produced by
the C++ WickExpr engine, src/ic/wick.hpp).  Here the equations are
generated at runtime by the in-house Fermi-vacuum Wick engine
(ic/wick.py): every projected matrix element

    <mu| e^{-T} H e^{T} tau_nu |0>

is expanded with finite exponential orders (excitation-rank balance
bounds the sums), fully Wick-contracted once, and cached as a symbolic
expression evaluated through einsum with open projection labels
(ic/wick.evaluate_tensor).  Everything is polynomial in system size —
the production counterpart of the exact determinant-space anchors in
cc/eom_gccsd.py (GCCSDExact).
"""

from __future__ import annotations

import itertools
from math import factorial
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..core.fcidump import FCIDUMP
from ..ic.wick import (ContractionCache, Op, Term, WickExpr,
                       evaluate, evaluate_tensor, vacuum_expectation)


# ---------------------------------------------------------------------------
# symbolic building blocks
# ---------------------------------------------------------------------------

def _t1(tag: str, name: str = "t1") -> WickExpr:
    a, i = f"a{tag}", f"i{tag}"
    return WickExpr([Term(1.0, ((name, (a, i)),),
                          (Op(a, True), Op(i, False)))])


def _t2(tag: str, name: str = "t2") -> WickExpr:
    a, b = f"a{tag}", f"b{tag}"
    i, j = f"i{tag}", f"j{tag}"
    return WickExpr([Term(0.25, ((name, (a, b, i, j)),),
                          (Op(a, True), Op(b, True),
                           Op(j, False), Op(i, False)))])


def _ham(tag: str = "H") -> WickExpr:
    p, q, r, s = (f"p{tag}", f"q{tag}", f"r{tag}", f"s{tag}")
    one = WickExpr([Term(1.0, (("f", (p, q)),),
                         (Op(p, True), Op(q, False)))])
    two = WickExpr([Term(0.25, (("v", (p, q, r, s)),),
                         (Op(p, True), Op(q, True),
                          Op(s, False), Op(r, False)))])
    return one + two


def _lam(tag: str, rank: int) -> WickExpr:
    """Lambda de-excitation operators with l1/l2 tensor factors."""
    if rank == 1:
        i, a = f"i{tag}", f"a{tag}"
        return WickExpr([Term(1.0, (("l1", (i, a)),),
                              (Op(i, True), Op(a, False)))])
    i, j = f"i{tag}", f"j{tag}"
    a, b = f"a{tag}", f"b{tag}"
    return WickExpr([Term(0.25, (("l2", (i, j, a, b)),),
                          (Op(i, True), Op(j, True),
                           Op(b, False), Op(a, False)))])


def _mul(exprs: Sequence[WickExpr]) -> WickExpr:
    cur = exprs[0]
    for e in exprs[1:]:
        cur = cur * e
    return cur


def _net(ops: Sequence[Op]) -> Tuple[int, int]:
    """(occ, vir) net creation counts of an op string."""
    from ..ic.wick import OCC, VIR, space_of
    do = dv = 0
    for o in ops:
        s = space_of(o.index)
        d = 1 if o.dagger else -1
        if s == OCC:
            do += d
        elif s == VIR:
            dv += d
    return do, dv


def _gen_expr(proj_ops: Sequence[Op], tau_ops: Sequence[Op],
              with_lambda: int = 0) -> WickExpr:
    """<proj| (Lambda?) e^{-T} H e^{T} tau |0> fully contracted; the
    exponential orders are bounded by occ/vir balance feasibility
    (H's general indices can shift the balance by at most 2)."""
    out = WickExpr([])
    lam_rank = with_lambda
    po, pv = _net(proj_ops)
    to, tv = _net(tau_ops)
    for n1l in range(3):
        for n2l in range(2):
            for n1r in range(5):
                for n2r in range(3):
                    e = n1l + 2 * n2l + n1r + 2 * n2r
                    occ_net = po + lam_rank - e + to
                    vir_net = pv - lam_rank + e + tv
                    if occ_net + vir_net != 0 or abs(occ_net) > 2:
                        continue
                    coeff = ((-1.0) ** (n1l + n2l)
                             / (factorial(n1l) * factorial(n2l)
                                * factorial(n1r) * factorial(n2r)))
                    factors: List[WickExpr] = []
                    if proj_ops:
                        factors.append(WickExpr(
                            [Term(1.0, (), tuple(proj_ops))]))
                    if lam_rank:
                        factors.append(_lam("L", lam_rank))
                    for k in range(n1l):
                        factors.append(_t1(f"l1{k}"))
                    for k in range(n2l):
                        factors.append(_t2(f"l2{k}"))
                    factors.append(_ham())
                    for k in range(n1r):
                        factors.append(_t1(f"r1{k}"))
                    for k in range(n2r):
                        factors.append(_t2(f"r2{k}"))
                    if tau_ops:
                        factors.append(WickExpr(
                            [Term(1.0, (), tuple(tau_ops))]))
                    out = out + vacuum_expectation(_mul(factors) * coeff)
    return out


def _deex_ops(labels: Sequence[str]) -> Tuple[Op, ...]:
    if len(labels) == 2:
        i, a = labels
        return (Op(i, True), Op(a, False))
    i, a, j, b = labels
    return (Op(i, True), Op(j, True), Op(b, False), Op(a, False))


def _ex_ops(labels: Sequence[str]) -> Tuple[Op, ...]:
    if len(labels) == 2:
        a, i = labels
        return (Op(a, True), Op(i, False))
    a, i, b, j = labels
    return (Op(a, True), Op(b, True), Op(j, False), Op(i, False))


# ---------------------------------------------------------------------------
# numeric drivers
# ---------------------------------------------------------------------------

class WickCC:
    """Polynomial CCSD post-processing on a converged (t1, t2):
    EOM-EE/IP/EA, Lambda equations, response RDMs."""

    S_LAB = ("i0", "a0")
    D_LAB = ("i0", "a0", "j0", "b0")
    S_TAU = ("a1", "i1")
    D_TAU = ("a1", "i1", "b1", "j1")

    def __init__(self, fd: FCIDUMP, t1: Optional[np.ndarray] = None,
                 t2: Optional[np.ndarray] = None):
        from .gccsd import gccsd
        from ..uc.mp import spin_orbital_integrals
        self.fd = fd
        if fd.uhf:
            # unrestricted reference: UHF-sectioned spin-orbital
            # integrals (occupied-first ordering) — the whole EOM /
            # Lambda / response-RDM machinery below is spin-orbital
            # generic, so this one branch provides the reference's
            # eom_uccsd.py / lambda_uccsd.py / rdm_uccsd.py surface
            from ..uc.mp import uhf_energy_and_fock
            hf = uhf_energy_and_fock(fd)
            if t1 is None or t2 is None:
                _ehf, _ecorr, t1, t2 = gccsd(
                    fd, return_amplitudes=True, hf=hf,
                    n_elec=fd.n_elec)
            h, v = hf[1], hf[2]
            # hf[1] is the FOCK matrix; the evaluator wants the bare h
            no_ = fd.n_elec
            h = hf[1] - np.einsum(
                "piqi->pq", hf[2][np.ix_(np.arange(hf[1].shape[0]),
                                         np.arange(no_),
                                         np.arange(hf[1].shape[0]),
                                         np.arange(no_))])
        else:
            if t1 is None or t2 is None:
                _ehf, _ecorr, t1, t2 = gccsd(fd, return_amplitudes=True)
            h, v = spin_orbital_integrals(fd)
        self.t1, self.t2 = t1, t2                # (o,v) / (o,o,v,v)
        nso = h.shape[0]
        no = fd.n_elec
        self.no, self.nv = no, nso - no
        self.occ = np.arange(no)
        self.vir = np.arange(no, nso)
        self.spaces = {"occ": self.occ, "vir": self.vir}
        # symbolic t1[a,i] / t2[a,b,i,j]; gccsd returns (o,v) layouts —
        # embed transposed into global-index arrays for the evaluator
        T1g = np.zeros((nso, nso))
        T1g[np.ix_(self.vir, self.occ)] = t1.T
        T2g = np.zeros((nso, nso, nso, nso))
        T2g[np.ix_(self.vir, self.vir, self.occ, self.occ)] = \
            t2.transpose(2, 3, 0, 1)
        self.tensors = {"f": h, "v": v, "t1": T1g, "t2": T2g}
        self._cache: Dict = {}
        # WickGraph-style cross-term common-subexpression memo
        # (reference src/ic/wick.hpp:2692 WickGraph)
        self.graph = ContractionCache()
        # fock diagonal for iteration denominators
        fock = h + np.einsum("piqi->pq",
                             v[np.ix_(np.arange(nso), self.occ,
                                      np.arange(nso), self.occ)])
        self.fdiag = np.diag(fock)

    # -- generated blocks ------------------------------------------------
    def _expr(self, key, *args):
        if key not in self._cache:
            self._cache[key] = _gen_expr(*args)
        return self._cache[key]

    def _ev(self, expr, t, sp, free):
        return evaluate_tensor(expr, t, sp, free, cache=self.graph)

    def e_cc(self) -> float:
        ex = self._expr("e", (), ())
        return evaluate(ex, self.tensors, self.spaces)

    def eom_ee_matrix(self) -> Tuple[np.ndarray, list]:
        """Dense Hbar over the antisymmetry-packed {S, D} basis."""
        no, nv = self.no, self.nv
        t = self.tensors
        sp = self.spaces
        mss = self._ev(self._expr(
            "ss", _deex_ops(self.S_LAB), _ex_ops(self.S_TAU)), t, sp,
            list(self.S_LAB) + list(self.S_TAU))
        msd = self._ev(self._expr(
            "sd", _deex_ops(self.S_LAB), _ex_ops(self.D_TAU)), t, sp,
            list(self.S_LAB) + list(self.D_TAU))
        mds = self._ev(self._expr(
            "ds", _deex_ops(self.D_LAB), _ex_ops(self.S_TAU)), t, sp,
            list(self.D_LAB) + list(self.S_TAU))
        mdd = self._ev(self._expr(
            "dd", _deex_ops(self.D_LAB), _ex_ops(self.D_TAU)), t, sp,
            list(self.D_LAB) + list(self.D_TAU))
        # packed bases
        sing = [(i, a) for i in range(no) for a in range(nv)]
        dbl = [(i, j, a, b) for i in range(no) for j in range(i + 1, no)
               for a in range(nv) for b in range(a + 1, nv)]
        ns, nd = len(sing), len(dbl)
        M = np.zeros((ns + nd, ns + nd))
        for x, (i, a) in enumerate(sing):
            for y, (k, c) in enumerate(sing):
                M[x, y] = mss[i, a, c, k]
            for y, (k, l, c, d) in enumerate(dbl):
                M[x, ns + y] = msd[i, a, c, k, d, l]
        for x, (i, j, a, b) in enumerate(dbl):
            for y, (k, c) in enumerate(sing):
                M[ns + x, y] = mds[i, a, j, b, c, k]
            for y, (k, l, c, d) in enumerate(dbl):
                M[ns + x, ns + y] = mdd[i, a, j, b, c, k, d, l]
        return M, sing + dbl

    def eom_ee(self, n_roots: int = 4) -> np.ndarray:
        M, _ = self.eom_ee_matrix()
        w = np.sort(np.linalg.eigvals(M).real)
        return (w - self.e_cc())[:n_roots]

    def eom_ip(self, n_roots: int = 4) -> np.ndarray:
        """IP-EOM-CCSD over the packed {1h, 2h1p} basis."""
        no, nv = self.no, self.nv
        t, sp = self.tensors, self.spaces
        p1 = (Op("i0", True),)
        p2 = (Op("i0", True), Op("j0", True), Op("a0", False))
        t1o = (Op("i1", False),)
        t2o = (Op("a1", True), Op("j1", False), Op("i1", False))
        m11 = self._ev(self._expr("ip11", p1, t1o), t, sp,
                              ["i0", "i1"])
        m12 = self._ev(self._expr("ip12", p1, t2o), t, sp,
                              ["i0", "a1", "i1", "j1"])
        m21 = self._ev(self._expr("ip21", p2, t1o), t, sp,
                              ["i0", "j0", "a0", "i1"])
        m22 = self._ev(self._expr("ip22", p2, t2o), t, sp,
                              ["i0", "j0", "a0", "a1", "i1", "j1"])
        b1 = [(i,) for i in range(no)]
        b2 = [(i, j, a) for i in range(no) for j in range(i + 1, no)
              for a in range(nv)]
        n1, n2 = len(b1), len(b2)
        M = np.zeros((n1 + n2, n1 + n2))
        for x, (i,) in enumerate(b1):
            for y, (k,) in enumerate(b1):
                M[x, y] = m11[i, k]
            for y, (k, l, c) in enumerate(b2):
                M[x, n1 + y] = m12[i, c, k, l]
        for x, (i, j, a) in enumerate(b2):
            for y, (k,) in enumerate(b1):
                M[n1 + x, y] = m21[i, j, a, k]
            for y, (k, l, c) in enumerate(b2):
                M[n1 + x, n1 + y] = m22[i, j, a, c, k, l]
        w = np.sort(np.linalg.eigvals(M).real)
        return (w - self.e_cc())[:n_roots]

    def eom_ea(self, n_roots: int = 4) -> np.ndarray:
        """EA-EOM-CCSD over the packed {1p, 2p1h} basis."""
        no, nv = self.no, self.nv
        t, sp = self.tensors, self.spaces
        p1 = (Op("a0", False),)
        p2 = (Op("i0", True), Op("b0", False), Op("a0", False))
        t1o = (Op("a1", True),)
        t2o = (Op("a1", True), Op("b1", True), Op("i1", False))
        m11 = self._ev(self._expr("ea11", p1, t1o), t, sp,
                              ["a0", "a1"])
        m12 = self._ev(self._expr("ea12", p1, t2o), t, sp,
                              ["a0", "a1", "b1", "i1"])
        m21 = self._ev(self._expr("ea21", p2, t1o), t, sp,
                              ["a0", "b0", "i0", "a1"])
        m22 = self._ev(self._expr("ea22", p2, t2o), t, sp,
                              ["a0", "b0", "i0", "a1", "b1", "i1"])
        b1 = [(a,) for a in range(nv)]
        b2 = [(a, b, i) for a in range(nv) for b in range(a + 1, nv)
              for i in range(no)]
        n1, n2 = len(b1), len(b2)
        M = np.zeros((n1 + n2, n1 + n2))
        for x, (a,) in enumerate(b1):
            for y, (c,) in enumerate(b1):
                M[x, y] = m11[a, c]
            for y, (c, d, k) in enumerate(b2):
                M[x, n1 + y] = m12[a, c, d, k]
        for x, (a, b, i) in enumerate(b2):
            for y, (c,) in enumerate(b1):
                M[n1 + x, y] = m21[a, b, i, c]
            for y, (c, d, k) in enumerate(b2):
                M[n1 + x, n1 + y] = m22[a, b, i, c, d, k]
        w = np.sort(np.linalg.eigvals(M).real)
        return (w - self.e_cc())[:n_roots]

    # -- Lambda ----------------------------------------------------------
    def solve_lambda(self) -> Tuple[np.ndarray, np.ndarray]:
        """Left ground state <0|(1+Lambda) e^{-T}: the residual
        <0|(1+L) Hbar tau_nu|0> - E_cc l_nu = 0 is LINEAR in l with the
        EOM matrix as kernel — l^T (M - E_cc) = -A, solved directly
        (reference lambda_gccsd.py solves the same equations
        iteratively)."""
        no, nv = self.no, self.nv
        ecc = self.e_cc()
        t = self.tensors
        sp = self.spaces
        a_s = self._ev(self._expr("as", (), _ex_ops(self.S_TAU)),
                              t, sp, list(self.S_TAU))     # (a, i)
        a_d = self._ev(self._expr("ad", (), _ex_ops(self.D_TAU)),
                              t, sp, list(self.D_TAU))     # (a,i,b,j)
        M, basis = self.eom_ee_matrix()
        sing = [(i, a) for i in range(no) for a in range(nv)]
        dbl = [(i, j, a, b) for i in range(no) for j in range(i + 1, no)
               for a in range(nv) for b in range(a + 1, nv)]
        A = np.concatenate([
            np.array([a_s[a, i] for (i, a) in sing]),
            np.array([a_d[a, i, b, j] for (i, j, a, b) in dbl])])
        lvec = np.linalg.solve((M - ecc * np.eye(M.shape[0])).T, -A)
        l1 = np.zeros((no, nv))
        for x, (i, a) in enumerate(sing):
            l1[i, a] = lvec[x]
        l2 = np.zeros((no, no, nv, nv))
        ns = len(sing)
        for y, (i, j, a, b) in enumerate(dbl):
            v = lvec[ns + y]
            l2[i, j, a, b] = v
            l2[j, i, a, b] = -v
            l2[i, j, b, a] = -v
            l2[j, i, b, a] = v
        self.l1, self.l2 = l1, l2
        return l1, l2

    # -- response RDMs ----------------------------------------------------
    def _lam_tensors(self) -> Dict[str, np.ndarray]:
        if not hasattr(self, "l1"):
            self.solve_lambda()
        nso = self.no + self.nv
        t = dict(self.tensors)
        L1g = np.zeros((nso, nso))
        L1g[np.ix_(self.occ, self.vir)] = self.l1
        L2g = np.zeros((nso,) * 4)
        L2g[np.ix_(self.occ, self.occ, self.vir, self.vir)] = self.l2
        t["l1"], t["l2"] = L1g, L2g
        return t

    def _op_block(self, key, op_labels: Sequence[str],
                  op_daggers: Sequence[bool], t: Dict, rank_shift_max=2
                  ) -> np.ndarray:
        """<0|(1+Lambda) e^{-T} (op string) e^{T}|0> with the op's
        indices free; summed over Lambda ranks 0/1/2."""
        out_total = None
        for lam in (0, 1, 2):
            ck = (key, lam)
            if ck not in self._cache:
                opx = WickExpr([Term(1.0, (), tuple(
                    Op(x, d) for x, d in zip(op_labels, op_daggers)))])
                out = WickExpr([])
                for n1l in range(3):
                    for n2l in range(2):
                        for n1r in range(3):
                            for n2r in range(2):
                                e_l = n1l + 2 * n2l
                                e_r = n1r + 2 * n2r
                                if abs(lam - e_l - e_r) > rank_shift_max:
                                    continue
                                coeff = ((-1.0) ** (n1l + n2l) /
                                         (factorial(n1l) * factorial(n2l)
                                          * factorial(n1r)
                                          * factorial(n2r)))
                                fs: List[WickExpr] = []
                                if lam:
                                    fs.append(_lam("L", lam))
                                for k in range(n1l):
                                    fs.append(_t1(f"l1{k}"))
                                for k in range(n2l):
                                    fs.append(_t2(f"l2{k}"))
                                fs.append(opx)
                                for k in range(n1r):
                                    fs.append(_t1(f"r1{k}"))
                                for k in range(n2r):
                                    fs.append(_t2(f"r2{k}"))
                                out = out + vacuum_expectation(
                                    _mul(fs) * coeff)
                self._cache[ck] = out
            val = self._ev(self._cache[ck], t, self.spaces,
                                  list(op_labels))
            out_total = val if out_total is None else out_total + val
        return out_total

    def rdm1(self) -> np.ndarray:
        """Spin-orbital response gamma_pq = <0|(1+L) e^{-T} p+q e^T|0>
        (global index layout; reference rdm_gccsd.py)."""
        t = self._lam_tensors()
        nso = self.no + self.nv
        dm = np.zeros((nso, nso))
        lab = {0: ("i0", self.occ), 1: ("a0", self.vir)}
        lab2 = {0: ("j1", self.occ), 1: ("b1", self.vir)}
        for sp1 in (0, 1):
            for sp2 in (0, 1):
                (px, prng), (qx, qrng) = lab[sp1], lab2[sp2]
                val = self._op_block(("g1", sp1, sp2), (px, qx),
                                     (True, False), t, rank_shift_max=1)
                dm[np.ix_(prng, qrng)] += val
        return dm

    def rdm2(self) -> np.ndarray:
        """Spin-orbital response gamma_pqrs =
        <0|(1+L) e^{-T} p+ q+ s r e^T|0> (op slot order matching
        GCCSDExact.rdm2)."""
        t = self._lam_tensors()
        nso = self.no + self.nv
        dm = np.zeros((nso,) * 4)
        labs = [{0: (x + "0", self.occ), 1: (y + "0", self.vir)}
                for x, y in (("i", "a"), ("j", "b"), ("k", "c"),
                             ("l", "d"))]
        for spc in itertools.product((0, 1), repeat=4):
            (px, pr), (qx, qr), (rx, rr), (sx, sr) = \
                (labs[k][spc[k]] for k in range(4))
            # operator string p+ q+ s r; output axes come back in op
            # order (p, q, s, r) -> transpose to (p, q, r, s)
            val = self._op_block(("g2",) + spc, (px, qx, sx, rx),
                                 (True, True, False, False), t)
            dm[np.ix_(pr, qr, rr, sr)] += val.transpose(0, 1, 3, 2)
        return dm


def eom_ee_ccsd(fd: FCIDUMP, n_roots: int = 4,
                t1: Optional[np.ndarray] = None,
                t2: Optional[np.ndarray] = None) -> np.ndarray:
    """Polynomial EOM-EE-CCSD excitation energies (reference
    pyblock2/cc/eom_gccsd.py Wick-generated equations)."""
    return WickCC(fd, t1, t2).eom_ee(n_roots)

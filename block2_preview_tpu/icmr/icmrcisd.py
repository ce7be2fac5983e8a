"""Fully internally contracted MRCISD (reference
pyblock2/icmr/icmrcisd_full.py, built on the Wick engine wick.hpp).

Variational CI in the internally contracted basis

    { |Psi0> }  u  { O |Psi0> :  O a 1- or 2-body excitation with at
                     least one external (core or virtual) index }

with spin-orbital external labels and free active indices.  Overlap and
Hamiltonian matrices are evaluated through the multireference Wick
engine (`mrwick.evaluate_tensor`) over active-space RDMs; the metric's
null space is projected out and the generalized eigenproblem solved.

RDM order: matrix elements between semi-internal classes (3 active ops
on each side) involve up to the 5-RDM — exact here for small active
spaces; large-scale deployments use the same code path with DMRG RDMs
(gamma_5 feasible only for small CAS; the reference has the same
scaling, icmrcisd_full computes up to 4pdm + corrections).

Anchors (tests): ncas=0 reduces exactly to CISD; full-space CAS returns
E_CASCI; the general case is variationally between CASCI and
uncontracted MRCISD.
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..core.fcidump import FCIDUMP
from ..uc.nevpt2 import casci_root
from . import mrwick as mw
from .mrwick import ACTIVE, CORE, VIRT, MOp, MTerm
from .scnevpt2 import active_gammas

# (creation spaces, annihilation spaces) for every excitation class with
# at least one external index; 'c' slots are core (fixed label,
# annihilated), 'v' virt (fixed, created), 'a' active (free symbol)
CLASSES = [
    (("v",), ("c",)),
    (("v",), ("a",)),
    (("a",), ("c",)),
    (("v", "v"), ("c", "c")),
    (("v", "v"), ("c", "a")),
    (("v", "v"), ("a", "a")),
    (("v", "a"), ("c", "c")),
    (("v", "a"), ("c", "a")),
    (("v", "a"), ("a", "a")),
    (("a", "a"), ("c", "c")),
    (("a", "a"), ("c", "a")),
]


@dataclass
class ICBasisFn:
    """One contracted basis operator: fixed external spin orbitals +
    free active symbols (evaluated open)."""
    terms: List[MTerm]
    free: Tuple[str, ...]
    nact: int               # spin-orbital active dimension per free index


def _build_class(cre, ann, ext_c: Tuple[int, ...], ext_v: Tuple[int, ...],
                 tag: int) -> ICBasisFn:
    ops = []
    free = []
    iv = ic = ia = 0
    for k, sp in enumerate(cre):
        if sp == "v":
            ops.append(MOp(f"Xv{ext_v[iv]}_{tag}c{k}", VIRT, True))
            iv += 1
        else:
            sym = f"Af{tag}c{k}"
            ops.append(MOp(sym, ACTIVE, True))
            free.append(sym)
    for k, sp in enumerate(ann):
        if sp == "c":
            ops.append(MOp(f"Xc{ext_c[ic]}_{tag}a{k}", CORE, False))
            ic += 1
        else:
            sym = f"Af{tag}a{k}"
            ops.append(MOp(sym, ACTIVE, False))
            free.append(sym)
    return ICBasisFn([MTerm(1.0, (), tuple(ops))], tuple(free), 0)


def _labels(spaces, pool: Sequence[int]):
    """Distinct external label tuples for the fixed slots of a class."""
    n = sum(1 for s in spaces if s != "a")
    return list(itertools.combinations(pool, n))


def ic_mrcisd(fd: FCIDUMP, ncore: int, ncas: int,
              gammas: Optional[Dict[str, np.ndarray]] = None,
              s_tol: float = 1e-8, iprint: int = 0):
    """Returns (E_icmrcisd, E_casci, basis dimension kept)."""
    n = fd.n_sites
    e_cas, c0m, ix, mask = casci_root(fd, ncore, ncas)
    if gammas is None:
        psi0 = np.zeros(4 ** n)
        psi0[ix[mask]] = c0m
        kmax = 5 if ncas else 0
        gammas = active_gammas(psi0, n, ncore, ncas, kmax=kmax)
    nact = 2 * ncas
    h_so, v_as = mw.spin_orbital_integrals(fd.h1e, fd.g2e)
    tensors = {"h": h_so, "v": v_as}
    tensors.update(gammas)
    loc = 2 * ncore
    locals_ = ("g1", "g2", "g3", "g4", "g5")

    cores = list(range(2 * ncore))              # spin orbitals
    virts = list(range(2 * (ncore + ncas), 2 * n))

    def range_of(sym: str) -> np.ndarray:
        c = sym[0]
        if c == "A":
            return np.arange(loc, loc + nact)
        if c == "X":
            o = int(sym.split("_")[0][2:])
            return np.asarray([o])
        if c == "C":
            return np.asarray(cores, dtype=np.int64)
        if c == "V":
            return np.asarray(virts, dtype=np.int64)
        raise KeyError(sym)

    # enumerate basis functions: (class id, labels) -> block of functions
    fns: List[ICBasisFn] = []
    tag = 0
    for (cre, ann) in CLASSES:
        ncl = sum(1 for s in ann if s == "c")
        nvl = sum(1 for s in cre if s == "v")
        for lc in itertools.combinations(cores, ncl):
            for lv in itertools.combinations(virts, nvl):
                fns.append(_build_class(cre, ann, lc, lv, tag))
                tag += 1
    # block sizes (free active indices)
    sizes = [nact ** len(f.free) for f in fns]
    offs = np.concatenate([[1], 1 + np.cumsum(sizes)])  # slot 0 = Psi0
    dim = int(offs[-1])
    H = np.zeros((dim, dim))
    S = np.zeros((dim, dim))
    S[0, 0] = 1.0

    hterms = mw.split_hamiltonian("h", "v")
    # prefix-code the Hamiltonian terms by space for range lookup
    pref = {CORE: "C", ACTIVE: "A", VIRT: "V"}
    ht = []
    for t in hterms:
        ren = {o.index: pref[o.space] + "h" + o.index for o in t.ops}
        ht.append(MTerm(
            t.coeff,
            tuple((nm, tuple(ren.get(i, i) for i in ix_))
                  for nm, ix_ in t.tensors),
            tuple(MOp(ren[o.index], o.space, o.dagger) for o in t.ops)))

    def range_h(sym):
        c = sym[0]
        if c == "A":
            return np.arange(loc, loc + nact)
        if c == "C":
            return np.asarray(cores, dtype=np.int64)
        if c == "V":
            return np.asarray(virts, dtype=np.int64)
        if c == "X":
            o = int(sym.split("_")[0][2:])
            return np.asarray([o])
        raise KeyError(sym)

    # <Psi0|H|Psi0>
    H[0, 0] = mw.evaluate(mw.mr_expect(mw.mul_terms(ht)), tensors,
                          range_h, local_names=locals_, local_offset=loc)
    # off-diagonal with Psi0 and pairwise blocks
    for a, fa in enumerate(fns):
        Ad = mw.conj_terms(fa.terms)
        # <Psi0| H A |Psi0>
        he = mw.evaluate_tensor(
            mw.mr_expect(mw.mul_terms(ht, fa.terms)), tensors, range_h,
            [f + "_1" for f in fa.free], local_names=locals_,
            local_offset=loc)
        H[0, offs[a]:offs[a + 1]] = np.asarray(he).ravel()
        H[offs[a]:offs[a + 1], 0] = np.asarray(he).ravel()
        for b, fb in enumerate(fns):
            if b < a:
                continue
            free_s = [f + "_0" for f in fa.free] + \
                [f + "_1" for f in fb.free]
            free_h = [f + "_0" for f in fa.free] + \
                [f + "_2" for f in fb.free]
            sv = mw.evaluate_tensor(
                mw.mr_expect(mw.mul_terms(Ad, fb.terms)), tensors,
                range_h, free_s, local_names=locals_, local_offset=loc)
            hv = mw.evaluate_tensor(
                mw.mr_expect(mw.mul_terms(Ad, ht, fb.terms)), tensors,
                range_h, free_h, local_names=locals_, local_offset=loc)
            na = sizes[a]
            nb = sizes[b]
            S[offs[a]:offs[a + 1], offs[b]:offs[b + 1]] = \
                sv.reshape(na, nb)
            H[offs[a]:offs[a + 1], offs[b]:offs[b + 1]] = \
                hv.reshape(na, nb)
            if b != a:
                S[offs[b]:offs[b + 1], offs[a]:offs[a + 1]] = \
                    sv.reshape(na, nb).T
                H[offs[b]:offs[b + 1], offs[a]:offs[a + 1]] = \
                    hv.reshape(na, nb).T
    # canonical orthogonalization
    w, U = np.linalg.eigh(0.5 * (S + S.T))
    keep = w > s_tol * max(w.max(), 1.0)
    X = U[:, keep] / np.sqrt(w[keep])
    Hp = X.T @ (0.5 * (H + H.T)) @ X
    ev = np.linalg.eigvalsh(Hp)
    if iprint:
        print(f"ic-MRCISD dim {dim} kept {int(keep.sum())} "
              f"E = {ev[0] + fd.const_e:.10f}")
    return ev[0] + fd.const_e, e_cas, int(keep.sum())

"""Strongly-contracted NEVPT2 from active-space RDMs.

DMRG-sc-NEVPT2 (reference pyblock2/icmr/scnevpt2.py, driven by the Wick
engine src/ic/wick.hpp): second-order energy over the 8 Dyall perturber
classes V(0), V(+1), V(-1), V(+2), V(-2), V(0'), V(+1'), V(-1'),

    E2 = - sum_l  N_l / (e_l - E0),
    N_l = <Psi_l|Psi_l>,  e_l = <Psi_l|H^D|Psi_l>/N_l,
    |Psi_l> = P_l H |Psi0>,

with l running over spatial external-label patterns (which inactive
orbitals lose electrons, which virtuals gain them).  Everything reduces to
active-space spin-orbital RDMs up to order 4 — the quantities the DMRG
NPDM engine provides — evaluated through the multireference Wick engine
(`mrwick.py`): the perturber operators are built symbolically by binding
the external slots of the split Hamiltonian to each label, and
N_l / e_l become einsum contractions over gamma_1..gamma_4.

Validation: `sc_nevpt2_fci` computes the *same* theory exactly in
determinant space (group H|Psi0> by external occupation pattern), so the
RDM path is testable to machine precision on small systems.
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass, field
from functools import reduce
from typing import Dict, List, Optional, Tuple

import numpy as np
import scipy.sparse as sp

from ..core.fcidump import FCIDUMP
from ..core.expr import qc_term_table
from ..core.integral_dyall import dyall_fcidump
from ..ops.local_ops import IDENT, PARITY, _DA, _DB
from ..uc.nevpt2 import casci_root
from ..utils.ed import term_table_to_sparse
from . import mrwick as mw
from .mrwick import CORE, ACTIVE, VIRT, MOp, MTerm

CLASSES = {
    (2, 2): "V(0)", (2, 1): "V(+1)", (2, 0): "V(+2)",
    (1, 2): "V(-1)", (1, 1): "V(0')", (1, 0): "V(+1')",
    (0, 2): "V(-2)", (0, 1): "V(-1')",
}


# ---------------------------------------------------------------------------
# spin-orbital operators and RDMs (determinant-space, for tests / small CAS)
# ---------------------------------------------------------------------------

def annihilators(L: int) -> List[sp.csr_matrix]:
    """JW annihilation operators for spin orbitals (0a, 0b, 1a, 1b, ...)
    in the site-major base-4 basis of utils/ed.py."""
    ops = []
    Z = sp.csr_matrix(PARITY)
    I4 = sp.identity(4, format="csr")
    for p in range(L):
        for elem in (_DA, _DB):
            mats = [Z] * p + [sp.csr_matrix(elem)] + [I4] * (L - p - 1)
            ops.append(reduce(lambda a, b: sp.kron(a, b, format="csr"),
                              mats))
    return ops


def active_gammas(psi0: np.ndarray, L: int, ncore: int, ncas: int,
                  kmax: int = 4) -> Dict[str, np.ndarray]:
    """Spin-orbital active RDMs gamma_k[p1..pk, q1..qk]
    = <psi0| p1^+ ... pk^+ q1 ... qk |psi0> for k <= kmax."""
    na = 2 * ncas
    if na == 0:
        return {}
    ann = annihilators(L)
    act = [ann[2 * ncore + t] for t in range(na)]
    gammas: Dict[str, np.ndarray] = {}
    # chains: R[(q1..qk)] = c_q1 (R[(q2..qk)]);  L[(p1..pk)] = c_pk L[..pk-1]
    Rp: Dict[Tuple[int, ...], np.ndarray] = {(): psi0}
    Lp: Dict[Tuple[int, ...], np.ndarray] = {(): psi0}
    for k in range(1, kmax + 1):
        Rn, Ln = {}, {}
        for t, v in Rp.items():
            for q in range(na):
                Rn[(q,) + t] = act[q] @ v
        for t, v in Lp.items():
            for p in range(na):
                Ln[t + (p,)] = act[p] @ v
        Rp, Lp = Rn, Ln
        tuples = list(itertools.product(range(na), repeat=k))
        Lm = np.stack([Lp[t] for t in tuples])
        Rm = np.stack([Rp[t] for t in tuples])
        g = Lm @ Rm.T
        gammas[f"g{k}"] = g.reshape((na,) * (2 * k))
    return gammas


def _perm_parity(perm: Tuple[int, ...]) -> int:
    p = list(perm)
    sign = 1
    for i in range(len(p)):
        while p[i] != i:
            j = p[i]
            p[i], p[j] = p[j], p[i]
            sign = -sign
    return sign


def gammas_from_civec(dets: np.ndarray, coefs: np.ndarray, nso: int,
                      kmax: int = 4) -> Dict[str, np.ndarray]:
    """Spin-orbital RDMs gamma_k from a bitmask CI expansion (the DMRG
    path: `dmrg.npdm.mps_to_civec` output of an active-space MPS).
    Gram matrix over sorted annihilation combos + permutation-sign
    expansion (same scheme as dmrg/npdm.npdm_spatial)."""
    from ..dmrg.npdm import _apply_annihilations
    gammas: Dict[str, np.ndarray] = {}
    for k in range(1, kmax + 1):
        combos = np.asarray(list(itertools.combinations(range(nso), k)),
                            dtype=np.int64)
        res = [_apply_annihilations(dets, coefs, row.tolist())
               for row in combos]
        nz = [d for (d, c) in res if len(d)]
        union = np.unique(np.concatenate(nz)) if nz else \
            np.zeros(0, dtype=np.int64)
        W = np.zeros((len(combos), max(len(union), 1)))
        for i, (d, c) in enumerate(res):
            if len(d):
                W[i, np.searchsorted(union, d)] = c
        G = W @ W.T
        gk = np.zeros((nso ** k, nso ** k))
        shape = (nso,) * k
        perms = list(itertools.permutations(range(k)))
        rav = {s: np.ravel_multi_index(
            tuple(combos[:, list(s)].T), shape) for s in perms}
        for sL in perms:
            # L operator = c_{p_k} ... c_{p_1}: permutation to ascending
            # is reversed(sL)
            sgl = _perm_parity(tuple(reversed(sL)))
            for sR in perms:
                sgr = _perm_parity(sR)
                gk[np.ix_(rav[sL], rav[sR])] = (sgl * sgr) * G
        gammas[f"g{k}"] = gk.reshape((nso,) * (2 * k))
    return gammas


def gammas_from_mps(mps, kmax: int = 4) -> Dict[str, np.ndarray]:
    """Active-space spin-orbital RDMs straight from a (small) CAS MPS."""
    from ..dmrg.npdm import mps_to_civec
    dets, coefs = mps_to_civec(mps)
    return gammas_from_civec(dets, np.real_if_close(coefs),
                             2 * mps.n_sites, kmax)


def cas_fcidump(fd: FCIDUMP, ncore: int, ncas: int) -> FCIDUMP:
    """Frozen-core active-space FCIDUMP: h = inactive Fock (active block),
    g = active integrals, const = core energy (reference MRCISFCIDUMP /
    CASCI embedding, integral.hpp:1490)."""
    from ..core.integral_dyall import inactive_fock
    A = np.arange(ncore, ncore + ncas)
    fI = inactive_fock(fd, ncore)
    I = np.arange(ncore)
    e_core = fd.const_e + 2.0 * np.sum(np.diag(fd.h1e)[I])
    if ncore:
        gII = fd.g2e[np.ix_(I, I, I, I)]
        e_core += 2.0 * np.einsum("iijj->", gII) \
            - np.einsum("ijji->", gII)
    return FCIDUMP(n_sites=ncas, n_elec=fd.n_elec - 2 * ncore,
                   twos=fd.twos, ipg=fd.ipg,
                   orb_sym=None if fd.orb_sym is None
                   else np.asarray(fd.orb_sym)[A].copy(),
                   h1e=fI[np.ix_(A, A)].copy(),
                   g2e=fd.g2e[np.ix_(A, A, A, A)].copy(),
                   const_e=e_core)


# ---------------------------------------------------------------------------
# symbolic perturbers
# ---------------------------------------------------------------------------

def _space_terms(h: str, v: str, spaces1, spaces2) -> List[MTerm]:
    """H = sum h_PQ P^+Q + 1/4 <PQ||RS> P^+Q^+SR with given space sets."""
    out = []
    for sp_, sq in spaces1:
        out.append(MTerm(1.0, ((h, ("p", "q")),),
                         (MOp("p", sp_, True), MOp("q", sq, False))))
    for sp_, sq, sr, ss in spaces2:
        out.append(MTerm(0.25, ((v, ("p", "q", "r", "s")),),
                         (MOp("p", sp_, True), MOp("q", sq, True),
                          MOp("s", ss, False), MOp("r", sr, False))))
    return out


def full_h_terms() -> List[MTerm]:
    sp1 = list(itertools.product((CORE, ACTIVE, VIRT), repeat=2))
    sp2 = list(itertools.product((CORE, ACTIVE, VIRT), repeat=4))
    return _space_terms("h", "v", sp1, sp2)


def dyall_terms() -> List[MTerm]:
    """Dyall H0 operator part: diag core/virt one-body + active one-body
    + active two-body (nonzero pattern of dyall_fcidump)."""
    sp1 = [(CORE, CORE), (VIRT, VIRT), (ACTIVE, ACTIVE)]
    sp2 = [(ACTIVE,) * 4]
    return _space_terms("hd", "vd", sp1, sp2)


def bind_label(hterms: List[MTerm], core_lab: Tuple[int, ...],
               virt_lab: Tuple[int, ...]) -> List[MTerm]:
    """Perturber A_l: restrict the external slots of H to the label
    pattern (core_lab lose one electron each w/ multiplicity, virt_lab
    gain).  Slots assigned 'other' range over the complement space and
    must be balanced per space (their action is then diagonal, keeping
    A_l|Phi> inside the P_l pattern)."""
    cmul: Dict[int, int] = {}
    for o in core_lab:
        cmul[o] = cmul.get(o, 0) + 1
    vmul: Dict[int, int] = {}
    for o in virt_lab:
        vmul[o] = vmul.get(o, 0) + 1
    out: List[MTerm] = []
    for term in hterms:
        cslots = [i for i, o in enumerate(term.ops) if o.space == CORE]
        vslots = [i for i, o in enumerate(term.ops) if o.space == VIRT]
        copts = list(cmul) + ["other"]
        vopts = list(vmul) + ["other"]
        for cass in itertools.product(copts, repeat=len(cslots)):
            for vass in itertools.product(vopts, repeat=len(vslots)):
                # net change at each label orbital
                ok = True
                for o, m in cmul.items():
                    net = sum((1 if term.ops[s].dagger else -1)
                              for s, a in zip(cslots, cass) if a == o)
                    if net != -m:
                        ok = False
                for o, m in vmul.items():
                    net = sum((1 if term.ops[s].dagger else -1)
                              for s, a in zip(vslots, vass) if a == o)
                    if net != m:
                        ok = False
                if not ok:
                    continue
                # 'other' slots balanced per space
                for slots, ass in ((cslots, cass), (vslots, vass)):
                    nc = sum(1 for s, a in zip(slots, ass)
                             if a == "other" and term.ops[s].dagger)
                    nd = sum(1 for s, a in zip(slots, ass)
                             if a == "other" and not term.ops[s].dagger)
                    if nc != nd:
                        ok = False
                if not ok:
                    continue
                ren: Dict[str, str] = {}
                # label symbols are POSITIONAL (index into the sorted
                # distinct label list), so the symbolic pipeline is
                # identical across labels with the same multiplicity
                # pattern and can be cached (ranges bind the orbitals)
                cdist = sorted(cmul)
                vdist = sorted(vmul)
                for k, (s, a) in enumerate(zip(cslots, cass)):
                    sym = term.ops[s].index
                    ren[sym] = (f"O{sym}{k}" if a == "other"
                                else f"XC{cdist.index(a)}_{sym}{k}")
                for k, (s, a) in enumerate(zip(vslots, vass)):
                    sym = term.ops[s].index
                    ren[sym] = (f"W{sym}{k}" if a == "other"
                                else f"XV{vdist.index(a)}_{sym}{k}")
                for i, o in enumerate(term.ops):
                    if o.space == ACTIVE:
                        ren.setdefault(o.index, f"A{o.index}{i}")

                def r(x):
                    return ren.get(x, x)

                out.append(MTerm(
                    term.coeff,
                    tuple((n, tuple(r(i) for i in ix))
                          for n, ix in term.tensors),
                    tuple(MOp(r(o.index), o.space, o.dagger)
                          for o in term.ops)))
    return out


def tag_full(terms: List[MTerm]) -> List[MTerm]:
    """Prefix-code symbols of untagged terms by their op space
    (C/A/V full ranges)."""
    out = []
    pref = {CORE: "C", ACTIVE: "A", VIRT: "V"}
    for term in terms:
        ren = {o.index: pref[o.space] + o.index for o in term.ops}

        def r(x):
            return ren.get(x, x)

        out.append(MTerm(term.coeff,
                         tuple((n, tuple(r(i) for i in ix))
                               for n, ix in term.tensors),
                         tuple(MOp(r(o.index), o.space, o.dagger)
                               for o in term.ops)))
    return out


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------

@dataclass
class SCNEVPT2Result:
    e2: float
    e_casci: float
    classes: Dict[str, float] = field(default_factory=dict)
    skipped: List[Tuple] = field(default_factory=list)


def _ranges_factory(n: int, ncore: int, ncas: int,
                    core_lab: Tuple[int, ...], virt_lab: Tuple[int, ...]):
    nact0 = 2 * ncore
    core_all = np.arange(2 * ncore)
    act_all = np.arange(nact0, nact0 + 2 * ncas)
    virt_all = np.arange(nact0 + 2 * ncas, 2 * n)
    core_other = np.asarray([x for x in core_all
                             if x // 2 not in core_lab], dtype=np.int64)
    virt_other = np.asarray([x for x in virt_all
                             if x // 2 not in virt_lab], dtype=np.int64)
    cdist = sorted(set(core_lab))
    vdist = sorted(set(virt_lab))

    def range_of(sym: str) -> np.ndarray:
        c = sym[0]
        if c == "C":
            return core_all
        if c == "O":
            return core_other
        if c == "A":
            return act_all
        if c == "V":
            return virt_all
        if c == "W":
            return virt_other
        if c == "X":
            head = sym.split("_")[0]
            o = (cdist if head[1] == "C" else vdist)[int(head[2:])]
            return np.asarray([2 * o, 2 * o + 1], dtype=np.int64)
        raise KeyError(sym)

    return range_of


def _ranges_factory_spatial(n: int, ncore: int, ncas: int,
                            core_lab: Tuple[int, ...],
                            virt_lab: Tuple[int, ...]):
    """Spatial-index ranges for spatialized class expressions."""
    core_all = np.arange(ncore)
    act_all = np.arange(ncore, ncore + ncas)
    virt_all = np.arange(ncore + ncas, n)
    core_other = np.asarray([x for x in core_all if x not in core_lab],
                            dtype=np.int64)
    virt_other = np.asarray([x for x in virt_all if x not in virt_lab],
                            dtype=np.int64)
    cdist = sorted(set(core_lab))
    vdist = sorted(set(virt_lab))

    def range_of(sym: str) -> np.ndarray:
        c = sym[0]
        if c == "C":
            return core_all
        if c == "O":
            return core_other
        if c == "A":
            return act_all
        if c == "V":
            return virt_all
        if c == "W":
            return virt_other
        if c == "X":
            head = sym.split("_")[0]
            o = (cdist if head[1] == "C" else vdist)[int(head[2:])]
            return np.asarray([o], dtype=np.int64)
        raise KeyError(sym)

    return range_of


def sc_nevpt2(fd: FCIDUMP, ncore: int, ncas: int,
              gammas: Optional[Dict[str, np.ndarray]] = None,
              psi0: Optional[np.ndarray] = None,
              iprint: int = 0, spatial: bool = False,
              gammas_spatial: Optional[Dict[str, np.ndarray]] = None,
              label_batch: bool = True) -> SCNEVPT2Result:
    """RDM-driven strongly contracted NEVPT2.

    gammas: spin-orbital active RDMs g1..g4 (from `active_gammas` or the
    DMRG NPDM engine); computed from the determinant-space CASCI root
    when omitted (small systems).

    spatial=True evaluates the machine-derived class expressions over
    SPIN-TRACED spatial RDMs G1..G4 (icmr/spatialize.py) — the
    production path: ncas^8 memory for the 4-RDM instead of
    (2*ncas)^8, matching the reference's spin-free equations
    (pyblock2/icmr/scnevpt2.py).  gammas_spatial supplies G1..G4
    directly (e.g. from the DMRG spatial NPDM engine); otherwise they
    are spin-traced from `gammas`."""
    n = fd.n_sites
    nvirt = n - ncore - ncas
    if gammas is None and not (spatial and gammas_spatial is not None):
        e_cas, c0m, ix, mask = casci_root(fd, ncore, ncas)
        if psi0 is None:
            psi0 = np.zeros(4 ** n)
            psi0[ix[mask]] = c0m
        gammas = active_gammas(psi0, n, ncore, ncas)
    else:
        e_cas = float("nan")    # DMRG path: CAS energy tracked by caller
    na = 2 * ncas
    # spatial active 1-rdm for the Dyall generalized Fock
    if spatial and gammas_spatial is not None:
        rdm1_sp = gammas_spatial["G1"].copy() if ncas else None
    elif ncas:
        g1 = gammas["g1"]
        rdm1_sp = (g1[0::2, 0::2] + g1[1::2, 1::2])
    else:
        rdm1_sp = None
    fdd = dyall_fcidump(fd, ncore, ncas, rdm1_active=rdm1_sp)

    if spatial:
        from .spatialize import spatialize, spin_trace_gammas
        if gammas_spatial is None:
            gammas_spatial = spin_trace_gammas(gammas)
        # plain physicist integrals <pq|rs> = g2e[p,r,q,s]
        tensors = {"h": fd.h1e, "vp": fd.g2e.transpose(0, 2, 1, 3),
                   "hd": fdd.h1e,
                   "vdp": fdd.g2e.transpose(0, 2, 1, 3)}
        tensors.update(gammas_spatial)
        loc_off = ncore
        local_names = ("G1", "G2", "G3", "G4")
        ranges_factory = _ranges_factory_spatial
    else:
        h_so, v_as = mw.spin_orbital_integrals(fd.h1e, fd.g2e)
        hd_so, vd_as = mw.spin_orbital_integrals(fdd.h1e, fdd.g2e)
        tensors = {"h": h_so, "v": v_as, "hd": hd_so, "vd": vd_as}
        tensors.update(gammas)
        loc_off = 2 * ncore
        local_names = ("g1", "g2", "g3", "g4")
        ranges_factory = _ranges_factory

    hterms = full_h_terms()
    hd = tag_full(dyall_terms())

    res = SCNEVPT2Result(0.0, e_cas)
    virt_orbs = list(range(ncore + ncas, n))
    for (kc, kv), cname in CLASSES.items():
        core_labs = ([()] if kc == 0 else
                     [(i,) for i in range(ncore)] if kc == 1 else
                     [(i, j) for i in range(ncore)
                      for j in range(i, ncore)])
        virt_labs = ([()] if kv == 0 else
                     [(r,) for r in virt_orbs] if kv == 1 else
                     [(r, s) for r in virt_orbs for s in virt_orbs
                      if r <= s])
        ecls = 0.0
        # the symbolic pipeline depends only on the label MULTIPLICITY
        # pattern (bind_label names labels positionally), so cache the
        # fully-contracted norm/energy expressions across labels — the
        # per-label work drops to numeric einsums
        sym_cache: Dict[Tuple, Tuple] = {}
        from collections import Counter
        pairs = [(cl, vl) for cl in core_labs for vl in virt_labs]
        sig_of = {}
        for cl, vl in pairs:
            sig = (tuple(sorted(Counter(cl).values())),
                   tuple(sorted(Counter(vl).values())))
            sig_of.setdefault(sig, []).append((cl, vl))
        for sig, labs in sig_of.items():
            hit = sym_cache.get(sig)
            if hit is None:
                cl0, vl0 = labs[0]
                A = bind_label(hterms, cl0, vl0)
                if not A:
                    sym_cache[sig] = (None, None)
                    continue
                Ad = mw.conj_terms(A)
                nterms = mw.mr_expect(mw.mul_terms(Ad, A))
                comm = mw.commutator_terms(hd, A)
                hterms_c = mw.mr_expect(mw.mul_terms(Ad, comm))
                if spatial:
                    nterms = spatialize(nterms)
                    hterms_c = spatialize(hterms_c)
                sym_cache[sig] = (nterms, hterms_c)
                hit = sym_cache[sig]
            nterms, hterms_c = hit
            if nterms is None:
                continue
            if spatial and label_batch:
                # ONE einsum per (term, chunk) over the whole label set
                # of this signature (reference pyblock2/icmr/scnevpt2.py
                # evaluates whole classes as einsums, scnevpt2.py:150)
                core_all = np.arange(ncore)
                act_all = np.arange(ncore, ncore + ncas)
                virt_all = np.arange(ncore + ncas, n)

                def base_rng(sym, _c=core_all, _a=act_all, _v=virt_all):
                    ch = sym[0]
                    if ch in ("C", "O"):
                        return _c
                    if ch == "A":
                        return _a
                    if ch in ("V", "W"):
                        return _v
                    raise KeyError(sym)

                nlb = len(labs)
                lab_of = {}
                cdist0 = sorted(set(labs[0][0]))
                vdist0 = sorted(set(labs[0][1]))
                for k in range(len(cdist0)):
                    lab_of[f"XC{k}"] = np.asarray(
                        [sorted(set(cl))[k] for cl, _ in labs],
                        np.int64)
                for k in range(len(vdist0)):
                    lab_of[f"XV{k}"] = np.asarray(
                        [sorted(set(vl))[k] for _, vl in labs],
                        np.int64)
                Mc = np.ones((nlb, ncore))
                Mv = np.ones((nlb, n - ncore - ncas))
                for li, (cl, vl) in enumerate(labs):
                    for o in set(cl):
                        Mc[li, o] = 0.0
                    for o in set(vl):
                        Mv[li, o - ncore - ncas] = 0.0
                nl_arr = mw.evaluate_labels(
                    nterms, tensors, base_rng, lab_of,
                    {"O": Mc, "W": Mv}, local_names=local_names,
                    local_offset=loc_off)
                he_arr = mw.evaluate_labels(
                    hterms_c, tensors, base_rng, lab_of,
                    {"O": Mc, "W": Mv}, local_names=local_names,
                    local_offset=loc_off)
                live = nl_arr >= 1e-12
                de_arr = np.where(live, he_arr / np.where(live, nl_arr,
                                                          1.0), 0.0)
                keep = live & (np.abs(de_arr) >= 1e-10)
                for li in np.flatnonzero(live & ~keep):
                    res.skipped.append((cname, labs[li][0], labs[li][1],
                                        nl_arr[li], de_arr[li]))
                ecls -= float((nl_arr[keep] / de_arr[keep]).sum())
                if iprint >= 2:
                    for li in np.flatnonzero(keep):
                        print(f"  {cname} {labs[li][0]}->{labs[li][1]}:"
                              f" N={nl_arr[li]:.2e} "
                              f"de={de_arr[li]:.6f}")
                continue
            for cl, vl in labs:
                rng = ranges_factory(n, ncore, ncas, cl, vl)
                nl = mw.evaluate(nterms, tensors, rng,
                                 local_names=local_names,
                                 local_offset=loc_off)
                if nl < 1e-12:
                    continue
                # <A^+ (H_D - E0) A> = <A^+ [H_D, A]>  (Dyall eigenstate
                # property; keeps RDM order at 4)
                he = mw.evaluate(hterms_c, tensors, rng,
                                 local_names=local_names,
                                 local_offset=loc_off)
                de = he / nl
                if abs(de) < 1e-10:
                    res.skipped.append((cname, cl, vl, nl, de))
                    continue
                ecls -= nl / de
                if iprint >= 2:
                    print(f"  {cname} {cl}->{vl}: N={nl:.2e} "
                          f"de={de:.6f}")
        res.classes[cname] = ecls
        res.e2 += ecls
        if iprint:
            print(f"{cname:8s} E2 = {ecls:.10f}")
    return res


# ---------------------------------------------------------------------------
# exact determinant-space reference (same theory, brute force)
# ---------------------------------------------------------------------------

def sc_nevpt2_fci(fd: FCIDUMP, ncore: int, ncas: int,
                  iprint: int = 0) -> SCNEVPT2Result:
    """Exact strongly-contracted NEVPT2: group H|Psi0> by external
    occupation pattern in determinant space."""
    n = fd.n_sites
    e_cas, c0m, ix, mask = casci_root(fd, ncore, ncas)
    psi0 = np.zeros(4 ** n)
    psi0[ix[mask]] = c0m
    if ncas:
        g1s = active_gammas(psi0, n, ncore, ncas, kmax=1)["g1"]
        rdm1_sp = g1s[0::2, 0::2] + g1s[1::2, 1::2]
    else:
        rdm1_sp = None
    fdd = dyall_fcidump(fd, ncore, ncas, rdm1_active=rdm1_sp)

    h = term_table_to_sparse(qc_term_table(fd))
    hdm = term_table_to_sparse(qc_term_table(fdd))
    e0 = float(psi0 @ (hdm @ psi0))
    v = h @ psi0
    # external occupation pattern of every basis state
    dim = 4 ** n
    occ = {0: 0, 1: 1, 2: 1, 3: 2}
    nzi = np.nonzero(np.abs(v) > 1e-13)[0]
    pats: Dict[Tuple[int, ...], List[int]] = {}
    for b in nzi:
        rem = int(b)
        digs = []
        for t in range(n - 1, -1, -1):
            digs.append(rem % 4)
            rem //= 4
        digs = digs[::-1]           # site-major: site 0 first
        pat = tuple(occ[digs[t]] for t in range(ncore)) + \
            tuple(occ[digs[t]] for t in range(ncore + ncas, n))
    # reference pattern: cores doubly occupied, virtuals empty
        pats.setdefault(pat, []).append(b)
    ref_pat = (2,) * ncore + (0,) * (n - ncore - ncas)
    res = SCNEVPT2Result(0.0, e_cas)
    for pat, rows in sorted(pats.items()):
        if pat == ref_pat:
            continue
        rows = np.asarray(rows)
        vl = np.zeros(dim)
        vl[rows] = v[rows]
        nl = float(vl @ vl)
        if nl < 1e-12:
            continue
        de = float(vl @ (hdm @ vl)) / nl - e0
        res.e2 -= nl / de
        kc = 2 * ncore - sum(pat[:ncore])
        kv = sum(pat[ncore:])
        cname = CLASSES.get((kc, kv), f"({kc},{kv})")
        res.classes[cname] = res.classes.get(cname, 0.0) - nl / de
        if iprint >= 2:
            print(f"  pat {pat}: N={nl:.3e} de={de:.6f}")
    return res

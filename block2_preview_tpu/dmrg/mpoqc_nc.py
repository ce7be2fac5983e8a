"""Analytic NC/CN/Conventional quantum-chemistry MPO builder (SZ mode).

TPU-native counterpart of the hand-derived MPOQC partitions (reference
src/dmrg/qc_mpo.hpp:634-646 QCTypes NC / CN / Conventional with the mid-chain
NC->CN switch via MPOSchemer, mpo.hpp:42).  The bipartite builder
(mpo_builder.py) remains the default (smaller bonds, any Hamiltonian); this
module provides the classic complementary-operator structure:

  * a bond symbol is *prefix-identified* ("normal": I, C_p, D_p, A/B pairs)
    while its side of the term holds <= 2 elementary operators, and
    *suffix-identified* ("complementary": R-type singles, P/Q-type pairs, H)
    otherwise — the NC rule; CN mirrors the preference to the suffix;
    Conventional applies NC left of the switch bond and CN right of it.
  * the integral coefficient (with the fermionic reordering sign) attaches
    exactly once per term, at the first transition whose outgoing symbol is
    suffix-identified — for pairs crossing the switch bond this reproduces
    the NC->CN transition matrices of the reference schemer.
  * Jordan-Wigner strings fold into per-site matrices as Z^(parity of the
    ops remaining to the right), which is key-determined because every QC
    term has even length (matches core/expr.py term_row conventions).

Symbols carry explicit (site, elem) tuples, so the builder is exact for
RHF/UHF integral tables alike; aggregation happens because many terms share
prefixes/suffixes.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..core.expr import _inversion_parity, qc_raw_terms
from ..core.fcidump import FCIDUMP
from ..core.symmetry import QN, SZ_GROUP, SymmetryGroup
from ..ops.local_ops import ELEM_DQ, ELEM_MATS, IDENT, PARITY, SZ_SITE
from .mpo import MPO

OpT = Tuple[int, int]                     # (site, elem)
KeyT = Tuple                               # ("I",) | ("H",) | ("N"|"C", ops)


def _key_dq(key: KeyT, group: SymmetryGroup, site_pgs) -> QN:
    """Delta quantum (prefix charge) of a bond symbol."""
    if key[0] in ("I", "H"):
        return group.zero
    total = group.zero
    for (s, e) in key[1]:
        n, tz = ELEM_DQ[e]
        pg = int(site_pgs[s]) if site_pgs is not None else 0
        # xor pg factor is its own inverse, so +/- is irrelevant for it
        total = group.add(total, (n, tz, pg))
    if key[0] == "N":
        return total
    return group.neg(total)                # suffix-identified: prefix = -suffix


def _key_parity(key: KeyT) -> int:
    """Parity of the ops remaining to the right of a bond carrying `key`
    (even total term length => prefix parity == suffix parity)."""
    if key[0] in ("I", "H"):
        return 0
    return len(key[1]) & 1


def build_mpoqc(fd: FCIDUMP, scheme: str = "conventional",
                cutoff: float = 1e-13,
                site_pgs: Optional[Sequence[int]] = None) -> MPO:
    """Analytic QC MPO; scheme in {"nc", "cn", "conventional"}."""
    assert scheme in ("nc", "cn", "conventional")
    L = fd.n_sites
    switch = L // 2 if scheme == "conventional" else (L if scheme == "nc"
                                                      else 0)
    group = SZ_GROUP
    if site_pgs is None:
        site_pgs = fd.orb_sym if fd.orb_sym is not None else [0] * L
    site_quanta = [[(0, 0, 0), (1, 1, int(p)), (1, -1, int(p)), (2, 0, 0)]
                   for p in site_pgs]

    terms = qc_raw_terms(fd, cutoff)

    def rule(bond: int, c: int, k: int) -> str:
        """'N' (prefix-identified) or 'C' (suffix-identified) at `bond`
        for a term with c of its k ops strictly left of the bond."""
        if c == 0:
            return "I"
        if c == k:
            return "H"
        if bond <= switch:                 # NC region
            return "N" if c <= 2 else "C"
        return "C" if (k - c) <= 2 else "N"    # CN region

    def key_of(bond, ops_sorted, c, k) -> KeyT:
        r = rule(bond, c, k)
        if r == "I":
            return ("I",)
        if r == "H":
            return ("H",)
        if r == "N":
            return ("N", tuple(ops_sorted[:c]))
        return ("C", tuple(ops_sorted[c:]))

    # entries[t][(key_in, key_out)] = 4x4 matrix (accumulated)
    entries: List[Dict[Tuple[KeyT, KeyT], np.ndarray]] = \
        [dict() for _ in range(L)]
    # live intervals per key: key -> [min_bond, max_bond]
    live: Dict[KeyT, List[int]] = {("I",): [0, L], ("H",): [0, L]}

    def touch(key: KeyT, bond: int) -> None:
        ent = live.get(key)
        if ent is None:
            live[key] = [bond, bond]
        else:
            if bond < ent[0]:
                ent[0] = bond
            if bond > ent[1]:
                ent[1] = bond

    def add_entry(t: int, ki: KeyT, ko: KeyT, mat: np.ndarray,
                  attach: bool) -> None:
        """Coefficient-carrying entries accumulate across terms; structural
        (prefix/suffix-building) entries are key-determined and idempotent —
        every term sharing the symbol pair contributes the identical matrix
        exactly once (this is where the complementary-operator compression
        happens)."""
        d = entries[t]
        prev = d.get((ki, ko))
        if prev is None:
            d[(ki, ko)] = mat.copy()
        elif attach:
            prev += mat

    for coeff, ops in terms:
        if coeff == 0.0:
            continue
        k = len(ops)
        sites = [s for s, _ in ops]
        sign = -1.0 if _inversion_parity(sites) else 1.0
        order = sorted(range(k), key=lambda i: sites[i])
        ops_sorted = [ops[i] for i in order]
        ssites = [ops_sorted[i][0] for i in range(k)]
        w = sign * coeff

        # walk the involved sites; key flips at uninvolved bonds (the
        # Conventional NC->CN switch hop) are emitted inside the loop
        walk = sorted(set(ssites))
        attached = False
        prev_bond = None
        prev_key: KeyT = ("I",)
        for t in walk:
            c_in = sum(1 for s in ssites if s < t)
            c_out = sum(1 for s in ssites if s <= t)
            ki = key_of(t, ops_sorted, c_in, k)
            ko = key_of(t + 1, ops_sorted, c_out, k)
            # the key can also flip at uninvolved bonds between prev site
            # and t (scheme switch): emit identity hops
            if prev_bond is not None:
                kb = prev_key
                for b in range(prev_bond + 1, t + 1):
                    knew = key_of(b, ops_sorted, c_in, k)
                    if knew != kb:
                        mat = PARITY.copy() if _key_parity(kb) else \
                            IDENT.copy()
                        att = not attached and knew[0] in ("C", "H")
                        if att:
                            attached = True
                        add_entry(b - 1, kb, knew, (w if att else 1.0) * mat,
                                  att)
                        touch(kb, b - 1)
                        touch(knew, b)
                        kb = knew
                ki = kb
            # local matrix: product of this site's elems (term order),
            # then Z^(parity of ops remaining strictly right)
            mat = None
            for (s, e) in ops_sorted:
                if s == t:
                    m = ELEM_MATS[e]
                    mat = m.copy() if mat is None else mat @ m
            assert mat is not None
            if (k - c_out) & 1:
                mat = mat @ PARITY
            att = not attached and ko[0] in ("C", "H")
            if att:
                attached = True
            add_entry(t, ki, ko, (w if att else 1.0) * mat, att)
            touch(ki, t)
            touch(ko, t + 1)
            prev_bond = t + 1
            prev_key = ko
        # trailing key flips after the last involved site (CN hop to H
        # happens only via c == k which is already H) — nothing to do
        assert attached, "coefficient never attached"

    # ------------------------------------------------------------------
    # assemble bonds: symbol tables + pass-through entries
    bond_keys: List[List[KeyT]] = [[] for _ in range(L + 1)]
    for key, (b0, b1) in live.items():
        if key == ("I",):
            b0, b1 = 0, L - 1          # I never needed on the last bond
        if key == ("H",):
            b0, b1 = 1, L              # H never on the first bond
        for b in range(b0, b1 + 1):
            bond_keys[b].append(key)
    sym_id: List[Dict[KeyT, int]] = []
    for b in range(L + 1):
        ks = sorted(set(bond_keys[b]), key=repr)
        if b == 0:
            ks = [("I",)]
        if b == L:
            ks = [("H",)]
        sym_id.append({kk: i for i, kk in enumerate(ks)})

    bond_dqs: List[List[QN]] = []
    for b in range(L + 1):
        dqs = [None] * len(sym_id[b])
        for kk, i in sym_id[b].items():
            dqs[i] = _key_dq(kk, group, site_pgs)
        bond_dqs.append(dqs)

    tensors: List[Dict[Tuple[int, int], np.ndarray]] = []
    for t in range(L):
        d: Dict[Tuple[int, int], np.ndarray] = {}
        # pass-through for every symbol alive on both sides
        for kk, i in sym_id[t].items():
            j = sym_id[t + 1].get(kk)
            if j is None:
                continue
            d[(i, j)] = PARITY.copy() if _key_parity(kk) else IDENT.copy()
        for (ki, ko), mat in entries[t].items():
            # ki != ko always (keys encode the op prefix/suffix, which
            # changes at every involved site and every switch hop)
            i = sym_id[t].get(ki)
            j = sym_id[t + 1].get(ko)
            if i is None or j is None:
                continue
            prev = d.get((i, j))
            d[(i, j)] = mat if prev is None else prev + mat
        tensors.append({k2: v for k2, v in d.items()
                        if np.any(np.abs(v) > 1e-15)})

    return MPO(group=group, n_sites=L, site_quanta=site_quanta,
               bond_dqs=bond_dqs, tensors=tensors, const_e=fd.const_e)

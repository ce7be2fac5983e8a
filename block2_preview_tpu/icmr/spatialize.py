"""Spatialization of fully-contracted MR-Wick terms.

The icmr class equations come out of `mrwick.mr_expect` as contractions
of spin-ORBITAL tensors (h, antisymmetrized v, deltas, and spin-orbital
active RDMs g1..g4).  For spin-free Hamiltonians every such term can be
rewritten over SPATIAL indices: expanding each antisymmetrized integral
into its two plain (physicist) pieces fixes a definite spin-delta link
structure; the spin variables then form chains whose two endpoints (if
any) land on the RDM factor, so the spin sum collapses to a pairing of
RDM creation/annihilation slots — i.e. a SPIN-TRACED spatial RDM with
permuted labels — and every closed chain contributes a factor 2.

This is the same reduction block2 performs symbolically
(`add_spin_free_trans_symm`, reference src/ic/wick.hpp; used by
pyblock2/icmr/scnevpt2.py to emit equations over spatial E1..E4), and it
drops the 4-RDM memory footprint from (2*ncas)^8 to ncas^8 — the
production enabler for DMRG-sc-NEVPT2 at ncas 12-16+.

Spin-traced RDM convention used here (G_k, "nested" pairing):
    G_k[P1..Pk, Q1..Qk] = sum_{s1..sk}
        < (P1 s1)^+ ... (Pk sk)^+  (Qk sk) ... (Q1 s1) >
so annihilation slot m (left to right) carries spin s_{k+1-m}.
`spin_trace_gammas` builds G_k densely from spin-orbital gammas (tests /
small systems); production paths supply G_k directly from the spatial
NPDM engine.
"""

from __future__ import annotations

import itertools
from typing import Dict, List, Sequence, Tuple

import numpy as np

from .mrwick import MTerm


def _parity(perm: Sequence[int]) -> int:
    seen = [False] * len(perm)
    sign = 1
    for i in range(len(perm)):
        if seen[i]:
            continue
        j, ln = i, 0
        while not seen[j]:
            seen[j] = True
            j = perm[j]
            ln += 1
        if ln % 2 == 0:
            sign = -sign
    return sign


def spatialize(cterms: Sequence[MTerm]) -> List[MTerm]:
    """Rewrite fully-contracted spin-orbital terms (tensors h/hd, v/vd
    antisymmetrized, delta, g1..g4; no pending ops) into spatial terms
    over tensors h/hd, vp/vdp (plain physicist), delta, G1..G4."""
    out: List[MTerm] = []
    for term in cterms:
        assert not term.ops
        # branch over the two plain pieces of every antisymmetrized
        # integral: <pq||rs> = <pq|rs> - <pq|sr>
        vfacs = [i for i, (n, _) in enumerate(term.tensors)
                 if n in ("v", "vd")]
        for combo in itertools.product((0, 1), repeat=len(vfacs)):
            coeff = term.coeff
            facs: List[Tuple[str, Tuple[str, ...]]] = []
            links: List[Tuple[str, str]] = []
            gfac = None
            for i, (name, ixs) in enumerate(term.tensors):
                if name in ("v", "vd"):
                    p, q, r, s = ixs
                    which = combo[vfacs.index(i)]
                    pname = "vp" if name == "v" else "vdp"
                    if which == 0:
                        facs.append((pname, (p, q, r, s)))
                        links += [(p, r), (q, s)]
                    else:
                        coeff = -coeff
                        facs.append((pname, (p, q, s, r)))
                        links += [(p, s), (q, r)]
                elif name in ("h", "hd"):
                    facs.append((name, ixs))
                    links.append((ixs[0], ixs[1]))
                elif name == "delta":
                    facs.append((name, ixs))
                    links.append((ixs[0], ixs[1]))
                elif name.startswith("g"):
                    assert gfac is None, "one RDM factor per term"
                    gfac = (int(name[1:]), ixs)
                else:
                    raise ValueError(f"unknown tensor {name}")

            # spin chains: union-find over symbols
            parent: Dict[str, str] = {}

            def find(x: str) -> str:
                while parent.get(x, x) != x:
                    x = parent[x]
                return x

            def union(a: str, b: str) -> None:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[ra] = rb

            syms = set()
            for _, ixs in facs:
                syms.update(ixs)
            if gfac is not None:
                syms.update(gfac[1])
            for a, b in links:
                union(a, b)

            if gfac is None:
                # every chain is a closed spin loop: factor 2 each
                comps = {find(x) for x in syms}
                out.append(MTerm(coeff * (2.0 ** len(comps)),
                                 tuple(facs), ()))
                continue

            k, gix = gfac
            cre, ann = gix[:k], gix[k:]
            comp_of_cre = [find(x) for x in cre]
            comp_of_ann = [find(x) for x in ann]
            gcomps = set(comp_of_cre) | set(comp_of_ann)
            # chains not touching the RDM: closed loops
            comps = {find(x) for x in syms}
            nloops = len(comps - gcomps)
            # pairing: creation i <-> annihilation slot j sharing a chain
            if (len(set(comp_of_cre)) != k or len(set(comp_of_ann)) != k
                    or set(comp_of_cre) != set(comp_of_ann)):
                # a chain touches two creations (or two annihilations):
                # impossible for alternating dagger links — guard anyway
                raise ValueError("non-alternating spin chain at RDM")
            slot_of = {c: j for j, c in enumerate(comp_of_ann)}
            pi = [slot_of[c] for c in comp_of_cre]   # cre i -> ann slot
            # reorder annihilation slots into the nested layout: partner
            # of creation i must sit at slot k-1-i (0-based)
            perm = [pi[k - 1 - m] for m in range(k)]  # new pos m <- old
            sign = _parity(perm)
            newq = tuple(ann[perm[m]] for m in range(k))
            facs.append((f"G{k}", tuple(cre) + newq))
            out.append(MTerm(coeff * sign * (2.0 ** nloops),
                             tuple(facs), ()))
    return out


def spin_trace_gammas(gammas: Dict[str, np.ndarray],
                      kmax: int = 4) -> Dict[str, np.ndarray]:
    """Dense spin-traced G_k from spin-orbital gammas g_k (test /
    small-system path; spin-orbital index = 2*spatial + spin)."""
    out: Dict[str, np.ndarray] = {}
    for kk in range(1, kmax + 1):
        g = gammas.get(f"g{kk}")
        if g is None:
            continue
        nso = g.shape[0]
        na = nso // 2
        G = np.zeros((na,) * (2 * kk))
        # sum spin assignments s1..sk; creation slot i carries s_i,
        # annihilation slot m carries s_{k+1-m}
        for spins in itertools.product((0, 1), repeat=kk):
            idx = []
            for i in range(kk):       # creations
                idx.append((2 * np.arange(na) + spins[i]))
            for m in range(kk):       # annihilations, nested spins
                idx.append((2 * np.arange(na) + spins[kk - 1 - m]))
            G += g[np.ix_(*idx)]
        out[f"G{kk}"] = G
    return out

"""Spin-free (E-operator) layer over the multireference Wick engine.

The spin-orbital engine (icmr/mrwick.py) evaluates internally
contracted expressions through spin-orbital RDMs — (2 ncas)^{2k} dense
tensors that cap the active space.  This layer builds every operator
out of spin-SUMMED excitations

    E_pq = sum_s c+_{p s} c_{q s}

marking each pair's shared spin with an inert "spinlink" tensor factor
that survives `mul_terms`/`mr_expect` renaming untouched.  After full
Wick contraction every spin variable sits on a chain of spinlinks and
contraction deltas, so `spatialize_sf` collapses the spin sums exactly:
chains not touching the RDM give factors of 2, chains ending on the RDM
define a slot pairing, and the RDM becomes the SPIN-TRACED spatial G_k
(nested convention of icmr/spatialize.py — the same tensors the
polynomial spatial NPDM engine produces).  This is the reference's
spin-free internal-contraction machinery
(pyblock2/icmr/icnevpt2_full.py on WickExpr with
add_spin_free_trans_symm).
"""

from __future__ import annotations

import itertools
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .mrwick import ACTIVE, CORE, VIRT, MOp, MTerm
from .spatialize import _parity


def E1sf(p: str, q: str, sp_p: str, sp_q: str,
         tensors: Tuple = ()) -> MTerm:
    """One spin-summed excitation E_pq as an MTerm (optionally carrying
    tensor factors); the shared spin is the ("spinlink", (p, q))
    marker."""
    return MTerm(1.0, tuple(tensors) + (("spinlink", (p, q)),),
                 (MOp(p, sp_p, True), MOp(q, sp_q, False)))


def prod_terms(*factors: Sequence[MTerm]) -> List[MTerm]:
    from .mrwick import mul_terms
    return mul_terms(*factors)


def sf_hamiltonian(h: str = "h", v: str = "vp") -> List[MTerm]:
    """Spin-free Hamiltonian with SPATIAL tensors:
    H = sum h[pq] E_pq + 1/2 sum <pq|rs> sum_{st} c+_ps c+_qt c_st c_rs
    over all (C, A, V) space assignments."""
    out: List[MTerm] = []
    spaces = (CORE, ACTIVE, VIRT)
    for sp, sq in itertools.product(spaces, repeat=2):
        out.append(MTerm(1.0, ((h, ("p", "q")),
                               ("spinlink", ("p", "q"))),
                         (MOp("p", sp, True), MOp("q", sq, False))))
    for sp, sq, sr, ss in itertools.product(spaces, repeat=4):
        # 0.5 <pq|rs> c+_p c+_q c_s c_r with spins (p,r) and (q,s)
        out.append(MTerm(0.5, ((v, ("p", "q", "r", "s")),
                               ("spinlink", ("p", "r")),
                               ("spinlink", ("q", "s"))),
                         (MOp("p", sp, True), MOp("q", sq, True),
                          MOp("s", ss, False), MOp("r", sr, False))))
    return out


def sf_dyall(h: str = "hd", v: str = "vdp") -> List[MTerm]:
    """Dyall H0 in spin-free form: core/virt one-body diagonal blocks +
    the full active one- and two-body parts (tensor values come from
    dyall_fcidump, which zeroes everything else — full-space slot
    enumeration is correct and simpler)."""
    return sf_hamiltonian(h, v)


def spatialize_sf(cterms: Sequence[MTerm]) -> List[MTerm]:
    """Collapse the spin structure of fully-contracted spin-free terms:
    links = contraction deltas + spinlink markers; chains off the RDM
    give 2^loops; chains onto the RDM give the G_k slot pairing."""
    out: List[MTerm] = []
    for term in cterms:
        assert not term.ops
        parent: Dict[str, str] = {}

        def find(x: str) -> str:
            while parent.get(x, x) != x:
                x = parent[x]
            return x

        def union(a: str, b: str) -> None:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb

        facs: List[Tuple[str, Tuple[str, ...]]] = []
        gfac = None
        syms = set()
        for name, ixs in term.tensors:
            if name == "spinlink":
                union(ixs[0], ixs[1])
                syms.update(ixs)
            elif name == "delta":
                facs.append((name, ixs))
                union(ixs[0], ixs[1])
                syms.update(ixs)
            elif name.startswith("g") and name[1:].isdigit():
                assert gfac is None
                gfac = (int(name[1:]), ixs)
                syms.update(ixs)
            else:
                facs.append((name, ixs))
                syms.update(ixs)

        if gfac is None:
            comps = {find(x) for x in syms}
            out.append(MTerm(term.coeff * (2.0 ** len(comps)),
                             tuple(facs), ()))
            continue

        k, gix = gfac
        cre, ann = gix[:k], gix[k:]
        comp_of_cre = [find(x) for x in cre]
        comp_of_ann = [find(x) for x in ann]
        gcomps = set(comp_of_cre) | set(comp_of_ann)
        comps = {find(x) for x in syms}
        nloops = len(comps - gcomps)
        if (len(set(comp_of_cre)) != k or len(set(comp_of_ann)) != k
                or set(comp_of_cre) != set(comp_of_ann)):
            raise ValueError("non-alternating spin chain at RDM")
        slot_of = {c: j for j, c in enumerate(comp_of_ann)}
        pi = [slot_of[c] for c in comp_of_cre]
        perm = [pi[k - 1 - m] for m in range(k)]
        sign = _parity(perm)
        newq = tuple(ann[perm[m]] for m in range(k))
        facs.append((f"G{k}", tuple(cre) + newq))
        out.append(MTerm(term.coeff * sign * (2.0 ** nloops),
                         tuple(facs), ()))
    return out

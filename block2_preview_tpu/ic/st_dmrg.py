"""Similarity-transformed DMRG (ST-DMRG).

TPU-native counterpart of the reference's SimilarityTransform driver
(reference pyblock2/driver/core.py:9580 SimilarityTransform; ST-DMRG of
Yanai et al.): DMRG on the CCSD similarity-transformed Hamiltonian

    Hbar = e^{-T} H e^{T} = (H e^{T})_connected,  T = T1 + T2,

truncated at two-body rank.  Because T contains only pure excitations
(vir-cre x occ-ann), T-T contractions vanish and the BCH series is the
sum over k <= 4 of H T^k / k! with every T factor contracted to H at
least once (linked theorem).  The partial Wick expansion keeps
uncontracted remainders of rank <= 2 pairs; remainders are exactly
rewritten in plain (creation-left) form, so the result is a general
non-Hermitian spin-orbital integral set (e0, hbar1, vbar2) fed to the
SGF general-MPO path and a two-sided Davidson sweep.

Exact internal anchors (tested): e0 == E_CCSD, and
<singles/doubles| Hbar_12 |Phi> == 0 at converged CCSD amplitudes
(the truncation is the quasi-normal-ordered <=2-body part, whose
low-rank matrix elements equal the full Hbar's).
"""

from __future__ import annotations

import itertools
import math
from typing import Dict, List, Sequence, Tuple

import numpy as np

from .wick import OCC, VIR, Op, Term, WickExpr, _contraction_sign, \
    _pair_value, space_of


# ---------------------------------------------------------------------------
# partial Wick with factor connectivity
# ---------------------------------------------------------------------------

def _plain_reorder(ops: Tuple[Op, ...]):
    """Reorder a PLAIN operator string to creation-left form using full
    anticommutators: returns [(sign, deltas, ordered)] with
    deltas = ("delta", x, y) (space-unrestricted)."""
    for k in range(len(ops) - 1):
        if (not ops[k].dagger) and ops[k + 1].dagger:
            swapped = ops[:k] + (ops[k + 1], ops[k]) + ops[k + 2:]
            contracted = ops[:k] + ops[k + 2:]
            out = [(-s, d, o) for (s, d, o) in _plain_reorder(swapped)]
            s1, s2 = space_of(ops[k].index), space_of(ops[k + 1].index)
            if not ((s1 == OCC and s2 == VIR)
                    or (s1 == VIR and s2 == OCC)):
                dl = ("delta", ops[k].index, ops[k + 1].index)
                for (s, d, o) in _plain_reorder(contracted):
                    out.append((s, d + (dl,), o))
            return out
    return [(1, (), ops)]


def _plain_order(ops: Tuple[Op, ...]):
    """Expand a quasi-normal-ordered remainder :ops: into plain
    creation-left operator strings:

        :X: = sum over internal contraction subsets of
              prod(-<pair>) * plain(rest as positioned)

    (Moebius inversion of Wick's theorem), each plain remainder then
    reordered creation-left with full anticommutator deltas.
    Returns [(sign, deltas, ordered_ops)]."""
    out = []

    # enumerate subsets properly: at each step, either contract
    # remaining[0] with someone or leave it
    res = []

    def subsets(remaining, pairs):
        if not remaining:
            res.append(pairs)
            return
        a = remaining[0]
        subsets(remaining[1:], pairs)           # a uncontracted
        for bi in range(1, len(remaining)):
            b = remaining[bi]
            pv = _pair_value(ops[a], ops[b])
            if pv is None:
                continue
            subsets([r for r in remaining[1:] if r != b],
                    pairs + [(a, b, pv)])

    subsets(list(range(len(ops))), [])
    for pairs in res:
        positions = [(a, b) for (a, b, _pv) in pairs]
        contracted = {x for (a, b) in positions for x in (a, b)}
        remaining = [k for k in range(len(ops)) if k not in contracted]
        sign = 1
        for (a1, b1), (a2, b2) in itertools.combinations(positions, 2):
            if a1 < a2 < b1 < b2 or a2 < a1 < b2 < b1:
                sign = -sign
        for (a, b) in positions:
            sign *= (-1) ** sum(1 for k in remaining if a < k < b)
        sign *= (-1) ** len(pairs)
        dls = tuple((pv[0], pv[1], pv[2]) for (_a, _b, pv) in pairs)
        rest = tuple(ops[k] for k in remaining)
        for (s2, extra, ordered) in _plain_reorder(rest):
            out.append((sign * s2, dls + extra, ordered))
    return out


def connected_expand(hterm: Term, tfactors: List[List[Term]],
                     max_rank: int = 2) -> List[Term]:
    """All Wick contraction subsets of hterm * prod(tfactors) where each
    T factor contracts to H at least once and the remainder has
    <= max_rank pairs; remainder rewritten in plain order."""
    out: List[Term] = []
    for combo in itertools.product(*tfactors):
        coeff = hterm.coeff
        tensors = hterm.tensors
        ops = list(hterm.ops)
        fid = [0] * len(hterm.ops)
        for f, t in enumerate(combo):
            coeff *= t.coeff
            tensors = tensors + t.tensors
            ops += list(t.ops)
            fid += [f + 1] * len(t.ops)
        nH = len(hterm.ops)
        nf = len(combo)

        def enum(remaining, pairs, kept):
            if not remaining:
                hit = set()
                for (a, b, _pv) in pairs:
                    hit.add(fid[a])
                    hit.add(fid[b])
                if any((f + 1) not in hit for f in range(nf)):
                    return
                _emit(coeff, tensors, ops, pairs, kept, out)
                return
            a = remaining[0]
            for bi in range(1, len(remaining)):
                b = remaining[bi]
                if fid[a] == fid[b]:
                    continue      # intra-factor contractions excluded
                if fid[a] != 0 and fid[b] != 0:
                    continue      # T-T vanish (pure excitations)
                pv = _pair_value(ops[a], ops[b])
                if pv is None:
                    continue
                enum([r for r in remaining[1:] if r != b],
                     pairs + [(a, b, pv)], kept)
            if len(kept) < 2 * max_rank:
                enum(remaining[1:], pairs, kept + [a])

        enum(list(range(len(ops))), [], [])
    return out


def _emit(coeff, tensors, ops, pairs, kept, out: List[Term]) -> None:
    positions = [(a, b) for (a, b, _pv) in pairs]
    sign = _contraction_sign(positions, len(ops))
    for (a, b) in positions:
        sign *= (-1) ** sum(1 for k in kept if a < k < b)
    deltas = tuple((pv[0], (pv[1], pv[2])) for (_a, _b, pv) in pairs)
    rem = tuple(ops[k] for k in kept)
    for (s2, extra, ordered) in _plain_order(rem):
        out.append(Term(coeff * sign * s2,
                        tensors + deltas
                        + tuple((t, (x, y)) for (t, x, y) in extra),
                        ordered))


# ---------------------------------------------------------------------------
# Hbar integral assembly
# ---------------------------------------------------------------------------

def _h_terms() -> List[Term]:
    return [
        Term(1.0, (("h", ("p0", "q0")),),
             (Op("p0", True), Op("q0", False))),
        Term(0.25, (("v", ("p0", "q0", "r0", "s0")),),
             (Op("p0", True), Op("q0", True),
              Op("s0", False), Op("r0", False))),
    ]


def _t_terms(tag: int) -> List[Term]:
    a, b, i, j = (f"a{tag}", f"b{tag}", f"i{tag}", f"j{tag}")
    return [
        Term(1.0, (("t1", (a, i)),), (Op(a, True), Op(i, False))),
        Term(0.25, (("t2", (a, b, i, j)),),
             (Op(a, True), Op(b, True), Op(j, False), Op(i, False))),
    ]


def hbar_integrals(nso: int, occ: np.ndarray, vir: np.ndarray,
                   fock_so: np.ndarray, v_as: np.ndarray,
                   t1: np.ndarray, t2: np.ndarray, e_ref: float = 0.0
                   ) -> Tuple[float, np.ndarray, np.ndarray]:
    """(e0, hbar1 [nso,nso], vbar2 [nso]^4 in plain 1/4 P+Q+SR form).

    Input H in quasi-normal-ordered form: H = e_ref + sum fock :P+Q:
    + 1/4 v_as :P+Q+SR: (every factor quasi-normal, as Wick's
    factorized theorem requires).  Output in PLAIN form:
    Hbar_12 = e0 + sum hbar1 P+Q + 1/4 vbar2 P+Q+SR.
    t1 [nvir, nocc], t2 [nvir, nvir, nocc, nocc] antisymmetrized,
    occ/vir global spin-orbital index arrays."""
    spaces = {OCC: occ, VIR: vir}
    tensors = {"h": fock_so, "v": v_as, "t1": t1, "t2": t2}
    # t tensors are indexed by (local vir, local occ) axes
    local_axes = {"t1": (VIR, OCC), "t2": (VIR, VIR, OCC, OCC)}
    loc_of = {OCC: {int(x): k for k, x in enumerate(occ)},
              VIR: {int(x): k for k, x in enumerate(vir)}}

    e0 = float(e_ref)
    h1 = np.zeros((nso, nso))
    A = np.zeros((nso, nso, nso, nso))   # coeff of c1+ c2+ o1 o2

    terms: List[Term] = []
    for k in range(0, 5):
        fact = 1.0 / math.factorial(k)
        for ht in _h_terms():
            hk = Term(ht.coeff * fact, ht.tensors, ht.ops)
            terms += connected_expand(hk, [_t_terms(f + 1)
                                           for f in range(k)])
    for term in terms:
        # union-find over deltas
        parent: Dict[str, str] = {}

        def find(x):
            while parent.get(x, x) != x:
                x = parent[x]
            return x

        facs = []
        forced: Dict[str, str] = {}
        for name, ixs in term.tensors:
            if name in ("delta", "delta_o", "delta_v"):
                if name == "delta_o":
                    forced[ixs[0]] = OCC
                    forced[ixs[1]] = OCC
                if name == "delta_v":
                    forced[ixs[0]] = VIR
                    forced[ixs[1]] = VIR
                rx, ry = find(ixs[0]), find(ixs[1])
                if rx != ry:
                    parent[rx] = ry
            else:
                facs.append((name, ixs))
        # space per class
        cls_space: Dict[str, str] = {}
        dead = False
        all_syms = set(forced)
        for name, ixs in facs:
            sp = local_axes.get(name)
            for k2, x in enumerate(ixs):
                all_syms.add(x)
                if sp is not None:
                    s = sp[k2]
                elif space_of(x) != "gen":
                    s = space_of(x)
                else:
                    continue
                r = find(x)
                cur = cls_space.get(r)
                if cur is None:
                    cls_space[r] = s
                elif cur != s:
                    dead = True
        for x, s in forced.items():
            r = find(x)
            cur = cls_space.get(r)
            if cur is None:
                cls_space[r] = s
            elif cur != s:
                dead = True
        for o in term.ops:
            all_syms.add(o.index)
            if space_of(o.index) != "gen":
                r = find(o.index)
                cur = cls_space.get(r)
                if cur is None:
                    cls_space[r] = space_of(o.index)
                elif cur != space_of(o.index):
                    dead = True
        if dead:
            continue
        # free (remainder) symbols; general-space ops split over occ+vir
        free = [o.index for o in term.ops]
        gen_free = [x for x in free if cls_space.get(find(x)) is None]
        for assign in itertools.product((OCC, VIR), repeat=len(gen_free)):
            cs = dict(cls_space)
            ok = True
            for x, s in zip(gen_free, assign):
                r = find(x)
                if cs.get(r, s) != s:
                    ok = False
                cs[r] = s
            if not ok:
                continue
            val = _eval_term(term, facs, find, cs, spaces, tensors,
                             local_axes, loc_of, free)
            if val is None:
                continue
            ncre = sum(1 for o in term.ops if o.dagger)
            if ncre == 0:
                e0 += float(val)
            elif ncre == 1:
                P = spaces[cs[find(free[0])]]
                Q = spaces[cs[find(free[1])]]
                h1[np.ix_(P, Q)] += val
            else:
                idxs = [spaces[cs[find(x)]] for x in free]
                A[np.ix_(*idxs)] += val
    # Hbar2 = sum A[p,q,x,y] p+ q+ x y; antisymmetrize and convert to
    # the plain 1/4 vbar[P,Q,R,S] P+Q+SR convention
    B = 0.25 * (A - A.transpose(1, 0, 2, 3) - A.transpose(0, 1, 3, 2)
                + A.transpose(1, 0, 3, 2))
    v2 = 4.0 * B.transpose(0, 1, 3, 2)
    return e0, h1, v2


def _eval_term(term, facs, find, cs, spaces, tensors, local_axes, loc_of,
               free):
    """einsum with output = free symbols (in remainder-op order)."""
    letters: Dict[str, str] = {}
    alphabet = iter("abcdefghijklmnopqrstuvwxyz")
    out_sub = ""
    for x in free:
        r = find(x)
        if r not in letters:
            letters[r] = next(alphabet)
        out_sub += letters[r]
    specs, arrays = [], []
    for name, ixs in facs:
        sub = ""
        slicers = []
        sp = local_axes.get(name)
        for k2, x in enumerate(ixs):
            r = find(x)
            if r not in letters:
                letters[r] = next(alphabet)
            sub += letters[r]
            s = cs.get(r)
            if s is None:
                return None
            rng = spaces[s]
            if sp is not None:
                # local tensor axes: identity map (already occ/vir local)
                if sp[k2] != s:
                    return None
                slicers.append(np.arange(len(rng)))
            else:
                slicers.append(rng)
        specs.append(sub)
        arrays.append(tensors[name][np.ix_(*slicers)])
    if not specs:
        return term.coeff if not out_sub else None
    # repeated letters in output not allowed unless also contracted:
    if len(set(out_sub)) != len(out_sub):
        return None
    val = np.einsum(",".join(specs) + "->" + out_sub, *arrays,
                    optimize=True)
    return term.coeff * val


# ---------------------------------------------------------------------------
# end-to-end ST-DMRG solve
# ---------------------------------------------------------------------------

def st_dmrg(fd, bond_dim: int = 200, n_sweeps: int = 10,
            iprint: int = 0):
    """Full ST-DMRG workflow (reference SimilarityTransform driver):
    CCSD amplitudes -> Hbar_12 integrals -> SGF general MPO ->
    non-Hermitian (two-sided Davidson) DMRG sweep.
    Returns (E_st, E_ccsd, e0) with energies including const_e."""
    from ..cc.gccsd import gccsd
    from ..core.fcidump import FCIDUMP
    from ..driver.core import DMRGDriver, SymmetryTypes
    from ..dmrg.sweep import DMRG
    from ..uc.mp import hf_energy_and_fock

    e_hf, f, v = hf_energy_and_fock(fd)
    e_hf2, e_corr, t1, t2 = gccsd(fd, return_amplitudes=True)
    nso = 2 * fd.n_sites
    occ = np.arange(fd.n_elec)
    vir = np.arange(fd.n_elec, nso)
    e0, h1, v2 = hbar_integrals(nso, occ, vir, f, v, t1.T.copy(),
                                t2.transpose(2, 3, 0, 1).copy(),
                                e_ref=e_hf - fd.const_e)
    # plain 1/4 v2 P+Q+SR (physicist antisym) -> chemist general (PQ|RS)
    g_chem = 0.5 * v2.transpose(0, 2, 1, 3)
    sfd = FCIDUMP(n_sites=nso, n_elec=fd.n_elec, twos=fd.twos,
                  ipg=0, orb_sym=np.zeros(nso, dtype=np.int64),
                  h1e=h1, g2e=g_chem, const_e=fd.const_e + e0,
                  general=True, tgeneral=True)
    drv = DMRGDriver(SymmetryTypes.SGF)
    drv.initialize_system(nso, n_elec=fd.n_elec, spin=fd.twos)
    mpo = drv.get_qc_mpo(fcidump=sfd)
    mps = drv.get_random_mps(bond_dim)
    d = DMRG(mpo, mps, iprint=iprint, hermitian=False)
    e_st = d.solve([bond_dim] * n_sweeps, [1e-4, 1e-5] + [0] * 8,
                   [1e-9], n_sweeps=n_sweeps, tol=1e-10)
    return float(e_st), float(e_hf2 + e_corr), float(e0)

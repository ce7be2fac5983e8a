"""Symbolic Wick's theorem for fermionic operator algebra.

TPU-native counterpart of block2's Wick engine (reference src/ic/wick.hpp:
WickTensor :338, WickString :804, WickExpr :1588), the generator behind the
internally-contracted MR methods and the coupled-cluster suite (reference
pyblock2/icmr/*, pyblock2/cc/*).

Scope: second-quantized strings over a Fermi vacuum with occupied (i,j,k,...)
and virtual (a,b,c,...) index spaces, full Wick contraction, normal-ordered
expectation values, dummy-index canonicalization, and numeric evaluation of
the resulting tensor contractions via einsum.  Expressions are small host-side
objects; evaluation dispatches to numpy/jax einsum.
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

OCC = "occ"
VIR = "vir"
GEN = "gen"


def space_of(idx: str) -> str:
    """Index-space convention: i-n occupied, a-h virtual, p-z general."""
    c = idx[0]
    if c in "ijklmn":
        return OCC
    if c in "abcdefgh":
        return VIR
    return GEN


@dataclass(frozen=True)
class Op:
    """Elementary fermion operator: creation if dagger else annihilation."""
    index: str
    dagger: bool

    def __repr__(self):
        return f"{self.index}^" if self.dagger else self.index


@dataclass
class Term:
    """coeff * tensors * (ordered operator string)."""
    coeff: float
    tensors: Tuple[Tuple[str, Tuple[str, ...]], ...]   # (name, indices)
    ops: Tuple[Op, ...]

    def __repr__(self):
        ts = " ".join(f"{n}[{','.join(ix)}]" for n, ix in self.tensors)
        return f"{self.coeff:+g} {ts} {' '.join(map(repr, self.ops))}"


class WickExpr:
    def __init__(self, terms: Optional[List[Term]] = None):
        self.terms: List[Term] = terms or []

    def __add__(self, other: "WickExpr") -> "WickExpr":
        return WickExpr(self.terms + other.terms)

    def __mul__(self, other) -> "WickExpr":
        if isinstance(other, WickExpr):
            out = []
            for t1 in self.terms:
                for t2 in other.terms:
                    out.append(Term(t1.coeff * t2.coeff,
                                    t1.tensors + t2.tensors,
                                    t1.ops + t2.ops))
            return WickExpr(out)
        return WickExpr([Term(t.coeff * other, t.tensors, t.ops)
                         for t in self.terms])

    def __repr__(self):
        return "\n".join(map(repr, self.terms)) or "0"


def _contraction_sign(positions: List[Tuple[int, int]], n: int) -> int:
    """Sign of a full contraction pattern: (-1)^crossings of the pairing."""
    sign = 1
    for (a1, b1), (a2, b2) in itertools.combinations(positions, 2):
        lo1, hi1 = min(a1, b1), max(a1, b1)
        lo2, hi2 = min(a2, b2), max(a2, b2)
        if (lo1 < lo2 < hi1 < hi2) or (lo2 < lo1 < hi2 < hi1):
            sign = -sign
    return sign


def _pair_value(op1: Op, op2: Op):
    """Fermi-vacuum contraction <op1 op2> (op1 left of op2).
    <i j^> type: a_i a^+_j over occupied -> 0; the nonzero pairings are
    a_p a^+_q with p,q virtual-compatible and a^+_p a_q with occupied."""
    # <Phi| x y |Phi>
    if not op1.dagger and op2.dagger:
        # a_p a^+_q: nonzero unless both restricted to occupied
        s1, s2 = space_of(op1.index), space_of(op2.index)
        if s1 == OCC or s2 == OCC:
            return None
        return ("delta_v", op1.index, op2.index)
    if op1.dagger and not op2.dagger:
        # a^+_p a_q: nonzero only in the occupied space
        s1, s2 = space_of(op1.index), space_of(op2.index)
        if s1 == VIR or s2 == VIR:
            return None
        return ("delta_o", op1.index, op2.index)
    return None


def vacuum_expectation(expr: WickExpr) -> WickExpr:
    """<Phi| expr |Phi> by full Wick contraction over the Fermi vacuum
    (reference wick.hpp WickExpr::expand + simplify)."""
    out: List[Term] = []
    for term in expr.terms:
        n = len(term.ops)
        if n % 2:
            continue

        def contract(remaining: List[int], pairs):
            if not remaining:
                positions = [(a, b) for (a, b, _) in pairs]
                sign = _contraction_sign(positions, n)
                deltas = tuple((pv[0], (pv[1], pv[2]))
                               for (_, _, pv) in pairs)
                out.append(Term(term.coeff * sign,
                                term.tensors + deltas, ()))
                return
            a = remaining[0]
            for bi in range(1, len(remaining)):
                b = remaining[bi]
                pv = _pair_value(term.ops[a], term.ops[b])
                if pv is None:
                    continue
                contract([r for r in remaining[1:] if r != b],
                         pairs + [(a, b, pv)])

        contract(list(range(n)), [])
    return WickExpr(out)


def evaluate(expr: WickExpr, tensors: Dict[str, np.ndarray],
             spaces: Dict[str, np.ndarray]) -> float:
    """Numerically evaluate a fully-contracted expression.

    tensors: name -> ndarray indexed by GLOBAL orbital indices.
    spaces:  OCC/VIR -> integer index arrays into the global orbital range.
    Free/dummy indices are summed over their spaces via einsum.
    """
    total = 0.0
    for term in expr.terms:
        # collect index -> space and deltas
        idx_space: Dict[str, str] = {}
        deltas: List[Tuple[str, str]] = []
        facs: List[Tuple[str, Tuple[str, ...]]] = []
        delta_forced: List[Tuple[Tuple[str, str], str]] = []
        for name, ixs in term.tensors:
            if name in ("delta", "delta_o", "delta_v"):
                deltas.append(tuple(ixs))
                forced = OCC if name == "delta_o" else \
                    (VIR if name == "delta_v" else None)
                if forced is not None:
                    delta_forced.append((tuple(ixs), forced))
                for x in ixs:
                    idx_space.setdefault(x, space_of(x))
            else:
                facs.append((name, ixs))
                for x in ixs:
                    idx_space.setdefault(x, space_of(x))
        # delta unification: map indices into equivalence classes
        parent: Dict[str, str] = {}

        def find(x):
            while parent.get(x, x) != x:
                x = parent[x]
            return x

        for (x, y) in deltas:
            rx, ry = find(x), find(y)
            if rx != ry:
                parent[rx] = ry
        # effective space of each class = intersection of index spaces and
        # contraction-type constraints (delta_o -> occ, delta_v -> vir)
        cls_space: Dict[str, str] = {}
        dead = False
        constraints = [(x, sp) for x, sp in idx_space.items()] + \
            [(ix[0], sp) for ix, sp in delta_forced] + \
            [(ix[1], sp) for ix, sp in delta_forced]
        for x, sp in constraints:
            r = find(x)
            cur = cls_space.get(r)
            if sp == GEN:
                cls_space.setdefault(r, GEN)
            elif cur is None or cur == GEN:
                cls_space[r] = sp
            elif sp != cur:
                dead = True   # occupied/virtual conflict
                break
        if dead:
            continue
        # einsum over classes
        letters: Dict[str, str] = {}
        alphabet = iter("abcdefghijklmnopqrstuvwxyz")
        specs = []
        arrays = []
        for name, ixs in facs:
            sub = ""
            for x in ixs:
                r = find(x)
                if r not in letters:
                    letters[r] = next(alphabet)
                sub += letters[r]
            specs.append(sub)
            arr = tensors[name]
            # restrict each axis to its class space
            slicers = []
            for x in ixs:
                sp = cls_space.get(find(x), GEN)
                slicers.append(spaces.get(sp, np.arange(arr.shape[0])))
            arr = arr[np.ix_(*slicers)]
            arrays.append(arr)
        if not facs:
            # pure delta term: product of space sizes of the classes
            val = 1.0
            seen = set()
            for x in idx_space:
                r = find(x)
                if r in seen:
                    continue
                seen.add(r)
                sp = cls_space.get(r, GEN)
                val *= len(spaces.get(sp, []))
            total += term.coeff * val
            continue
        val = np.einsum(",".join(specs) + "->", *arrays, optimize=True)
        total += term.coeff * float(val)
    return total


class ContractionCache:
    """Cross-term common-subexpression memo for Wick-generated equation
    sets — the analog of the reference's WickGraph term factorization
    (src/ic/wick.hpp:2692 WickGraph): identical binary sub-contractions
    appearing in many terms (e.g. v*t2 intermediates across the CCSD
    residual) are computed once and reused.

    Intermediates that depend on a tensor named in `volatile` are kept
    in a per-epoch store, cleared by `new_epoch()` — so an EOM sigma
    evaluation can cache all H-bar intermediates persistently while the
    trial-vector-dependent pieces are rebuilt each matvec.

    Validity: persistent entries assume the non-volatile arrays in
    `tensors` are unchanged between calls; pass a fresh cache otherwise.
    """

    def __init__(self, volatile: Sequence[str] = ()):
        self.volatile = set(volatile)
        self.data: Dict = {}
        self.vol_data: Dict = {}
        self.hits = 0
        self.misses = 0

    def new_epoch(self) -> None:
        self.vol_data.clear()

    def get_or(self, key, vol: bool, fn):
        store = self.vol_data if vol else self.data
        ent = store.get(key)
        if ent is not None:
            self.hits += 1
            return ent
        self.misses += 1
        ent = store[key] = fn()
        return ent


def _factored_einsum(specs, arrays, keys, out_sub, cache: ContractionCache):
    """Evaluate einsum(specs -> out_sub) as greedy binary contractions
    with canonical-key memoization in `cache`.  `keys` carries a
    (hashable key, volatile flag) per input array."""
    # nodes: [letters, key, array, volatile]
    nodes = []
    for sub, arr, (key, vol) in zip(specs, arrays, keys):
        if len(set(sub)) != len(sub):         # internal trace/diagonal
            uniq = "".join(dict.fromkeys(sub))
            pat = tuple(sub.index(c) for c in sub)
            k2 = ("diag", key, pat)
            arr = cache.get_or(
                k2, vol, lambda s=sub, u=uniq, a=arr:
                np.einsum(f"{s}->{u}", a))
            sub, key = uniq, k2
        nodes.append([sub, key, arr, vol])

    def letter_counts():
        cnt: Dict[str, int] = {}
        for c in out_sub:
            cnt[c] = cnt.get(c, 0) + 1
        for nd in nodes:
            for c in nd[0]:
                cnt[c] = cnt.get(c, 0) + 1
        return cnt

    def reduce_lone(nd, others):
        # sum axes whose letter appears neither in the output nor in
        # any OTHER node (nd itself is deliberately not counted)
        used = set(out_sub)
        for o in others:
            used.update(o[0])
        lone = [c for c in nd[0] if c not in used]
        if not lone:
            return nd
        keep = "".join(c for c in nd[0] if c not in lone)
        axes = tuple(i for i, c in enumerate(nd[0]) if c in lone)
        k2 = ("sum", nd[1], axes)
        arr = cache.get_or(k2, nd[3],
                           lambda a=nd[2], ax=axes: a.sum(axis=ax))
        return [keep, k2, arr, nd[3]]

    nodes = [reduce_lone(nd, nodes[:k] + nodes[k + 1:])
             for k, nd in enumerate(nodes)]
    while len(nodes) > 1:
        # pick the pair with the smallest result size (prefer shared)
        best = None
        for i in range(len(nodes)):
            for j in range(i + 1, len(nodes)):
                if not set(nodes[i][0]) & set(nodes[j][0]) \
                        and best is not None:
                    continue
                cnt = letter_counts()
                la, lb = nodes[i][0], nodes[j][0]
                shared = set(la) & set(lb)
                summed = {c for c in shared if cnt[c] == 2}
                size = 1
                for c in dict.fromkeys(la + lb):
                    if c not in summed:
                        d = (nodes[i][2].shape[la.index(c)]
                             if c in la else
                             nodes[j][2].shape[lb.index(c)])
                        size *= d
                if best is None or size < best[0]:
                    best = (size, i, j)
        _, i, j = best
        a, b = nodes[i], nodes[j]
        if (b[1], b[0]) < (a[1], a[0]):        # canonical child order
            a, b = b, a
        la, lb = a[0], b[0]
        cnt = letter_counts()
        shared = set(la) & set(lb)
        summed = sorted(c for c in shared if cnt[c] == 2)
        kept = sorted(c for c in shared if cnt[c] > 2)
        pairs_sum = tuple((la.index(c), lb.index(c)) for c in summed)
        pairs_keep = tuple((la.index(c), lb.index(c)) for c in kept)
        key = ("bin", a[1], b[1], pairs_sum, pairs_keep)
        out_letters = "".join(
            [c for c in la if c not in summed]
            + [c for c in lb if c not in shared])
        vol = a[3] or b[3]
        arr = cache.get_or(
            key, vol,
            lambda la=la, lb=lb, ol=out_letters, x=a[2], y=b[2]:
            np.einsum(f"{la},{lb}->{ol}", x, y, optimize=True))
        nodes = [nd for k, nd in enumerate(nodes) if k not in (i, j)]
        nodes.append(reduce_lone([out_letters, key, arr, vol], nodes))
    sub, key, arr, vol = nodes[0]
    if sub == out_sub:
        return arr
    k2 = ("perm", key, sub, out_sub)
    return cache.get_or(k2, vol,
                        lambda: np.einsum(f"{sub}->{out_sub}", arr))


def evaluate_tensor(expr: WickExpr, tensors: Dict[str, np.ndarray],
                    spaces: Dict[str, np.ndarray],
                    free: Sequence[str],
                    cache: Optional[ContractionCache] = None) -> np.ndarray:
    """Like `evaluate` but with FREE indices kept open: returns an
    ndarray over the free indices' LOCAL spaces (occ/vir positions, not
    global orbitals) — the machinery behind machine-generated projected
    equations (EOM sigma vectors, lambda residuals, CC RDMs; reference
    pyblock2/cc/* Wick-generated code)."""
    free = list(free)
    fspaces = [space_of(x) for x in free]
    shape = tuple(len(spaces[sp]) for sp in fspaces)
    total = np.zeros(shape)
    for term in expr.terms:
        idx_space: Dict[str, str] = {}
        deltas: List[Tuple[str, str]] = []
        facs: List[Tuple[str, Tuple[str, ...]]] = []
        delta_forced: List[Tuple[Tuple[str, str], str]] = []
        for name, ixs in term.tensors:
            if name in ("delta", "delta_o", "delta_v"):
                deltas.append(tuple(ixs))
                forced = OCC if name == "delta_o" else \
                    (VIR if name == "delta_v" else None)
                if forced is not None:
                    delta_forced.append((tuple(ixs), forced))
                for x in ixs:
                    idx_space.setdefault(x, space_of(x))
            else:
                facs.append((name, ixs))
                for x in ixs:
                    idx_space.setdefault(x, space_of(x))
        for x in free:
            idx_space.setdefault(x, space_of(x))
        parent: Dict[str, str] = {}

        def find(x):
            while parent.get(x, x) != x:
                x = parent[x]
            return x

        eye_facs: List[Tuple[str, str]] = []
        for (x, y) in deltas:
            rx, ry = find(x), find(y)
            if rx == ry:
                continue
            if rx in free and ry in free:
                eye_facs.append((rx, ry))
                continue
            # never merge a free symbol away
            if rx in free:
                rx, ry = ry, rx
            parent[rx] = ry
        cls_space: Dict[str, str] = {}
        dead = False
        constraints = [(x, sp) for x, sp in idx_space.items()] + \
            [(ix[0], sp) for ix, sp in delta_forced] + \
            [(ix[1], sp) for ix, sp in delta_forced]
        for x, sp in constraints:
            r = find(x)
            cur = cls_space.get(r)
            if sp == GEN:
                cls_space.setdefault(r, GEN)
            elif cur is None or cur == GEN:
                cls_space[r] = sp
            elif sp != cur:
                dead = True
                break
        if dead:
            continue
        letters: Dict[str, str] = {}
        alphabet = iter("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOP")
        out_sub = ""
        for x in free:
            r = find(x)
            if r not in letters:
                letters[r] = next(alphabet)
            out_sub += letters[r]
        specs = []
        arrays = []
        fac_keys = []
        for name, ixs in facs:
            sub = ""
            for x in ixs:
                r = find(x)
                if r not in letters:
                    letters[r] = next(alphabet)
                sub += letters[r]
            specs.append(sub)
            arr = tensors[name]
            slicers = []
            ax_spaces = []
            for x in ixs:
                sp = cls_space.get(find(x), GEN)
                ax_spaces.append(sp)
                slicers.append(spaces.get(sp, np.arange(arr.shape[0])))
            if cache is not None:
                vol = name in cache.volatile
                key = ("leaf", name, tuple(ax_spaces))
                arrays.append(cache.get_or(
                    key, vol,
                    lambda a=arr, s=slicers: a[np.ix_(*s)]))
                fac_keys.append((key, vol))
            else:
                arrays.append(arr[np.ix_(*slicers)])
        for (x, y) in eye_facs:
            for z in (x, y):
                if z not in letters:
                    letters[z] = next(alphabet)
            specs.append(letters[x] + letters[y])
            sp_e = cls_space.get(x, space_of(x))
            nsp = len(spaces[sp_e])
            arrays.append(np.eye(nsp))
            fac_keys.append((("eye", sp_e), False))
        # dummy classes not bound to any factor: multiply their sizes
        mult = 1.0
        bound = set()
        for s in specs:
            bound.update(s)
        bound.update(out_sub)
        seen = set()
        for x in idx_space:
            r = find(x)
            if r in seen or letters.get(r) in bound:
                seen.add(r)
                continue
            seen.add(r)
            sp = cls_space.get(r, GEN)
            mult *= len(spaces.get(sp, []))
        if not specs:
            # pure scalar (times identity over free axes is impossible
            # here: free symbols unbound by any factor means a uniform
            # contribution)
            total += term.coeff * mult
            continue
        if cache is not None:
            val = _factored_einsum(specs, arrays, fac_keys, out_sub,
                                   cache)
        else:
            val = np.einsum(",".join(specs) + "->" + out_sub, *arrays,
                            optimize=True)
        total += term.coeff * mult * val
    return total


# ----------------------------------------------------------------------
# Convenience constructors
# ----------------------------------------------------------------------

def E1(name: str, p: str, q: str, coeff: float = 1.0) -> WickExpr:
    """coeff * name_pq a^+_p a_q"""
    return WickExpr([Term(coeff, ((name, (p, q)),),
                          (Op(p, True), Op(q, False)))])


def E2(name: str, p: str, q: str, r: str, s: str,
       coeff: float = 1.0) -> WickExpr:
    """coeff * name_pqrs a^+_p a^+_q a_s a_r  (antisymmetrized-integral
    convention <pq||rs>)"""
    return WickExpr([Term(coeff, ((name, (p, q, r, s)),),
                          (Op(p, True), Op(q, True),
                           Op(s, False), Op(r, False)))])


def hamiltonian(h: str = "f", v: str = "v") -> WickExpr:
    """H = sum f_pq p^+ q + 1/4 sum <pq||rs> p^+ q^+ s r (spin-orbital,
    antisymmetrized)"""
    return E1(h, "p", "q") + E2(v, "p", "q", "r", "s", 0.25)

"""Multireference Wick engine over a CAS reference.

Generalizes the Fermi-vacuum engine (`ic/wick.py`, reference
src/ic/wick.hpp) to the three-space partition used by the internally
contracted MR methods (reference pyblock2/icmr/*): the reference state is
|Phi> = |core filled> x |Psi0 active> x |virt empty>, so

  * core ops contract pairwise like holes   (<p^+ q> = delta, <p q^+> = 0),
  * virtual ops contract like particles     (<p q^+> = delta, <p^+ q> = 0),
  * active operator strings remain and are normal-ordered into expectation
    values <p1^+ ... pk^+ q1 ... qk> = spin-orbital k-RDMs of |Psi0>
    (k <= 4), the quantities DMRG provides via its NPDM engine.

Everything is numeric-per-term at evaluation: index symbols carry explicit
integer ranges (global spin-orbital index arrays), so fixed external labels
are just length-1/2 ranges and einsum does the sums.
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

CORE, ACTIVE, VIRT = "c", "a", "v"


@dataclass(frozen=True)
class MOp:
    index: str      # symbol name (range bound at evaluation)
    space: str      # CORE | ACTIVE | VIRT
    dagger: bool

    def __repr__(self):
        return f"{self.index}{'^' if self.dagger else ''}"


@dataclass
class MTerm:
    coeff: float
    tensors: Tuple[Tuple[str, Tuple[str, ...]], ...]
    ops: Tuple[MOp, ...]

    def __repr__(self):
        ts = " ".join(f"{n}[{','.join(ix)}]" for n, ix in self.tensors)
        return f"{self.coeff:+g} {ts} | {' '.join(map(repr, self.ops))}"


def conj_terms(terms: Sequence[MTerm]) -> List[MTerm]:
    """Hermitian conjugate (real tensors): reverse ops, flip daggers."""
    return [MTerm(t.coeff, t.tensors,
                  tuple(MOp(o.index, o.space, not o.dagger)
                        for o in reversed(t.ops)))
            for t in terms]


def _rename(terms: Sequence[MTerm], tag: str) -> List[MTerm]:
    """Uniquify dummy symbols by suffixing; fixed symbols (starting 'X')
    are left untouched so labels stay shared across factors."""
    out = []
    for t in terms:
        m = {}

        def r(x):
            if x not in m:
                m[x] = x + tag
            return m[x]

        out.append(MTerm(t.coeff,
                         tuple((n, tuple(r(i) for i in ix))
                               for n, ix in t.tensors),
                         tuple(MOp(r(o.index), o.space, o.dagger)
                               for o in t.ops)))
    return out


def mul_terms(*factors: Sequence[MTerm]) -> List[MTerm]:
    """Product of operator sums with dummy renaming per factor."""
    cur = [MTerm(1.0, (), ())]
    for fi, f in enumerate(factors):
        f = _rename(f, f"_{fi}")
        cur = [MTerm(t1.coeff * t2.coeff, t1.tensors + t2.tensors,
                     t1.ops + t2.ops)
               for t1 in cur for t2 in f]
    return cur


# ---------------------------------------------------------------------------
# Wick contraction
# ---------------------------------------------------------------------------

def _pair_ok(a: MOp, b: MOp) -> bool:
    """Nonzero contraction <a b> (a left of b) for core/virt spaces."""
    if a.space == CORE and b.space == CORE:
        return a.dagger and not b.dagger          # <p^+ q> = delta
    if a.space == VIRT and b.space == VIRT:
        return (not a.dagger) and b.dagger        # <p q^+> = delta
    return False


def _normal_order_active(ops: Tuple[MOp, ...]):
    """Anticommute an active string into normal order (daggers left).
    Returns [(sign, deltas, ordered_ops)]."""
    for k in range(len(ops) - 1):
        if (not ops[k].dagger) and ops[k + 1].dagger:
            swapped = ops[:k] + (ops[k + 1], ops[k]) + ops[k + 2:]
            contracted = ops[:k] + ops[k + 2:]
            out = []
            for (s, d, o) in _normal_order_active(swapped):
                out.append((-s, d, o))
            for (s, d, o) in _normal_order_active(contracted):
                out.append((s, d + ((ops[k].index, ops[k + 1].index),), o))
            return out
    return [(1, (), ops)]


def mr_expect(terms: Sequence[MTerm]) -> List[MTerm]:
    """<Phi| terms |Phi>: full Wick over core/virt + active RDM strings.

    Returns fully-contracted terms whose tensors include "delta" factors
    and a "g{k}" factor with index order (p1..pk, q1..qk) for the
    surviving active string <p1^+ ... pk^+ q1 ... qk>."""
    out: List[MTerm] = []
    for term in terms:
        ext = [i for i, o in enumerate(term.ops) if o.space != ACTIVE]
        act = [i for i, o in enumerate(term.ops) if o.space == ACTIVE]

        def contract(remaining: List[int], pairs):
            if not remaining:
                _emit(term, pairs, act, out)
                return
            a = remaining[0]
            for bi in range(1, len(remaining)):
                b = remaining[bi]
                if not _pair_ok(term.ops[a], term.ops[b]):
                    continue
                contract([r for r in remaining[1:] if r != b],
                         pairs + [(a, b)])

        contract(ext, [])
    return out


def _emit(term: MTerm, pairs, act, out: List[MTerm]) -> None:
    # sign: crossings among pairs + active ops inside each pair's span
    sign = 1
    for (a1, b1), (a2, b2) in itertools.combinations(pairs, 2):
        if a1 < a2 < b1 < b2 or a2 < a1 < b2 < b1:
            sign = -sign
    for (a, b) in pairs:
        inside = sum(1 for i in act if a < i < b)
        sign *= (-1) ** inside
    deltas = tuple(("delta", (term.ops[a].index, term.ops[b].index))
                   for (a, b) in pairs)
    # active string in original order -> normal order -> RDM
    aops = tuple(term.ops[i] for i in act)
    for (s2, adeltas, no) in _normal_order_active(aops):
        ncre = sum(1 for o in no if o.dagger)
        nann = len(no) - ncre
        if ncre != nann:
            continue
        # normal order => all daggers left
        assert all(o.dagger for o in no[:ncre])
        gt = ()
        if ncre:
            gt = (("g%d" % ncre, tuple(o.index for o in no)),)
        out.append(MTerm(term.coeff * sign * s2,
                         term.tensors + deltas
                         + tuple(("delta", d) for d in adeltas) + gt, ()))


def commutator_terms(Bterms: Sequence[MTerm],
                     Aterms: Sequence[MTerm]) -> List[MTerm]:
    """[B, A] with every B term of even operator length (Hamiltonians).

    Rank-reducing: writing A.ops + B.ops and bubbling the B block to the
    front, AB = (+1) BA + (contraction branches), so [B, A] = -(branches).
    Each branch replaces an (A-op, B-op) adjacent pair by its
    anticommutator delta — one fermion pair fewer, which is what makes
    <A^+ [H_D, A]> evaluable with k-RDMs one order lower than
    <A^+ H_D A> (the Koopmans-matrix trick of sc-NEVPT2)."""
    B = _rename(Bterms, "_cb")
    A = _rename(Aterms, "_ca")
    out: List[MTerm] = []
    for bt in B:
        assert len(bt.ops) % 2 == 0
        for at in A:
            ops = list(at.ops) + list(bt.ops)
            flags = [0] * len(at.ops) + [1] * len(bt.ops)
            stack = [(at.coeff * bt.coeff, at.tensors + bt.tensors,
                      ops, flags)]
            while stack:
                coef, tens, ops, flags = stack.pop()
                # leftmost B op with an A op directly before it
                k = next((i for i in range(1, len(ops))
                          if flags[i] == 1 and flags[i - 1] == 0), None)
                if k is None:
                    continue    # pure BA term: cancels against +BA
                y, x = ops[k - 1], ops[k]
                if y.space == x.space and y.dagger != x.dagger:
                    out.append(MTerm(
                        -coef,   # [B,A] = -(branches)
                        tens + (("delta", (y.index, x.index)),),
                        tuple(ops[:k - 1] + ops[k + 1:])))
                    # note: branch keeps remaining ops as-is (valid term)
                so = list(ops)
                sf = list(flags)
                so[k - 1], so[k] = so[k], so[k - 1]
                sf[k - 1], sf[k] = sf[k], sf[k - 1]
                stack.append((-coef, tens, so, sf))
    return out


# ---------------------------------------------------------------------------
# numeric evaluation
# ---------------------------------------------------------------------------

def evaluate(cterms: Sequence[MTerm], tensors: Dict[str, np.ndarray],
             range_of, local_names: Tuple[str, ...] = ("g1", "g2", "g3",
                                                       "g4"),
             local_offset: int = 0) -> float:
    """Evaluate fully-contracted terms.

    range_of: callable symbol -> global spin-orbital index array.
    Tensors named in `local_names` (the RDMs) are indexed by
    (global - local_offset).
    """
    total = 0.0
    for term in cterms:
        parent: Dict[str, str] = {}

        def find(x):
            while parent.get(x, x) != x:
                x = parent[x]
            return x

        facs = []
        for name, ixs in term.tensors:
            if name == "delta":
                rx, ry = find(ixs[0]), find(ixs[1])
                if rx != ry:
                    parent[rx] = ry
            else:
                facs.append((name, ixs))
        # effective range per class
        cls_range: Dict[str, np.ndarray] = {}
        dead = False
        syms = set()
        for name, ixs in term.tensors:
            syms.update(ixs)
        for x in syms:
            r = find(x)
            rng = range_of(x)
            cur = cls_range.get(r)
            cls_range[r] = rng if cur is None else \
                np.intersect1d(cur, rng)
        for r, rng in cls_range.items():
            if len(rng) == 0:
                dead = True
        if dead:
            continue
        if not facs:
            val = 1.0
            for r, rng in cls_range.items():
                val *= len(rng)
            total += term.coeff * val
            continue
        letters: Dict[str, str] = {}
        alphabet = iter("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUV")
        specs = []
        arrays = []
        for name, ixs in facs:
            sub = ""
            slicers = []
            for x in ixs:
                r = find(x)
                if r not in letters:
                    letters[r] = next(alphabet)
                sub += letters[r]
                rng = cls_range[r]
                slicers.append(rng - local_offset
                               if name in local_names else rng)
            specs.append(sub)
            arrays.append(tensors[name][np.ix_(*slicers)])
        val = np.einsum(",".join(specs) + "->", *arrays, optimize=True)
        total += term.coeff * float(val)
    return total


def evaluate_labels(cterms: Sequence[MTerm],
                    tensors: Dict[str, np.ndarray],
                    base_range_of, lab_of: Dict[str, np.ndarray],
                    masks: Dict[str, np.ndarray],
                    local_names: Tuple[str, ...] = ("G1", "G2", "G3",
                                                    "G4"),
                    local_offset: int = 0,
                    chunk: int = 2048) -> np.ndarray:
    """Batched evaluation over perturber LABELS (the sc-NEVPT2 per-
    (core, virt)-label class expressions; reference
    pyblock2/icmr/scnevpt2.py evaluates whole classes as einsums).

    Label symbols ``XC{k}_*`` / ``XV{k}_*`` bind per label to the k-th
    distinct core/virt orbital: ``lab_of['XC0']`` is an int array [nl]
    of GLOBAL indices.  Complement symbols ``O*``/``W*`` range over the
    FULL core/virt space with a per-label 0/1 mask factor
    (``masks['O']`` [nl, ncore-range]), which reproduces the
    per-label complement sums exactly.  ``base_range_of`` supplies the
    full-space range for every non-label symbol.  Returns the term sum
    as an array over labels [nl].

    One einsum per (term, label-chunk) replaces nl independent
    ``evaluate`` calls — the label axis 'Z' is carried through the
    contraction (diagonal over all label-bound slots)."""
    heads = set(lab_of)
    nl = len(next(iter(lab_of.values()))) if lab_of else 1
    total = np.zeros(nl)

    def head_of(sym: str):
        h = sym.split("_")[0]
        return h if h in heads else None

    for term in cterms:
        parent: Dict[str, str] = {}

        def find(x):
            while parent.get(x, x) != x:
                x = parent[x]
            return x

        facs = []
        for name, ixs in term.tensors:
            if name == "delta":
                rx, ry = find(ixs[0]), find(ixs[1])
                if rx != ry:
                    parent[rx] = ry
            else:
                facs.append((name, ixs))
        syms = set()
        for name, ixs in term.tensors:
            syms.update(ixs)
        # classify classes
        cls_head: Dict[str, str] = {}
        cls_range: Dict[str, np.ndarray] = {}
        cls_mask: Dict[str, str] = {}
        dead = False
        for x in sorted(syms):
            r = find(x)
            h = head_of(x)
            if h is not None:
                prev = cls_head.get(r)
                if prev is not None and prev != h:
                    dead = True      # two distinct label orbitals
                    break
                cls_head[r] = h
                continue
            rng = base_range_of(x)
            cur = cls_range.get(r)
            cls_range[r] = rng if cur is None else \
                np.intersect1d(cur, rng)
            if x[0] in masks:
                cls_mask[r] = x[0]
        if not dead:
            for r, h in cls_head.items():
                if r in cls_mask:
                    dead = True      # label forced into its complement
                    break
                rng = cls_range.get(r)
                if rng is not None:
                    # non-label members restrict the class; the label
                    # space must survive the restriction
                    space = base_range_of("C" if h[1] == "C" else "V")
                    if len(np.intersect1d(rng, space)) != len(space):
                        dead = True
                        break
            for r, rng in cls_range.items():
                if r not in cls_head and len(rng) == 0:
                    dead = True
        if dead:
            continue

        # pre-slice non-label axes ONCE; per-chunk work is only the
        # label gathers + the einsum
        letters: Dict[str, str] = {}
        alphabet = iter(
            "abcdefghijklmnopqrstuvwxyABCDEFGHIJKLMNOPQRSTUV")
        pre = []   # (base array, [(axis, head)], sub)
        for name, ixs in facs:
            a = tensors[name]
            labaxes = []
            sub = ""
            for j, x in enumerate(ixs):
                r = find(x)
                if r in cls_head:
                    assert name not in local_names
                    labaxes.append((j, cls_head[r]))
                    sub += "z"
                    continue
                rng = cls_range[r]
                a = np.take(a, rng - local_offset
                            if name in local_names else rng, axis=j)
                if r not in letters:
                    letters[r] = next(alphabet)
                sub += letters[r]
            pre.append((a, labaxes, sub))
        msk = []   # (mask array full, positions, letter)
        for r, mk in cls_mask.items():
            if r not in letters:
                letters[r] = next(alphabet)
            space = base_range_of(mk)
            posm = np.searchsorted(space, cls_range[r])
            msk.append((masks[mk], posm, letters[r]))
        coeff = term.coeff
        touched = set()
        for _a, _la, sub in pre:
            touched.update(sub)
        for _m, _p, le in msk:
            touched.add(le)
        for r, rng in cls_range.items():
            if r in cls_head:
                continue
            le = letters.get(r)
            if le is None or le not in touched:
                coeff *= len(rng)
        if not pre and not msk:
            total += coeff
            continue
        if not any("z" in sub for _a, la, sub in pre) and not msk:
            val = np.einsum(
                ",".join(sub for _a, _la, sub in pre) + "->",
                *[a for a, _la, _s in pre], optimize=True)
            total += coeff * float(val)
            continue
        specs = ([sub for _a, _la, sub in pre]
                 + ["z" + le for _m, _p, le in msk])
        path_spec = ",".join(specs) + "->z"
        for l0 in range(0, nl, chunk):
            sl = slice(l0, l0 + chunk)
            arrays = []
            for a, labaxes, _sub in pre:
                for j, h in labaxes:
                    a = np.take(a, lab_of[h][sl], axis=j)
                arrays.append(a)
            for M, posm, _le in msk:
                arrays.append(M[sl][:, posm])
            val = np.einsum(path_spec, *arrays, optimize=True)
            total[sl] += coeff * val
    return total


def evaluate_tensor(cterms: Sequence[MTerm], tensors: Dict[str, np.ndarray],
                    range_of, free: Sequence[str],
                    local_names: Tuple[str, ...] = ("g1", "g2", "g3", "g4"),
                    local_offset: int = 0) -> np.ndarray:
    """Like `evaluate` but with FREE index symbols: returns an ndarray
    over the free symbols' ranges (used for internally-contracted matrix
    elements where active labels stay open)."""
    free = list(free)
    shape = tuple(len(range_of(x)) for x in free)
    total = np.zeros(shape)
    for term in cterms:
        parent: Dict[str, str] = {}

        def find(x):
            while parent.get(x, x) != x:
                x = parent[x]
            return x

        facs = []
        for name, ixs in term.tensors:
            if name == "delta":
                rx, ry = find(ixs[0]), find(ixs[1])
                if rx != ry:
                    # never merge two free symbols away: keep both as a
                    # numeric delta factor instead
                    if rx in free and ry in free:
                        facs.append(("__eye__", (rx, ry)))
                        continue
                    if rx in free:
                        rx, ry = ry, rx
                    parent[rx] = ry
            else:
                facs.append((name, ixs))
        syms = set(free)
        for name, ixs in term.tensors:
            syms.update(ixs)
        cls_range: Dict[str, np.ndarray] = {}
        dead = False
        for x in syms:
            r = find(x)
            rng = range_of(x)
            cur = cls_range.get(r)
            cls_range[r] = rng if cur is None else np.intersect1d(cur, rng)
        for r, rng in cls_range.items():
            if len(rng) == 0:
                dead = True
        if dead:
            continue
        letters: Dict[str, str] = {}
        alphabet = iter("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUV")
        out_sub = ""
        for x in free:
            r = find(x)
            if r not in letters:
                letters[r] = next(alphabet)
            out_sub += letters[r]
        specs = []
        arrays = []
        for name, ixs in facs:
            sub = ""
            slicers = []
            for x in ixs:
                r = find(x)
                if r not in letters:
                    letters[r] = next(alphabet)
                sub += letters[r]
                rng = cls_range[r]
                slicers.append(rng - local_offset
                               if name in local_names else rng)
            specs.append(sub)
            if name == "__eye__":
                n1, n2 = len(cls_range[find(ixs[0])]), \
                    len(cls_range[find(ixs[1])])
                arrays.append(np.eye(max(n1, n2))[:n1, :n2])
            else:
                arrays.append(tensors[name][np.ix_(*slicers)])
        # free symbols whose class representative range shrank: broadcast
        val = np.einsum(",".join(specs) + "->" + out_sub, *arrays,
                        optimize=True) if facs else \
            term.coeff * np.ones(shape)
        if facs:
            # align val into the full free-shape (ranges of free symbols
            # are the declared ones when unconstrained; constrained
            # classes shrink — scatter into the right slots)
            slot = []
            full = True
            for x in free:
                r = find(x)
                rng = cls_range[r]
                base = range_of(x)
                if len(rng) == len(base) and np.array_equal(rng, base):
                    slot.append(slice(None))
                else:
                    pos = np.searchsorted(base, rng)
                    slot.append(pos)
                    full = False
            if full:
                total += term.coeff * val
            else:
                # scatter-add on the constrained subgrid
                ix = np.ix_(*[s if isinstance(s, np.ndarray)
                              else np.arange(shape[i])
                              for i, s in enumerate(slot)])
                total[ix] += term.coeff * val
        else:
            total += val
    return total


# ---------------------------------------------------------------------------
# Hamiltonian splitting over spaces
# ---------------------------------------------------------------------------

def split_hamiltonian(h_name: str = "h", v_name: str = "v",
                      spaces: Sequence[str] = (CORE, ACTIVE, VIRT)
                      ) -> List[MTerm]:
    """H = sum h_PQ P^+ Q + 1/4 sum <PQ||RS> P^+ Q^+ S R, with every index
    slot assigned a definite space (3^2 + 3^4 terms)."""
    out: List[MTerm] = []
    for sp, sq in itertools.product(spaces, repeat=2):
        out.append(MTerm(1.0, ((h_name, ("p", "q")),),
                         (MOp("p", sp, True), MOp("q", sq, False))))
    for sp, sq, sr, ss in itertools.product(spaces, repeat=4):
        out.append(MTerm(0.25, ((v_name, ("p", "q", "r", "s")),),
                         (MOp("p", sp, True), MOp("q", sq, True),
                          MOp("s", ss, False), MOp("r", sr, False))))
    return out


def spin_orbital_integrals(h1e: np.ndarray, g2e: np.ndarray
                           ) -> Tuple[np.ndarray, np.ndarray]:
    """(h_so, <PQ||RS>) in the interleaved spin-orbital basis
    (0a, 0b, 1a, 1b, ...) from spatial h1e and chemist (pq|rs)."""
    n = h1e.shape[0]
    h_so = np.kron(h1e, np.eye(2))
    # physicist <PQ|RS> = (pr|qs) delta_{s(P)s(R)} delta_{s(Q)s(S)}
    eye2 = np.eye(2)
    v_phys = np.einsum("pqrs,ik,jl->piqjrksl", g2e.transpose(0, 2, 1, 3),
                       eye2, eye2).reshape(2 * n, 2 * n, 2 * n, 2 * n)
    v_as = v_phys - v_phys.transpose(0, 1, 3, 2)
    return h_so, v_as

"""Machine-generated closed-shell (spatial) CCSD equations.

The spin-orbital CCSD residuals R1 = <Phi_i^a| e^{-T} H e^{T} |Phi> and
R2 = <Phi_ij^ab| e^{-T} H e^{T} |Phi> are generated symbolically by the
Wick engine (cc/wick_cc._gen_expr, the WickCC route; reference
src/ic/wick.hpp generates the same equations for pyblock2/cc) and then
SPIN-SUMMED term by term into spatial contractions:

  * every antisymmetrized integral v[p,q,r,s] = <pq||rs> expands into
    two plain spatial pieces with fixed spin-delta links,
        <pq||rs> = d(sp,sr) d(sq,ss) V[pqrs] - d(sp,ss) d(sq,sr) V[pqsr]
  * the antisymmetrized t2[a,b,i,j] expands identically over the
    mixed-spin spatial amplitude T[a,b,i,j] (T[abij] = T[baji]),
        t2 = d(sa,si) d(sb,sj) T[abij] - d(sa,sj) d(sb,si) T[abji]
  * f, t1 and the Wick contraction deltas are spin diagonal.

Fixing the output spins (alpha for R1; alpha,beta,alpha,beta for the
mixed R2 block) and summing free spin chains (factor 2 each) leaves a
flat list of SPATIAL einsum terms — the UGA-factorized closed-shell
equations (reference pyblock2/cc/rccsd.py is the hand-derived
counterpart), at o^2 v^4 spatial cost instead of the (2o)^2 (2v)^4
spin-orbital cost.

Validation: the residuals vanish at GCCSD's converged amplitudes and
the converged RCCSD energy equals GCCSD for closed-shell references
(tests/test_rccsd_spatial.py).
"""

from __future__ import annotations

import itertools
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..core.fcidump import FCIDUMP
from ..ic.wick import OCC, VIR, space_of

# ---------------------------------------------------------------------------
# BCH-commutator generation of the projected similarity-transformed H
# ---------------------------------------------------------------------------


def _bch_projected(proj_ops):
    """<proj| e^{-T} H e^{T} |Phi> via the (terminating) nested-
    commutator Baker-Campbell-Hausdorff series
        Hbar = H + [H,T] + 1/2![[H,T],T] + ... (exact at 4 nestings for
    a two-body H) — linked by construction, then fully Wick-contracted
    over the Fermi vacuum (reference wick.hpp WickExpr; the CC
    amplitude equations every CC code implements)."""
    from math import factorial

    from ..ic.wick import Term, WickExpr, vacuum_expectation
    from .wick_cc import _ham, _t1, _t2

    def T(tag):
        return _t1(f"1{tag}") + _t2(f"2{tag}")

    total = _ham()
    cur = _ham()
    for k in range(1, 5):
        tk = T(f"c{k}")
        cur = cur * tk + (tk * cur) * (-1.0)
        total = total + cur * (1.0 / factorial(k))
    if proj_ops:
        total = WickExpr([Term(1.0, (), tuple(proj_ops))]) * total
    return vacuum_expectation(total)


# ---------------------------------------------------------------------------
# symbolic spin summation
# ---------------------------------------------------------------------------

# spatial term: (coeff, [(tensor_name, idx_tuple), ...]) with idx labels
# resolved into union-find class representatives


class _UF:
    def __init__(self):
        self.p: Dict[str, str] = {}

    def find(self, x: str) -> str:
        while self.p.get(x, x) != x:
            x = self.p[x]
        return x

    def union(self, a: str, b: str) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.p[ra] = rb


def _expand_factors(term) -> List[Tuple[float, list, list]]:
    """Expand a contracted Wick term's tensors into alternatives:
    returns [(sign, spatial_factors, spin_links)] where spatial_factors
    = [(name, idx_tuple)] over plain spatial tensors {F, V, T1, T2} and
    spin_links = [(i1, i2)] spin-equality constraints.  Deltas become
    'EQ_O'/'EQ_V' pseudo-factors identifying spatial indices."""
    branches = [(term.coeff, [], [])]
    for name, ixs in term.tensors:
        if name == "f":
            p, q = ixs
            alts = [(1.0, [("F", (p, q))], [(p, q)])]
        elif name == "v":
            p, q, r, s = ixs
            alts = [(1.0, [("V", (p, q, r, s))], [(p, r), (q, s)]),
                    (-1.0, [("V", (p, q, s, r))], [(p, s), (q, r)])]
        elif name == "t1":
            a, i = ixs
            alts = [(1.0, [("T1", (a, i))], [(a, i)])]
        elif name == "t2":
            a, b, i, j = ixs
            alts = [(1.0, [("T2", (a, b, i, j))], [(a, i), (b, j)]),
                    (-1.0, [("T2", (a, b, j, i))], [(a, j), (b, i)])]
        elif name == "t3":
            # antisymmetrized triples over the spatial mixed amplitude:
            # t3 = sum_{sigma in S3} sgn(sigma) prod delta(s_a, s_i')
            #      T3[a,b,c, sigma(i,j,k)]  (rccsdt.py)
            a, b, c3, i, j, k = ixs
            alts = []
            for perm, sgn in (((i, j, k), 1.0), ((i, k, j), -1.0),
                              ((j, i, k), -1.0), ((j, k, i), 1.0),
                              ((k, i, j), 1.0), ((k, j, i), -1.0)):
                p1, p2, p3 = perm
                alts.append((sgn, [("T3", (a, b, c3, p1, p2, p3))],
                             [(a, p1), (b, p2), (c3, p3)]))
        elif name == "r1":
            a, i = ixs
            alts = [(1.0, [("R1", (a, i))], [(a, i)])]
        elif name == "r2":
            a, b, i, j = ixs
            alts = [(1.0, [("R2", (a, b, i, j))], [(a, i), (b, j)]),
                    (-1.0, [("R2", (a, b, j, i))], [(a, j), (b, i)])]
        elif name in ("delta_o", "delta_v", "delta"):
            x, y = ixs
            kind = "EQ_O" if name == "delta_o" else "EQ_V"
            alts = [(1.0, [(kind, (x, y))], [(x, y)])]
        elif name in ("l1", "l2"):
            raise NotImplementedError("lambda spatialization")
        else:
            raise KeyError(name)
        branches = [(c * ca, fs + fa, ls + la)
                    for (c, fs, ls) in branches
                    for (ca, fa, la) in alts]
    return branches


def spin_sum(expr, ext: Sequence[str], ext_spins: Sequence[int],
             pair_links: Optional[Sequence[Tuple[str, str]]] = None
             ) -> List[Tuple[float, List[Tuple[str, Tuple[str, ...]]],
                             List[str]]]:
    """Spin-sum a Wick expression with external indices `ext` carrying
    fixed spins `ext_spins` (0 = alpha, 1 = beta).  Returns merged
    spatial terms (coeff, factors, ext_labels) where factors reference
    spatial index classes and ext_labels are the class representatives
    of the external indices.

    pair_links: spin-FREE projection mode (the UGA E1-product
    projection, reference rccsdt.py ex1/ex2/ex3): instead of fixing
    external spins, each (occ, vir) projection pair is spin-linked and
    its common spin SUMMED like any internal chain — the determinant-
    block projection is replaced by <0| prod E_{i a} ... Hbar |0>.
    ext_spins is ignored in this mode."""
    spin_of_ext = dict(zip(ext, ext_spins)) if pair_links is None else {}
    out: Dict[Tuple, float] = {}
    order: Dict[Tuple, Tuple] = {}
    for term in expr.terms:
        for coeff, facs, links in _expand_factors(term):
            # ---- spin chains
            uf = _UF()
            for (x, y) in links:
                uf.union(x, y)
            if pair_links is not None:
                for (x, y) in pair_links:
                    uf.union(x, y)
            fixed: Dict[str, int] = {}
            dead = False
            for e, sp in spin_of_ext.items():
                r = uf.find(e)
                if r in fixed and fixed[r] != sp:
                    dead = True
                    break
                fixed[r] = sp
            if dead:
                continue
            all_idx = set()
            for _n, ixs in facs:
                all_idx.update(ixs)
            classes = {uf.find(x) for x in all_idx}
            n_free = sum(1 for c in classes if c not in fixed)
            coeff *= 2.0 ** n_free
            # ---- spatial index identification (contraction deltas)
            sf = _UF()
            cls_forced: Dict[str, str] = {}
            for name, ixs in facs:
                if name in ("EQ_O", "EQ_V"):
                    sf.union(ixs[0], ixs[1])
            # effective space of each spatial class: any non-general
            # member (H's general indices are always delta-linked into a
            # definite space by the vacuum contraction)
            for name, ixs in facs:
                forced = {"EQ_O": "o", "EQ_V": "v"}.get(name)
                for x in ixs:
                    sp = space_of(x)
                    tag = forced or ("o" if sp == OCC
                                     else ("v" if sp == VIR else None))
                    if tag is None:
                        continue
                    r = sf.find(x)
                    if cls_forced.get(r, tag) != tag:
                        dead = True
                    cls_forced[r] = tag
            if dead:
                continue
            spat = [(n, tuple(sf.find(x) for x in ixs))
                    for (n, ixs) in facs if n not in ("EQ_O", "EQ_V")]
            ext_cls = [sf.find(e) for e in ext]
            # canonical key: rename classes in order of appearance
            rename: Dict[str, str] = {}

            def nm(x: str) -> str:
                if x not in rename:
                    tag = cls_forced.get(x)
                    if tag is None:
                        sp = space_of(x)
                        tag = "o" if sp == OCC else \
                            ("v" if sp == VIR else "g")
                    rename[x] = f"{tag}{len(rename)}"
                return rename[x]

            for e in ext_cls:
                nm(e)
            spat_n = tuple(sorted(
                (n, tuple(ixs)) for (n, ixs) in
                [(n, tuple(nm(x) for x in ixs)) for (n, ixs) in spat]))
            ext_n = tuple(nm(e) for e in ext_cls)
            key = (spat_n, ext_n)
            out[key] = out.get(key, 0.0) + coeff
            order.setdefault(key, key)
    terms = []
    for (spat_n, ext_n), c in out.items():
        if abs(c) < 1e-12:
            continue
        terms.append((c, [(n, ixs) for (n, ixs) in spat_n], list(ext_n)))
    return terms


# ---------------------------------------------------------------------------
# numeric evaluation of spatial term lists
# ---------------------------------------------------------------------------


def _einsum_spec(factors, ext_labels):
    """(subscript string, factor names) for np.einsum, assigning one
    letter per index class; indices appearing in no factor but external
    (pure delta outputs) get explicit identity factors."""
    letters = {}

    def lt(x):
        if x not in letters:
            letters[x] = "abcdefghijklmnopqrstuvwxyz"[len(letters)]
        return letters[x]

    subs = []
    names = []
    seen = set()
    for n, ixs in factors:
        subs.append("".join(lt(x) for x in ixs))
        names.append((n, ixs))
        seen.update(ixs)
    extra = []
    for x in ext_labels:
        if x not in seen:
            extra.append(x)
    out = "".join(lt(x) for x in ext_labels)
    return ",".join(subs), out, names, extra


_TERMS = None


class SpatialCCSD:
    """Closed-shell CCSD from machine spin-summed equations."""

    def __init__(self, fd: FCIDUMP, max_iter: int = 200,
                 tol: float = 1e-10):
        assert not fd.uhf and fd.n_elec % 2 == 0
        self.fd = fd
        n = fd.n_sites
        no = fd.n_elec // 2
        self.no, self.nv = no, n - no
        occ = np.arange(no)
        # spatial fock (denominators only): h + sum_i (2 (pq|ii) - (pi|iq))
        g = fd.g2e
        f = (fd.h1e + 2.0 * np.einsum("pqii->pq", g[:, :, occ][..., occ])
             - np.einsum("piiq->pq", g[:, occ][:, :, occ]))
        self.f = f
        # the generated equations' one-body tensor is the BARE h (the
        # Hamiltonian is h[pq] p^q + 1/4 <pq||rs> p^q^ s r, not the
        # normal-ordered Fock form) — validated against a dense
        # Fock-space e^{-T} H e^{T} referee
        self.h_one = fd.h1e
        # physicist plain integrals <pq|rs> = (pr|qs)
        self.v = g.transpose(0, 2, 1, 3)
        self.e_hf = float(2.0 * np.sum(np.diag(fd.h1e)[occ])
                          + 2.0 * np.einsum("iijj->", g[np.ix_(occ, occ,
                                                               occ, occ)])
                          - np.einsum("ijji->", g[np.ix_(occ, occ,
                                                         occ, occ)])
                          + fd.const_e)
        self.max_iter = max_iter
        self.tol = tol
        self._slice_cache: Dict = {}
        self._gen()

    def _gen(self):
        # the generated term lists are system-independent: derive once
        # per process
        global _TERMS
        if _TERMS is None:
            e0 = _bch_projected(())
            from .wick_cc import _deex_ops
            r1 = _bch_projected(_deex_ops(("i0", "a0")))
            r2 = _bch_projected(_deex_ops(("i0", "a0", "j0", "b0")))
            _TERMS = (
                spin_sum(e0, (), ()),
                spin_sum(r1, ("i0", "a0"), (0, 0)),
                # mixed-spin block: this IS the closed-shell amplitude T
                spin_sum(r2, ("i0", "a0", "j0", "b0"), (0, 0, 1, 1)))
        self.e_terms, self.r1_terms, self.r2_terms = _TERMS

    # -- tensor lookup -------------------------------------------------
    def _slice(self, name, ixs, t1, t2):
        no = self.no
        # renamed class labels carry their space as the first character
        sl = {"o": np.arange(no), "v": np.arange(no, no + self.nv)}
        if name in ("F", "V"):
            key = (name, tuple(x[0] for x in ixs))
            cached = self._slice_cache.get(key)
            if cached is not None:
                return cached
            src = self.h_one if name == "F" else self.v
            val = src[np.ix_(*(sl[x[0]] for x in ixs))]
            self._slice_cache[key] = val
            return val
        if name == "T1":
            return t1.T          # stored t1[i,a]; wick order (a, i)
        if name == "T2":
            return t2.transpose(2, 3, 0, 1)   # stored [i,j,a,b] -> (a,b,i,j)
        raise KeyError(name)

    def _eval_terms(self, terms, t1, t2, out_shape):
        no, nv = self.no, self.nv
        dim = {"o": no, "v": nv}
        acc = np.zeros(out_shape)
        for c, factors, ext in terms:
            seen = set()
            for _n, ixs in factors:
                seen.update(ixs)
            # external classes never touched by a factor (disconnected
            # delta outputs) get explicit all-ones factors
            fac2 = list(factors) + [("ONE", (x,)) for x in ext
                                    if x not in seen]
            spec_in, spec_out, names, _ = _einsum_spec(fac2, ext)
            arrs = [np.ones(dim[ixs[0][0]]) if n == "ONE"
                    else self._slice(n, ixs, t1, t2)
                    for (n, ixs) in names]
            val = np.einsum(spec_in + "->" + spec_out, *arrs,
                            optimize=True)
            acc += c * val
        return acc

    def kernel(self, return_amplitudes: bool = False):
        no, nv = self.no, self.nv
        eps = np.diag(self.f)
        d1 = eps[:no, None] - eps[None, no:]
        d2 = (eps[:no, None, None, None] + eps[None, :no, None, None]
              - eps[None, None, no:, None] - eps[None, None, None, no:])
        d1 = np.where(np.abs(d1) < 1e-10, -1.0, d1)
        d2 = np.where(np.abs(d2) < 1e-10, -1.0, d2)
        t1 = self.f[:no, no:] / d1
        t2 = self.v[:no, :no, no:, no:] / d2
        # reference offset: <Phi| H |Phi> electronic part of the energy
        # functional (the e_terms include it)
        self._e_ref_terms = float(self._eval_terms(
            self.e_terms, 0 * t1, 0 * t2, ()))
        e_last = None
        diis_t: list = []
        diis_r: list = []
        for it in range(self.max_iter):
            r1 = self._eval_terms(self.r1_terms, t1, t2, (no, nv))
            r2m = self._eval_terms(self.r2_terms, t1, t2,
                                   (no, nv, no, nv))
            # mixed block residual indices came out (i, a, j, b)
            r2 = r2m.transpose(0, 2, 1, 3)
            t1n = t1 + r1 / d1
            t2n = t2 + r2 / d2
            # pair symmetry of the closed-shell amplitude
            t2n = 0.5 * (t2n + t2n.transpose(1, 0, 3, 2))
            tv = np.concatenate([t1n.ravel(), t2n.ravel()])
            rv = tv - np.concatenate([t1.ravel(), t2.ravel()])
            diis_t.append(tv)
            diis_r.append(rv)
            if len(diis_t) > 8:
                diis_t.pop(0)
                diis_r.pop(0)
            if len(diis_t) >= 2:
                nd = len(diis_r)
                B = np.empty((nd + 1, nd + 1))
                B[-1, :] = B[:, -1] = -1.0
                B[-1, -1] = 0.0
                for a in range(nd):
                    for b in range(nd):
                        B[a, b] = float(np.dot(diis_r[a], diis_r[b]))
                rhs = np.zeros(nd + 1)
                rhs[-1] = -1.0
                try:
                    cv = np.linalg.solve(B + 1e-12 * np.eye(nd + 1),
                                         rhs)[:nd]
                    tv = sum(c * td for c, td in zip(cv, diis_t))
                except np.linalg.LinAlgError:
                    pass
            t1 = tv[:t1n.size].reshape(t1n.shape)
            t2 = tv[t1n.size:].reshape(t2n.shape)
            e = float(self._eval_terms(self.e_terms, t1, t2, ())
                      - self._e_ref_terms)
            if e_last is not None and abs(e - e_last) < self.tol:
                e_last = e
                break
            e_last = e
        if return_amplitudes:
            return self.e_hf, float(e_last), t1, t2
        return self.e_hf, float(e_last)


def rccsd_spatial(fd: FCIDUMP, max_iter: int = 200, tol: float = 1e-10,
                  return_amplitudes: bool = False):
    """Closed-shell CCSD over spatial orbitals via the machine
    spin-summed equations (the UGA-factorized analog of reference
    pyblock2/cc/rccsd.py)."""
    return SpatialCCSD(fd, max_iter=max_iter,
                       tol=tol).kernel(return_amplitudes)

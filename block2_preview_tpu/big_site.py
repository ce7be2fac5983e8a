"""Big-site framework: many orbitals fused into one DMRG site.

TPU-native counterpart of the reference big-site machinery (reference
src/big_site/big_site.hpp:38 BigSite, sci_fock_big_site.hpp:113
SCIFockBigSite): a group of (typically external/virtual) orbitals is
treated as a single site whose basis is a restricted determinant (Fock)
space — e.g. at most two electrons among the externals for uncontracted
MRCISD.  Because the site bases carry degenerate quanta with
multiplicities, the whole sweep stack (term tables, bipartite MPO, fused
effective Hamiltonians) works unchanged; this module only builds the
site spec and remaps orbital-level raw terms onto grouped sites.

Conventions: the big-site basis is the Kronecker product of the member
SZ sites in orbital order; the elementary operator for member u carries
the internal Jordan-Wigner string over members < u (matching term_row's
global convention where strings act on lower orbitals); the site parity
is the full (-1)^N.  Restriction to a particle-number window is exact
for normal-ordered strings (creations left of annihilations), whose
intermediates never leave the window.
"""

from __future__ import annotations

from itertools import product as iproduct
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .core.symmetry import QN, SZ_GROUP, SymmetryGroup
from .ops.local_ops import (CRE_A, ELEM_MATS, IDENT, PARITY, SZ_SITE,
                            SiteBasisSpec)


def fock_site_spec(member_pgs: Sequence[int],
                   group: SymmetryGroup = SZ_GROUP,
                   max_n: Optional[int] = None,
                   min_n: int = 0,
                   name: str = "fock",
                   sparse: Optional[bool] = None) -> SiteBasisSpec:
    """SiteBasisSpec for a determinant big site over len(member_pgs)
    spatial orbitals, optionally restricted to min_n <= N_site <= max_n.

    Elementary operator ids: 4 * member_index + {CRE_A, DES_A, CRE_B,
    DES_B}.  quanta(pg) ignores its argument (member pgs are baked in).

    Composite site operators are built EXACTLY by walking occupancy
    states (`compose` hook consumed by core/expr.term_row) — products of
    the window-projected elementary matrices would clip intermediate
    states outside [min_n, max_n] (reference csf_big_site.hpp constructs
    composites before restricting).
    """
    k = len(member_pgs)
    cap = 2 * k if max_n is None else max_n
    n_of_p = [q[group.fermion_index] for q in SZ_SITE.quanta(0)]
    par_p = np.diag(PARITY)
    # enumerate the windowed product states directly (site-major order,
    # identical to a kron-then-slice layout) -- never build a 4^k
    # intermediate, so MRCI external spaces with many members stay
    # cheap: dim = windowed combinatorics, not 4^k
    states: List[Tuple[int, ...]] = []
    if 4 ** k <= 1 << 20:
        for occ in iproduct(range(4), repeat=k):
            if min_n <= sum(n_of_p[p] for p in occ) <= cap:
                states.append(occ)
    elif cap <= 2 * k - min_n:
        # particle-side enumeration is the cheaper of the two windows:
        # choose the occupied members (the full 4^k scan is the
        # bottleneck long before the output dim is)
        from itertools import combinations
        cand: List[Tuple[int, ...]] = []
        for m in range(0, min(k, cap) + 1):
            for pos in combinations(range(k), m):
                for codes in iproduct((1, 2, 3), repeat=m):
                    n = sum(n_of_p[c] for c in codes)
                    if min_n <= n <= cap:
                        occ = [0] * k
                        for i, c in zip(pos, codes):
                            occ[i] = c
                        cand.append(tuple(occ))
        states = sorted(cand)
    else:
        # hole-side window (nearly full site, e.g. the occupied big
        # site of single-reference CI with <= order holes): choose the
        # members NOT doubly occupied (deficit 2 for empty, 1 for
        # singly occupied)
        from itertools import combinations
        max_def = 2 * k - min_n
        cand = []
        for m in range(0, min(k, max_def) + 1):
            for pos in combinations(range(k), m):
                for codes in iproduct((0, 1, 2), repeat=m):
                    n = 2 * (k - m) + sum(n_of_p[c] for c in codes)
                    if min_n <= n <= cap:
                        occ = [3] * k
                        for i, c in zip(pos, codes):
                            occ[i] = c
                        cand.append(tuple(occ))
        states = sorted(cand)
    quanta_list: List[QN] = []
    for occ in states:
        q = group.zero
        for u, p in enumerate(occ):
            q = group.add(q, SZ_SITE.quanta(int(member_pgs[u]))[p])
        quanta_list.append(q)
    index = {occ: i for i, occ in enumerate(states)}
    dim = len(states)

    # elementary-operator columns: code -> (new_code, amplitude) or None
    elem_col = {}
    for e, m4 in ELEM_MATS.items():
        cols = []
        for c in range(4):
            nz = np.nonzero(m4[:, c])[0]
            cols.append((int(nz[0]), float(m4[nz[0], c])) if len(nz)
                        else None)
        elem_col[e] = cols

    # operators above CSR_SITE_DIM are stored CSR: each occupancy walk
    # touches at most one row per column, so composites/elementaries
    # carry <= dim nonzeros in a dim x dim matrix (reference keeps
    # big-site operators as CSRSparseMatrix, src/big_site/big_site.hpp +
    # src/core/csr_sparse_matrix.hpp)
    from .ops.csr import (CSR_SITE_DIM, csr_from_triplets, sparse_diag,
                          sparse_identity)
    use_csr = dim >= CSR_SITE_DIM if sparse is None else sparse

    def _compose(here: Tuple[int, ...], z: bool) -> np.ndarray:
        """Exact composite of elementary ops `here` (term order; the
        rightmost acts first) x optional trailing JW Z, on the windowed
        basis — intermediates walk freely outside the window."""
        rows, cols, vals = [], [], []
        for j, occ0 in enumerate(states):
            amp = 1.0
            if z:
                for p in occ0:
                    amp *= par_p[p]
            occ = list(occ0)
            ok = True
            for oid in reversed(here):
                u, e = divmod(int(oid), 4)
                step = elem_col[e][occ[u]]
                if step is None:
                    ok = False
                    break
                new_p, a = step
                # JW sign over members < u at application time
                for p in occ[:u]:
                    a *= par_p[p]
                occ[u] = new_p
                amp *= a
            if not ok:
                continue
            i = index.get(tuple(occ))
            if i is not None:
                rows.append(i)
                cols.append(j)
                vals.append(amp)
        if use_csr:
            return csr_from_triplets(rows, cols, vals, (dim, dim))
        m = np.zeros((dim, dim))
        np.add.at(m, (np.asarray(rows, dtype=np.int64),
                      np.asarray(cols, dtype=np.int64)),
                  np.asarray(vals))
        return m

    elem: Dict[int, np.ndarray] = {}
    for u in range(k):
        for e in ELEM_MATS:
            elem[4 * u + e] = _compose((4 * u + e,), False)
    par_diag = np.array([np.prod([par_p[p] for p in occ])
                         for occ in states])
    if use_csr:
        ident = sparse_identity(dim)
        parity = sparse_diag(par_diag)
    else:
        ident = np.eye(dim)
        parity = np.diag(par_diag)
    return SiteBasisSpec(name, dim, elem, ident, parity,
                         lambda pg: list(quanta_list), fermionic=True,
                         compose=_compose)


def regroup_raw_terms(raw_terms, groups: Sequence[Sequence[int]]):
    """Remap orbital-level raw terms [(coeff, [(orb, elem), ...])] onto
    grouped sites: orb -> (site, 4 * member_index + elem).  Singleton
    groups keep plain elem ids (normal SZ sites)."""
    site_of: Dict[int, Tuple[int, int]] = {}
    for s, orbs in enumerate(groups):
        for u, o in enumerate(orbs):
            site_of[o] = (s, u)
    single = {s: len(orbs) == 1 for s, orbs in enumerate(groups)}
    out = []
    for coeff, ops in raw_terms:
        new_ops = []
        for (o, e) in ops:
            s, u = site_of[o]
            new_ops.append((s, e if single[s] else 4 * u + e))
        out.append((coeff, new_ops))
    return out


def grouped_site_specs(groups: Sequence[Sequence[int]],
                       orb_sym: Sequence[int],
                       group: SymmetryGroup = SZ_GROUP,
                       caps: Optional[Dict[int, Tuple[int, int]]] = None
                       ) -> List[SiteBasisSpec]:
    """Per-site specs for a grouping: singleton groups are plain SZ sites,
    larger groups become Fock big sites.  caps[s] = (min_n, max_n)."""
    specs: List[SiteBasisSpec] = []
    for s, orbs in enumerate(groups):
        if len(orbs) == 1:
            specs.append(SZ_SITE)
        else:
            mn, mx = (caps or {}).get(s, (0, None))
            specs.append(fock_site_spec([orb_sym[o] for o in orbs],
                                        group=group, min_n=mn, max_n=mx,
                                        name=f"fock{s}"))
    return specs


# ----------------------------------------------------------------------
# AQCC / ACPF size-consistency-corrected big-site sweeps
# (reference src/big_site/sweep_algorithm_big_site.hpp:292 DMRGBigSiteAQCC)
# ----------------------------------------------------------------------

def _gfactor(method: str, n_elec: int) -> float:
    if method == "cisd":
        return 0.0
    if method == "acpf":
        return 2.0 / n_elec
    if method == "aqcc":
        return 1.0 - (n_elec - 3.0) * (n_elec - 2.0) \
            / (n_elec * (n_elec - 1.0))
    raise ValueError(method)


def big_site_aqcc(fd, groups, caps, bond_dim: int = 120,
                  method: str = "aqcc", e_ref: Optional[float] = None,
                  n_outer: int = 8, tol: float = 1e-9, iprint: int = 0):
    """Size-consistency-corrected uncontracted MRCI on the big-site
    layout: self-consistent shifted eigenproblem

        (H + sigma * P_ext) |psi> = E |psi>,
        sigma = (1 - g) * (E - e_ref),

    with P_ext the projector on configurations exciting into the big
    (external) site and g the ACPF/AQCC factor.  method='cisd' (g=0)
    recovers plain MRCI.  Returns (E, sigma)."""
    from .core.expr import TermTable, build_term_table, qc_raw_terms
    from .dmrg.mpo_builder import build_mpo
    from .dmrg.mpo_algebra import mpo_scale, mpo_sum
    from .dmrg.mps import MPS, MPSInfo
    from .dmrg.sweep import DMRG

    raw = qc_raw_terms(fd)
    grouped = regroup_raw_terms(raw, groups)
    specs = grouped_site_specs(groups, fd.orb_sym
                               if fd.orb_sym is not None
                               else np.zeros(fd.n_sites, dtype=np.int64),
                               caps=caps)
    L = len(groups)
    tt = build_term_table(L, grouped, group=SZ_GROUP, spec=specs)
    mpo_h = build_mpo(tt, site_pgs=[0] * L, const_e=fd.const_e, spec=specs)
    # projector on the excited space: diag(n_ext > 0) on the big site
    big = max(range(L), key=lambda s: len(groups[s]))
    qb = specs[big].quanta(0)
    P = np.diag([1.0 if q[0] > 0 else 0.0 for q in qb])
    pid = tt.registry.register(P)
    row = np.zeros(L, dtype=np.uint32)
    row[:] = 0                      # identity
    row[big] = pid
    ttp = TermTable(SZ_GROUP, L, np.array([1.0]), row[None, :],
                    tt.registry)
    mpo_p = build_mpo(ttp, site_pgs=[0] * L, const_e=0.0, spec=specs)

    sq = [specs[t].quanta(0) for t in range(L)]
    target = (fd.n_elec, fd.twos, fd.ipg)
    if e_ref is None:
        # reference = solve in the P_ext = 0 subspace (big site frozen
        # empty): cheap CASCI over the non-big sites
        caps0 = dict(caps or {})
        caps0[big] = (0, 0)
        specs0 = grouped_site_specs(groups, fd.orb_sym
                                    if fd.orb_sym is not None else
                                    np.zeros(fd.n_sites, dtype=np.int64),
                                    caps=caps0)
        tt0 = build_term_table(L, grouped, group=SZ_GROUP, spec=specs0)
        mpo0 = build_mpo(tt0, site_pgs=[0] * L, const_e=fd.const_e,
                         spec=specs0)
        sq0 = [specs0[t].quanta(0) for t in range(L)]
        info0 = MPSInfo(SZ_GROUP, sq0, target, bond_dim)
        e_ref = DMRG(mpo0, MPS.random(info0), iprint=0).solve(
            [bond_dim], [1e-4, 1e-5, 0], [1e-10], n_sweeps=10, tol=1e-10)
    g = _gfactor(method, fd.n_elec)
    sigma = 0.0
    e = e_ref
    for it in range(n_outer):
        mpo = mpo_sum(mpo_h, mpo_scale(mpo_p, sigma)) if sigma != 0.0 \
            else mpo_h
        info = MPSInfo(SZ_GROUP, sq, target, bond_dim)
        # a trailing big site gets one-site updates (reference
        # sweep_algorithm_big_site.hpp:44 last_site_1site): the external
        # space is never fused with the neighbor's physical dimension
        dmrg = DMRG(mpo, MPS.random(info), iprint=0,
                    last_site_1site=(big == L - 1))
        e_shift = dmrg.solve([bond_dim], [1e-4, 1e-5, 0], [1e-10],
                             n_sweeps=10, tol=1e-11)
        # <P_ext> for the shift bookkeeping: E = E_shifted - sigma * <P>
        from .dmrg.expect import mpo_expectation
        pexp = mpo_expectation(mpo_p, dmrg.mps)
        e_new = e_shift - sigma * pexp
        sigma_new = (1.0 - g) * (e_new - e_ref)
        if iprint:
            print(f"  {method} outer {it}: E = {e_new:.10f} "
                  f"sigma = {sigma_new:.2e} <P> = {pexp:.4f}")
        conv = abs(sigma_new - sigma) < tol
        sigma, e = sigma_new, e_new
        if conv and it > 0:
            break
    return e, sigma

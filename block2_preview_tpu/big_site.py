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
                   name: str = "fock") -> SiteBasisSpec:
    """SiteBasisSpec for a determinant big site over len(member_pgs)
    spatial orbitals, optionally restricted to min_n <= N_site <= max_n.

    Elementary operator ids: 4 * member_index + {CRE_A, DES_A, CRE_B,
    DES_B}.  quanta(pg) ignores its argument (member pgs are baked in).
    """
    k = len(member_pgs)
    base_q = SZ_SITE.quanta(0)
    # enumerate product states (site-major kron order) with summed quanta
    quanta_full: List[QN] = []
    for occ in iproduct(range(4), repeat=k):
        q = group.zero
        for u, p in enumerate(occ):
            qu = SZ_SITE.quanta(int(member_pgs[u]))[p]
            q = group.add(q, qu)
        quanta_full.append(q)
    n_of = np.array([q[group.fermion_index] for q in quanta_full])
    cap = 2 * k if max_n is None else max_n
    keep = np.nonzero((n_of >= min_n) & (n_of <= cap))[0]

    def _kron(mats):
        out = np.eye(1)
        for m in mats:
            out = np.kron(out, m)
        return out

    elem: Dict[int, np.ndarray] = {}
    for u in range(k):
        for e, m4 in ELEM_MATS.items():
            mats = [PARITY] * u + [m4] + [IDENT] * (k - u - 1)
            full = _kron(mats)
            elem[4 * u + e] = np.ascontiguousarray(full[np.ix_(keep, keep)])
    ident = np.eye(len(keep))
    parity = np.ascontiguousarray(
        _kron([PARITY] * k)[np.ix_(keep, keep)])
    quanta_list = [quanta_full[i] for i in keep]
    return SiteBasisSpec(name, len(keep), elem, ident, parity,
                         lambda pg: list(quanta_list), fermionic=True)


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

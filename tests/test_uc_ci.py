"""Single-reference big-site CI (uc/ci.py; reference pyblock2/ci.py):
CISD vs windowed restricted ED, CI(n_elec) = FCI, variational ordering,
and the CI class surface."""

import numpy as np
import pytest

from block2_preview_tpu.core.expr import build_term_table, qc_raw_terms
from block2_preview_tpu.core.fcidump import FCIDUMP
from block2_preview_tpu.uc.ci import CI, ci_energy
from block2_preview_tpu.uc.mp import canonicalize_fcidump
from block2_preview_tpu.utils.ed import term_table_to_sparse


def _fd(L=4, ne=4):
    fd = FCIDUMP.hubbard(L, t=1.0, u=2.0)
    fd.n_elec, fd.twos = ne, 0
    return canonicalize_fcidump(fd)


def _restricted_ed(fd, nocc, order):
    """ED over determinants with <= order electrons in the virtuals."""
    from itertools import product
    L = fd.n_sites
    tt = build_term_table(L, qc_raw_terms(fd, cutoff=1e-13))
    h = term_table_to_sparse(tt).toarray()
    n_of = [0, 1, 1, 2]
    sz_of = [0, 1, -1, 0]
    keep = []
    for ix, occ in enumerate(product(range(4), repeat=L)):
        n = sum(n_of[p] for p in occ)
        sz = sum(sz_of[p] for p in occ)
        next_ = sum(n_of[p] for p in occ[nocc:])
        if n == fd.n_elec and sz == fd.twos and next_ <= order:
            keep.append(ix)
    hs = h[np.ix_(keep, keep)]
    return float(np.linalg.eigvalsh(0.5 * (hs + hs.T))[0]) + fd.const_e


def test_cisd_matches_restricted_ed():
    fd = _fd()
    ref = _restricted_ed(fd, 2, 2)
    got = ci_energy(fd, ci_order=2, bond_dim=400)
    assert abs(got - ref) < 1e-9, (got, ref)


def test_ci_hierarchy_and_fci_limit():
    fd = _fd()
    e2 = ci_energy(fd, ci_order=2, bond_dim=400)
    e3 = ci_energy(fd, ci_order=3, bond_dim=400)
    e4 = ci_energy(fd, ci_order=4, bond_dim=400)
    fci = _restricted_ed(fd, 2, 4)
    assert e2 >= e3 - 1e-10 >= e4 - 2e-10
    assert abs(e4 - fci) < 1e-9


def test_ci_class_surface():
    fd = _fd()
    solver = CI(fd, ci_order=2, e_ref=0.0)
    e = solver.kernel(bond_dim=400)
    assert solver.converged and solver.e_tot == e
    assert abs(solver.e_corr - e) < 1e-14


def test_hole_side_enumeration():
    """Nearly-full windows route through the hole-side branch of
    fock_site_spec (k > 10 members triggers the combinatorial paths)."""
    from block2_preview_tpu.big_site import fock_site_spec
    k = 11
    spec = fock_site_spec([0] * k, min_n=2 * k - 2)
    # dim = 1 (full) + 2k (one hole: codes 1,2) + pairs with deficit 2
    n_def2 = k + 4 * (k * (k - 1) // 2)   # one empty, or two singles
    assert spec.dim == 1 + 2 * k + n_def2
    qs = spec.quanta(0)
    assert {q[0] for q in qs} == {2 * k, 2 * k - 1, 2 * k - 2}

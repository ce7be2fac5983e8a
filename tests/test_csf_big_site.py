"""CSF big site: spin-adapted uncontracted MRCISD with the external
orbital space (<= 2 electrons) as one SU(2) site (reference
src/big_site/csf_big_site.hpp CSFSpace/CSFBigSite +
sweep_algorithm_big_site.hpp DMRGBigSite).

Anchor: restricted determinant ED (<= 2 electrons in the external
orbitals) with S^2 classification — the big-site DMRG must reproduce
the lowest state of the targeted spin sector exactly."""

import numpy as np
import pytest

from block2_preview_tpu.core.fcidump import FCIDUMP
from block2_preview_tpu.core.expr import (build_term_table, qc_term_table,
                                          spin_square_raw_terms)
from block2_preview_tpu.dmrg.csf_big_site import (ExternalSpace,
                                                  su2_mrcisd_dmrg)
from block2_preview_tpu.utils.ed import sector_indices, term_table_to_sparse

import sys
sys.path.insert(0, "/root/repo/tests")
from test_scnevpt2 import _rand_fd  # noqa: E402


def restricted_ed(h1, g2, ecore, n_int, n_elec, twos):
    K = h1.shape[0]
    fd = FCIDUMP(n_sites=K, n_elec=n_elec, twos=twos, ipg=0, orb_sym=None,
                 h1e=h1, g2e=g2 if g2 is not None else np.zeros((K,) * 4),
                 const_e=ecore)
    tt = qc_term_table(fd)
    h = term_table_to_sparse(tt)
    ix = sector_indices(K, n_elec, twos)

    def ext_count(det_idx):
        cnt = 0
        for t in range(K):
            d = (det_idx // (4 ** (K - 1 - t))) % 4
            if t >= n_int:
                cnt += (1 if d in (1, 2) else (2 if d == 3 else 0))
        return cnt

    ixr = ix[np.array([ext_count(int(i)) <= 2 for i in ix])]
    hs = h[np.ix_(ixr, ixr)].toarray()
    s2 = term_table_to_sparse(build_term_table(
        K, spin_square_raw_terms(K)))[np.ix_(ixr, ixr)].toarray()
    w, v = np.linalg.eigh(hs)
    ssv = np.einsum("ij,jk,ki->i", v.T, s2, v)
    tgt = (twos / 2) * (twos / 2 + 1)
    return [w[i] + ecore for i in range(len(w))
            if abs(ssv[i] - tgt) < 0.1]


def test_external_space_multiplets():
    xs = ExternalSpace(3, pgs=[0, 1, 2])
    # N=0: 1; N=1: 3 doublets; N=2: 6 singlets + 3 triplets
    from collections import Counter
    cnt = Counter((n, ts) for (n, ts, pg) in xs.mults)
    assert cnt[(0, 0)] == 1 and cnt[(1, 1)] == 3
    assert cnt[(2, 0)] == 6 and cnt[(2, 2)] == 3
    assert np.allclose(xs.U.T @ xs.U, np.eye(xs.U.shape[1]))


def test_su2_mrcisd_random_vs_restricted_ed():
    fd = _rand_fd(5, 4, seed=13)
    ref = restricted_ed(fd.h1e, fd.g2e, fd.const_e, 3, 4, 0)
    e, eng = su2_mrcisd_dmrg(fd.h1e, fd.g2e, fd.const_e, 3, 4, 0,
                             bond_dim=120, n_sweeps=10)
    assert abs(e - ref[0]) < 1e-9


def test_su2_mrcisd_spin_adaptation():
    """The big-site run targets a pure spin sector: with twos=2 it must
    find the lowest TRIPLET of the restricted space, not the global
    restricted minimum."""
    fd = _rand_fd(5, 4, seed=21)
    ref_s = restricted_ed(fd.h1e, fd.g2e, fd.const_e, 3, 4, 0)
    ref_t = restricted_ed(fd.h1e, fd.g2e, fd.const_e, 3, 4, 2)
    e0, _ = su2_mrcisd_dmrg(fd.h1e, fd.g2e, fd.const_e, 3, 4, 0,
                            bond_dim=120, n_sweeps=10)
    e1, _ = su2_mrcisd_dmrg(fd.h1e, fd.g2e, fd.const_e, 3, 4, 2,
                            bond_dim=120, n_sweeps=10)
    assert abs(e0 - ref_s[0]) < 1e-9
    assert abs(e1 - ref_t[0]) < 1e-9


def test_su2_mrcisd_hubbard_4plus2():
    fd = FCIDUMP.parse("/root/reference/data/HUBBARD-L6.FCIDUMP")
    ref = restricted_ed(fd.h1e, fd.g2e, fd.const_e, 4, 6, 0)
    e, _ = su2_mrcisd_dmrg(fd.h1e, fd.g2e, fd.const_e, 4, 6, 0,
                           bond_dim=150, n_sweeps=12)
    assert abs(e - ref[0]) < 1e-8


def test_drt_big_site_matches_csf():
    """DRT (Gelfand/GUGA) big-site basis (reference DRTBigSite,
    drt_big_site.hpp:1964) spans the same restricted space: identical
    MRCISD energies, orthonormal CSF expansions."""
    xs = ExternalSpace(3, pgs=[0, 1, 2], basis="drt")
    assert np.allclose(xs.U.T @ xs.U, np.eye(xs.U.shape[1]), atol=1e-10)
    fd = _rand_fd(5, 4, seed=13)
    e_s2, _ = su2_mrcisd_dmrg(fd.h1e, fd.g2e, fd.const_e, 3, 4, 0,
                              bond_dim=120, n_sweeps=10, basis="s2")
    e_drt, _ = su2_mrcisd_dmrg(fd.h1e, fd.g2e, fd.const_e, 3, 4, 0,
                               bond_dim=120, n_sweeps=10, basis="drt")
    assert abs(e_s2 - e_drt) < 1e-9


def restricted_ed_order(h1, g2, ecore, n_int, n_elec, twos, order):
    """Restricted ED with <= `order` electrons in the external orbitals."""
    K = h1.shape[0]
    fd = FCIDUMP(n_sites=K, n_elec=n_elec, twos=twos, ipg=0, orb_sym=None,
                 h1e=h1, g2e=g2 if g2 is not None else np.zeros((K,) * 4),
                 const_e=ecore)
    tt = qc_term_table(fd)
    h = term_table_to_sparse(tt)
    ix = sector_indices(K, n_elec, twos)

    def ext_count(det_idx):
        cnt = 0
        for t in range(K):
            d = (det_idx // (4 ** (K - 1 - t))) % 4
            if t >= n_int:
                cnt += (1 if d in (1, 2) else (2 if d == 3 else 0))
        return cnt

    ixr = ix[np.array([ext_count(int(i)) <= order for i in ix])]
    hs = h[np.ix_(ixr, ixr)].toarray()
    s2 = term_table_to_sparse(build_term_table(
        K, spin_square_raw_terms(K)))[np.ix_(ixr, ixr)].toarray()
    w, v = np.linalg.eigh(hs)
    ssv = np.einsum("ij,jk,ki->i", v.T, s2, v)
    tgt = (twos / 2) * (twos / 2 + 1)
    return [w[i] + ecore for i in range(len(w))
            if abs(ssv[i] - tgt) < 0.1]


def test_external_space_sdt_multiplets():
    """ci_order=3 (MRCISDT-style) external space: N=3 sector multiplet
    counts over 3 orbitals — C(6,3)=20 dets = 8 doublets + 1 quartet."""
    xs = ExternalSpace(3, max_elec=3)
    from collections import Counter
    cnt = Counter((n, ts) for (n, ts, pg) in xs.mults)
    assert cnt[(3, 1)] == 8 and cnt[(3, 3)] == 1
    assert np.allclose(xs.U.T @ xs.U, np.eye(xs.U.shape[1]))


@pytest.mark.slow
def test_su2_mrcisdt_random_vs_restricted_ed():
    """General CI order (reference drt_big_site.hpp:1964 DRTBigSite
    arbitrary particle counts): ci_order=3 big site must reproduce the
    <=3-external-electron restricted ED, and sit strictly between the
    SD-restricted and full-space ground states."""
    fd = _rand_fd(5, 4, seed=13)
    ref3 = restricted_ed_order(fd.h1e, fd.g2e, fd.const_e, 3, 4, 0, 3)
    e3, _ = su2_mrcisd_dmrg(fd.h1e, fd.g2e, fd.const_e, 3, 4, 0,
                            bond_dim=150, n_sweeps=10, ci_order=3)
    assert abs(e3 - ref3[0]) < 1e-9
    ref2 = restricted_ed_order(fd.h1e, fd.g2e, fd.const_e, 3, 4, 0, 2)
    assert e3 < ref2[0] - 1e-10 or abs(e3 - ref2[0]) < 1e-9

"""Dyall/Fink zeroth-order Hamiltonians + uncontracted NEVPT2/REPT2.

Mirrors the reference's MRPT stack (integral_dyall.hpp, integral_fink.hpp,
block2main `nevpt2` workflows).  Anchors: with an empty active space the
Dyall H0 reduces to the Moller-Plesset partition (E2 == MP2 exactly); with
the full orbital space active, E2 == 0; eigen-sum-over-states equals the
linear-system solve.
"""

import numpy as np
import pytest

from block2_preview_tpu.core.fcidump import FCIDUMP
from block2_preview_tpu.core.integral_dyall import (dyall_fcidump,
                                                    fink_fcidump,
                                                    inactive_fock)
from block2_preview_tpu.uc.mp import mp2_energy
from block2_preview_tpu.uc.nevpt2 import casci_root, mrpt2_energy


@pytest.fixture(scope="module")
def fd():
    return FCIDUMP.parse("/root/reference/data/H4.STO6G.R1.8.FCIDUMP")


def test_mp2_limit(fd):
    e_hf, e_mp2 = mp2_energy(fd)
    e0, e2 = mrpt2_energy(fd, n_inactive=fd.n_elec // 2, n_active=0)
    assert abs(e0 - e_hf) < 1e-10
    assert abs(e2 - e_mp2) < 1e-10


def test_full_cas_limit(fd):
    e0, e2 = mrpt2_energy(fd, n_inactive=0, n_active=fd.n_sites)
    assert abs(e2) < 1e-12
    # full-CAS CASCI == FCI
    assert abs(e0 - (-2.190384218793)) < 1e-9


def test_dyall_expectation_consistency(fd):
    """<CAS|H^D|CAS> = E_CASCI for the exact CASCI root by construction."""
    from block2_preview_tpu.core.expr import qc_term_table
    from block2_preview_tpu.utils.ed import term_table_to_sparse
    ni, na = 1, 2
    e0, c0m, ix, mask = casci_root(fd, ni, na)
    from block2_preview_tpu.uc.nevpt2 import _cas_rdm1
    dm1 = _cas_rdm1(fd, ni, na, c0m, ix, mask)
    assert abs(np.trace(dm1) - (fd.n_elec - 2 * ni)) < 1e-10
    fd0 = dyall_fcidump(fd, ni, na, rdm1_active=dm1)
    h0 = term_table_to_sparse(qc_term_table(fd0))
    rows = ix[mask]
    e_h0 = float(c0m @ (h0[np.ix_(rows, rows)] @ c0m)) + fd0.const_e
    assert abs(e_h0 - e0) < 1e-9


def test_nevpt2_vs_sum_over_states(fd):
    """Linear-system E2 equals the explicit eigenbasis sum."""
    from block2_preview_tpu.core.expr import qc_term_table
    from block2_preview_tpu.utils.ed import term_table_to_sparse
    from block2_preview_tpu.uc.nevpt2 import (_cas_rdm1, _model_space_mask)
    from block2_preview_tpu.utils.ed import sector_indices
    ni, na = 1, 2
    e0, e2 = mrpt2_energy(fd, ni, na)
    e0r, c0m, ix, mask = casci_root(fd, ni, na)
    dm1 = _cas_rdm1(fd, ni, na, c0m, ix, mask)
    fd0 = dyall_fcidump(fd, ni, na, rdm1_active=dm1)
    h = term_table_to_sparse(qc_term_table(fd))[np.ix_(ix, ix)].toarray()
    h0 = term_table_to_sparse(qc_term_table(fd0))[np.ix_(ix, ix)].toarray()
    c0 = np.zeros(len(ix))
    c0[np.where(mask)[0]] = c0m
    e00 = float(c0 @ h0 @ c0)
    out = np.where(~mask)[0]
    w, v = np.linalg.eigh(h0[np.ix_(out, out)])
    amp = v.T @ (h @ c0)[out]
    e2_sum = float(np.sum(amp ** 2 / (e00 - w)))
    assert abs(e2 - e2_sum) < 1e-10


def test_fink_block_structure(fd):
    """Fink H0 keeps only subspace-conserving integral entries."""
    fd0 = fink_fcidump(fd, 1, 2)
    lab = np.zeros(fd.n_sites, dtype=int)
    lab[1:3] = 1
    lab[3:] = 2
    nz = np.nonzero(fd0.h1e)
    assert np.all(lab[nz[0]] == lab[nz[1]])
    i, j, k, l = np.nonzero(fd0.g2e)
    assert np.all((lab[i] == lab[j]) & (lab[k] == lab[l]))


def test_rept2_below_nevpt2(fd):
    """Fink (REPT2) recovers at least as much correlation as Dyall here."""
    _e0, e2_d = mrpt2_energy(fd, 1, 2, h0="dyall")
    _e0, e2_f = mrpt2_energy(fd, 1, 2, h0="fink")
    assert e2_d < 0 and e2_f < 0
    assert e2_f < e2_d + 1e-12


def test_inactive_fock_no_core(fd):
    assert np.abs(inactive_fock(fd, 0) - fd.h1e).max() == 0.0

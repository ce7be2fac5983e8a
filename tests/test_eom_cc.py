"""EOM-CCSD / Lambda / CC response densities (cc/eom_gccsd.py).

Mirrors the reference's EOM/lambda/RDM CC modules (pyblock2/cc/eom_gccsd.py,
lambda_gccsd.py, rdm_gccsd.py).  Anchors: for a two-electron reference,
CCSD, EOM-EE-CCSD and IP-EOM-CCSD are exact (FCI); response 1/2-RDMs
recontract to the CCSD energy; EA (2p1h-truncated) is a finite approximation.
"""

import numpy as np
import pytest

from block2_preview_tpu.cc.eom_gccsd import GCCSDExact
from block2_preview_tpu.core.expr import qc_term_table
from block2_preview_tpu.models.hubbard import hubbard_fcidump
from block2_preview_tpu.uc.mp import canonicalize_fcidump
from block2_preview_tpu.utils.ed import sector_indices, term_table_to_sparse


@pytest.fixture(scope="module")
def setup():
    fd = hubbard_fcidump(4, u=2.0)
    fd.n_elec = 2
    fd = canonicalize_fcidump(fd)
    cc = GCCSDExact(fd)
    h = term_table_to_sparse(qc_term_table(fd))

    def sector_eigs(n_elec, twos=None):
        ix = sector_indices(fd.n_sites, n_elec, twos)
        return np.sort(np.linalg.eigvalsh(
            h[np.ix_(ix, ix)].toarray())) + fd.const_e

    return fd, cc, sector_eigs


def test_ccsd_exact_two_electrons(setup):
    fd, cc, eigs = setup
    w = eigs(2, 0)
    assert abs(cc.e_hf + cc.e_corr - w[0]) < 1e-8


def test_eom_ee_matches_fci(setup):
    fd, cc, eigs = setup
    w = eigs(2, 0)
    ee = cc.eom_ee(n_roots=3)
    assert np.abs(ee - (w[1:4] - w[0])).max() < 1e-8


def test_eom_ip_matches_fci(setup):
    fd, cc, eigs = setup
    w0 = eigs(2, 0)[0]
    w1 = eigs(1)
    ip = cc.eom_ip(n_roots=2)
    assert np.abs(ip - (w1[:2] - w0)).max() < 1e-8


def test_eom_ea_reasonable(setup):
    fd, cc, eigs = setup
    w0 = eigs(2, 0)[0]
    w2 = eigs(3)
    ea = cc.eom_ea(n_roots=2)
    # 2p1h truncation: approximate for a 2-electron reference
    assert np.abs(ea - (w2[:2] - w0)).max() < 0.05


def test_response_density_energy_consistency(setup):
    fd, cc, _ = setup
    assert abs(cc.energy_from_rdms() - (cc.e_hf + cc.e_corr)) < 1e-8
    g1 = cc.rdm1()
    assert abs(np.trace(g1) - fd.n_elec) < 1e-9


def test_four_electron_ground_state_eigenvector(setup):
    """For >2 electrons CCSD is approximate, but the CC ground state is
    still an exact eigenvector of the truncated-space Hbar with eigenvalue
    E_CCSD (by construction of the similarity transform)."""
    fd4 = hubbard_fcidump(4, u=2.0)
    fd4 = canonicalize_fcidump(fd4)
    cc4 = GCCSDExact(fd4)
    l, r = cc4.lambda_vector()
    assert abs(l @ r - 1.0) < 1e-10
    e_rdm = cc4.energy_from_rdms()
    assert abs(e_rdm - (cc4.e_hf + cc4.e_corr)) < 1e-7

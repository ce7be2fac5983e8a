"""Spin-adapted EOM-CCSD + spatial Lambda/RDM modules
(cc/eom_rccsd.py; reference pyblock2/cc/eom_rccsd.py, lambda_rccsd.py,
rdm_rccsd.py, rdm_uccsd.py).  Anchors: EOM-CCSD is exact for two
electrons — the singlet-projected roots must match the FCI singlet
spectrum and EXCLUDE the triplets the spin-orbital matrix carries."""

import numpy as np

from block2_preview_tpu.cc.eom_rccsd import (eom_ee_rccsd, lambda_rccsd,
                                             rdm_rccsd, rdm_uccsd)
from block2_preview_tpu.cc.wick_cc import WickCC
from block2_preview_tpu.core.expr import qc_term_table
from block2_preview_tpu.core.fcidump import FCIDUMP
from block2_preview_tpu.utils.ed import (ground_state_energy,
                                         sector_indices,
                                         term_table_to_sparse)

from test_gccsdt import _random_system


def _fci_spectrum_sz0(fd, k=16):
    return ground_state_energy(qc_term_table(fd), fd.n_elec, 0, k=k)


def test_eom_ee_singlet_projection_exact_2e():
    fd, _ = _random_system(3, 2, seed=4)
    tt = qc_term_table(fd)
    es0 = ground_state_energy(tt, 2, 0, k=9)    # Sz=0 sector (full)
    es1 = ground_state_energy(tt, 2, 2, k=3)    # Sz=1 = triplets
    exc0 = es0[1:] - es0[0]
    trip_exc = es1 - es0[0]
    # FCI SINGLET excitations = Sz=0 levels absent from the Sz=1 set
    sing_exc = [x for x in exc0
                if min(abs(x - y) for y in trip_exc) > 1e-8]
    w_sing = eom_ee_rccsd(fd, n_roots=5)
    # EOM-CCSD is exact for 2e: the singlet-projected roots ARE the
    # FCI singlet excitations, in order
    for k, x in enumerate(sing_exc[:3]):
        assert abs(w_sing[k] - x) < 1e-8, (k, w_sing[k], x)
    # and every triplet is projected out
    for y in trip_exc:
        assert min(abs(y - x) for x in w_sing) > 1e-6, y
    from block2_preview_tpu.cc.eom_rccsd import singlet_basis_ee
    cc = WickCC(fd)
    C, nsing = singlet_basis_ee(cc.no, cc.nv)
    assert nsing < C.shape[0]
    # invariance: Hbar leaves the singlet subspace invariant
    M, _b = cc.eom_ee_matrix()
    leak = (np.eye(M.shape[0]) - C @ C.T) @ M @ C
    assert np.abs(leak).max() < 1e-10


def test_lambda_and_rdms_spatial():
    fd, _ = _random_system(3, 2, seed=11)
    l1, l2 = lambda_rccsd(fd)
    assert l1.shape == (1, 2) and l2.shape == (1, 1, 2, 2)
    dm1, dm2 = rdm_rccsd(fd)
    assert abs(np.trace(dm1) - fd.n_elec) < 1e-8
    # pyscf-convention partial trace: sum_r dm2[p,q,r,r] = (N-1) dm1
    pt = np.einsum("pqrr->pq", dm2) / (fd.n_elec - 1)
    assert np.abs(pt - dm1).max() < 1e-7
    # energy through the response RDMs equals E_CCSD (2e: exact)
    e_rdm = (np.einsum("pq,pq->", fd.h1e, dm1)
             + 0.5 * np.einsum("pqrs,pqrs->", fd.g2e, dm2)
             + fd.const_e)
    from block2_preview_tpu.cc.gccsd import gccsd
    e_hf, e_corr = gccsd(fd)
    assert abs(e_rdm - (e_hf + e_corr)) < 1e-7, (e_rdm, e_hf + e_corr)


def test_rdm_uccsd_sections():
    fd, _ = _random_system(3, 2, seed=13)
    (d1a, d1b), (d2aa, d2ab, d2bb) = rdm_uccsd(fd)
    dm1, dm2 = rdm_rccsd(fd)
    assert np.abs(d1a + d1b - dm1).max() < 1e-10
    assert np.abs(d2aa + d2bb + d2ab + d2ab.transpose(2, 3, 0, 1)
                  - dm2).max() < 1e-8

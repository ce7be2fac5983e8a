"""Arbitrary-order NPDM via determinant-space reconstruction.

Validates dmrg/npdm.py against the conventional prefix-cached sweep engine
(expect.py) on orders 1-3, plus 4PDM consistency identities (partial trace,
hermiticity, antisymmetry) — mirroring how the reference cross-checks its
symbol-free NPDM engine against conventional PDM MPOs
(unit_test/test_npdm_n2_sto3g.cpp).
"""

import numpy as np
import pytest

from block2_preview_tpu.core.expr import qc_term_table
from block2_preview_tpu.dmrg.expect import pdm1, pdm2_spatial, pdm3_spatial
from block2_preview_tpu.dmrg.mpo_builder import build_mpo
from block2_preview_tpu.dmrg.mps import MPS, MPSInfo
from block2_preview_tpu.dmrg.npdm import mps_to_civec, npdm_spatial
from block2_preview_tpu.dmrg.sweep import DMRG
from block2_preview_tpu.models.hubbard import hubbard_fcidump


@pytest.fixture(scope="module")
def solved():
    fd = hubbard_fcidump(4, u=2.0)
    tt = qc_term_table(fd)
    mpo = build_mpo(tt, const_e=fd.const_e)
    info = MPSInfo(mpo.group, mpo.site_quanta,
                   (fd.n_elec, fd.twos, fd.ipg), 200)
    mps = MPS.random(info)
    dmrg = DMRG(mpo, mps, iprint=0)
    dmrg.solve([200], [1e-5, 0], [1e-10], n_sweeps=8, tol=1e-12)
    return fd, mps


def test_civec_norm(solved):
    _fd, mps = solved
    dets, coefs = mps_to_civec(mps)
    assert abs(np.linalg.norm(coefs) - 1.0) < 1e-10
    assert len(dets) == 36      # C(4,2)^2


def test_orders_1_to_3_match_sweep_engine(solved):
    _fd, mps = solved
    assert np.abs(npdm_spatial(mps, 1) - pdm1(mps).sum(axis=0)).max() < 1e-12
    assert np.abs(npdm_spatial(mps, 2)
                  - pdm2_spatial(mps, assume_singlet=False)).max() < 1e-12
    assert np.abs(npdm_spatial(mps, 3) - pdm3_spatial(mps)).max() < 1e-12


def test_pdm4_identities(solved):
    fd, mps = solved
    d4 = npdm_spatial(mps, 4)
    d3 = pdm3_spatial(mps)
    # partial trace: sum_m dm4[i1 i2 i3 m, m j2 j3 j4] = (N-3) dm3
    tr = np.einsum("abcmmdef->abcdef", d4)
    assert np.abs(tr - (fd.n_elec - 3) * d3).max() < 1e-10
    # hermiticity: dm4[I, J] = dm4[rev J, rev I]
    herm = d4.transpose(7, 6, 5, 4, 3, 2, 1, 0)
    assert np.abs(d4 - herm).max() < 1e-10


def test_driver_pdm4_entry(solved):
    fd, mps = solved
    from block2_preview_tpu.driver.core import DMRGDriver
    drv = DMRGDriver()
    drv.initialize_system(n_sites=4, n_elec=fd.n_elec, spin=fd.twos)
    d4 = drv.get_npdm(mps, pdm_type=4)
    assert d4.shape == (4,) * 8

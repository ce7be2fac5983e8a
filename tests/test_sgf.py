"""SGF (general-spin / spin-orbital) mode tests, real GHF and complex DHF
(mirrors reference pyblock2/unit_test/dmrg.py DHF tier and the SGF paths of
unit_test/test_dmrg_n2_sto3g.cpp)."""

import numpy as np
import pytest

from block2_preview_tpu.driver.core import DMRGDriver, SymmetryTypes
from block2_preview_tpu.dmrg.sweep import DMRG


@pytest.mark.slow
def test_sgf_n2_ghf():
    drv = DMRGDriver(SymmetryTypes.SGF)
    fd = drv.read_fcidump("/root/reference/data/N2.STO3G.GHF.FCIDUMP")
    mpo = drv.get_qc_mpo(fcidump=fd)
    mps = drv.get_random_mps(500)
    d = DMRG(mpo, mps, iprint=0)
    e = d.solve([250, 500], [1e-4, 1e-5, 1e-5, 0], [1e-9], n_sweeps=8,
                tol=1e-9)
    # GHF file integrals themselves are truncated at ~1e-7
    assert abs(e - (-107.654122447525)) < 1e-5


def test_sgf_dhf_complex_h2o():
    # block2 reference: -75.05489216789145 (pyblock2/unit_test/dmrg.py:348)
    drv = DMRGDriver(SymmetryTypes.SGF)
    fd = drv.read_fcidump("/root/reference/data/H2O.STO3G.DHF-C.FCIDUMP")
    assert np.iscomplexobj(fd.h1e)
    fd.h1e[np.abs(fd.h1e) < 1e-7] = 0
    fd.g2e[np.abs(fd.g2e) < 1e-7] = 0
    mpo = drv.get_qc_mpo(fcidump=fd)
    mps = drv.get_random_mps(400)
    d = DMRG(mpo, mps, iprint=0)
    e = d.solve([250, 400], [1e-3, 1e-3, 1e-4, 1e-4, 0], [1e-9],
                n_sweeps=10, tol=1e-9)
    assert abs(e - (-75.05489216789145)) < 1e-6

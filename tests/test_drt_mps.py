"""DRT-MPS view of the SU(2) engine (reference drt_mps.hpp:31 DRTMPS):
CSF/Gelfand-basis coefficients extracted as reduced-element products
along DRT paths.  Anchors: the CSF expansion reproduces every
determinant coefficient of the exact SZ expansion, the coefficients
are normalized, and every path is a valid DRT row sequence."""

import numpy as np
import pytest

from block2_preview_tpu.core.fcidump import FCIDUMP
from block2_preview_tpu.dmrg.determinant import det_coefficient
from block2_preview_tpu.dmrg.guga import (DRT, csf_to_determinants,
                                          su2_csf_coefficients)
from block2_preview_tpu.driver.core import DMRGDriver, SymmetryTypes
from block2_preview_tpu.models.hubbard import hubbard_fcidump
from block2_preview_tpu.utils.transform import su2_to_sz_mps


@pytest.mark.parametrize("twos", [0, 2])
def test_su2_csf_coefficients_vs_determinants(twos):
    L = 4
    fd = hubbard_fcidump(L, u=2.0, t=1.0)
    drv = DMRGDriver(SymmetryTypes.SU2)
    drv.initialize_system(L, 4, twos, orb_sym=np.zeros(L, dtype=int))
    mpo = drv.get_qc_mpo(fcidump=fd)
    ket = drv.get_random_mps(60)
    drv.dmrg(mpo, ket, [60] * 8, [1e-4] * 4 + [0] * 4, [1e-10] * 8,
             n_sweeps=8, tol=1e-12, iprint=0)
    eng = ket.engine

    csfs = su2_csf_coefficients(eng, cutoff=1e-12)
    drt = DRT(L, 4, twos)
    assert len(csfs) <= drt.n_csf
    assert abs(sum(c * c for c, _ in csfs) - 1.0) < 1e-9

    # every path must be a valid DRT row sequence (read bottom-up)
    steps_dn = ((0, 0), (1, 1), (1, -1), (2, 0))
    for _, steps in csfs:
        n = s2 = 0
        for k, d in enumerate(steps):
            n, s2 = n + steps_dn[d][0], s2 + steps_dn[d][1]
            assert (n, s2) in drt.row_id[k + 1], (steps, k)

    # determinant-coefficient parity: sum_csf c * <det|CSF> at Sz = S
    mz = su2_to_sz_mps(eng)
    pred = {}
    for c, steps in csfs:
        for occ, amp in csf_to_determinants(steps).items():
            pred[occ] = pred.get(occ, 0.0) + c * amp
    for occ, val in pred.items():
        got = det_coefficient(mz, occ)
        assert abs(got - val) < 1e-9, (occ, got, val)

"""NPDM orders 5-6 through the polynomial pooled engine (VERDICT r3
missing item 4; reference general_npdm.hpp:43 supports arbitrary order):
exact parity vs the determinant-space reconstruction and the
k-fold-trace identity Tr G_k = N!/(N-k)!."""

import math

import numpy as np
import pytest

from block2_preview_tpu.core.fcidump import FCIDUMP
from block2_preview_tpu.dmrg.npdm import npdm_spatial
from block2_preview_tpu.dmrg.npdm_scheme import npdm_spatial_poly
from block2_preview_tpu.dmrg.sweep import DMRG
from block2_preview_tpu.driver.core import DMRGDriver, SymmetryTypes


def _solved_mps(n=4, nelec=6):
    h = np.zeros((n, n))
    for i in range(n - 1):
        h[i, i + 1] = h[i + 1, i] = -1.0
    g = np.zeros((n,) * 4)
    for i in range(n):
        g[i, i, i, i] = 2.0
    fd = FCIDUMP(n_sites=n, n_elec=nelec, twos=0, ipg=0,
                 orb_sym=[0] * n, h1e=h, g2e=g)
    drv = DMRGDriver(symm_type=SymmetryTypes.SZ)
    drv.initialize_system(n, nelec, 0, orb_sym=fd.orb_sym)
    mpo = drv.get_qc_mpo(fcidump=fd)
    mps = drv.get_random_mps(40, target=drv.target)
    DMRG(mpo, mps, iprint=0).solve([40] * 4, [1e-4, 0, 0, 0], [1e-10],
                                   n_sweeps=4, tol=0)
    return mps, nelec


def test_fivepdm_parity_and_trace():
    mps, nelec = _solved_mps()
    k = 5
    a = npdm_spatial_poly(mps, k)
    b = npdm_spatial(mps, k)
    assert np.abs(a - b).max() < 1e-12
    tr = np.einsum(a, list(range(k)) + list(range(k - 1, -1, -1)))
    assert abs(tr - math.perm(nelec, k)) < 1e-8
    assert np.abs(a).max() > 0.1


@pytest.mark.slow
def test_sixpdm_parity_and_trace():
    mps, nelec = _solved_mps()
    k = 6
    a = npdm_spatial_poly(mps, k)
    b = npdm_spatial(mps, k)
    assert np.abs(a - b).max() < 1e-12
    tr = np.einsum(a, list(range(k)) + list(range(k - 1, -1, -1)))
    assert abs(tr - math.perm(nelec, k)) < 1e-8

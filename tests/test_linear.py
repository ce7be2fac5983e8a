"""Linear-sweep tests: compression, MPO x MPS fitting, addition
(mirrors reference unit_test/test_compress_n2_sto3g.cpp and
test_fit_n2_631g.cpp tiers)."""

import numpy as np
import pytest

from block2_preview_tpu.core.fcidump import FCIDUMP
from block2_preview_tpu.driver.core import DMRGDriver
from block2_preview_tpu.dmrg.sweep import DMRG
from block2_preview_tpu.dmrg.expect import mps_overlap, mpo_expectation


@pytest.fixture(scope="module")
def n2_state():
    drv = DMRGDriver()
    fd = drv.read_fcidump("/root/reference/data/N2.STO3G.FCIDUMP")
    mpo = drv.get_qc_mpo(fcidump=fd)
    mps = drv.get_random_mps(250)
    e = drv.dmrg(mpo, mps, bond_dims=[250], noises=[1e-4, 1e-5, 0],
                 thrds=[1e-10], n_sweeps=6, iprint=0)
    return drv, fd, mpo, mps, e


def test_compression(n2_state):
    drv, fd, mpo, mps, e = n2_state
    bra, nrm = drv.compress_mps(mps, 100, mpo, n_sweeps=6)
    ov = mps_overlap(bra, mps)
    assert abs(nrm - 1.0) < 1e-6          # compressing a normalized state
    assert ov > 0.99999
    e_x = mpo_expectation(mpo, bra) / mps_overlap(bra, bra)
    assert abs(e_x - e) < 1e-5


def test_multiply_h_psi(n2_state):
    drv, fd, mpo, mps, e = n2_state
    bra, nrm = drv.multiply(mpo, mps, 250, n_sweeps=6)
    # <x|b> = <b|H|b> = E - ecore  (MPO carries const_e separately)
    ov = mps_overlap(bra, mps)
    assert abs(ov - (e - mpo.const_e)) < 1e-6


def test_addition(n2_state):
    drv, fd, mpo, mps, e = n2_state
    b = drv.get_random_mps(60, seed=99)
    # random MPS is normalized
    x, nrm = drv.addition(mps, b, mpo, 250, n_sweeps=6)
    xx = mps_overlap(x, x)
    expect = (mps_overlap(mps, mps) + mps_overlap(b, b)
              + 2 * mps_overlap(mps, b))
    assert abs(xx - expect) < 1e-8

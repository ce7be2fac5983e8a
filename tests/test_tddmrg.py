"""RK4 time-step-targeting TDDMRG (reference sweep_algorithm_td.hpp:62)."""

from block2_preview_tpu.core.expr import qc_term_table
from block2_preview_tpu.dmrg.tddmrg import TDDMRG
from block2_preview_tpu.driver.core import DMRGDriver
from block2_preview_tpu.utils.ed import ground_state_energy


def test_tddmrg_imaginary_relaxation():
    drv = DMRGDriver()
    fd = drv.read_fcidump("/root/reference/data/HUBBARD-L6.FCIDUMP")
    mpo = drv.get_qc_mpo(fcidump=fd)
    mps = drv.get_random_mps(100, seed=5)
    e = TDDMRG(mpo, mps, imaginary=True, iprint=0).solve(20, 0.3, 100)
    eg = ground_state_energy(qc_term_table(fd), fd.n_elec, fd.twos,
                             fd.const_e)[0]
    assert abs(e - eg) < 1e-9

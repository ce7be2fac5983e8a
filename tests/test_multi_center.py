"""Multi-center parallel MPS (conn_centers) sweeps vs ordinary DMRG
(reference src/dmrg/parallel_mps.hpp:37, sweep_algorithm.hpp:2851
unordered_sweep; keyword conn_centers)."""

import numpy as np

from block2_preview_tpu.core.expr import qc_term_table
from block2_preview_tpu.core.fcidump import FCIDUMP
from block2_preview_tpu.dmrg.mpo_builder import build_mpo
from block2_preview_tpu.dmrg.mps import MPS, MPSInfo
from block2_preview_tpu.dmrg.sweep import DMRG
from block2_preview_tpu.parallel.multi_center import MultiCenterDMRG


def test_multi_center_hubbard_parity():
    fd = FCIDUMP.parse("/root/reference/data/HUBBARD-L16.FCIDUMP")
    mpo = build_mpo(qc_term_table(fd), const_e=fd.const_e)
    tgt = (fd.n_elec, fd.twos, fd.ipg)
    mps = MPS.random(MPSInfo(mpo.group, mpo.site_quanta, tgt, 200))
    mc = MultiCenterDMRG(mpo, mps, conn_centers=[5, 10], iprint=0)
    e = mc.solve([200], [1e-4, 1e-5, 0.0], [1e-9], n_sweeps=10, tol=1e-9)
    mps2 = MPS.random(MPSInfo(mpo.group, mpo.site_quanta, tgt, 200))
    d = DMRG(mpo, mps2, iprint=0)
    d.solve([200], [1e-4, 1e-5, 0.0], [1e-9], n_sweeps=12, tol=1e-10)
    e2 = float(d.energies[-1][0])
    assert abs(e - e2) < 1e-8, (e, e2)


def test_multi_center_bad_centers():
    fd = FCIDUMP.parse("/root/reference/data/HUBBARD-L8.FCIDUMP")
    mpo = build_mpo(qc_term_table(fd), const_e=fd.const_e)
    tgt = (fd.n_elec, fd.twos, fd.ipg)
    mps = MPS.random(MPSInfo(mpo.group, mpo.site_quanta, tgt, 50))
    try:
        MultiCenterDMRG(mpo, mps, conn_centers=[1])
        assert False, "expected assertion"
    except AssertionError:
        pass

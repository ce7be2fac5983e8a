"""Integral-sliced sum-of-MPOs DMRG parity (reference SumMPOQC /
simple_parallel tier, unit_test/mpi/test_sum_mpo_n2_sto3g.cpp)."""

import numpy as np

from block2_preview_tpu.core.expr import qc_term_table
from block2_preview_tpu.core.fcidump import FCIDUMP
from block2_preview_tpu.dmrg.mpo_builder import build_mpo
from block2_preview_tpu.dmrg.mps import MPS, MPSInfo
from block2_preview_tpu.dmrg.sweep import DMRG
from block2_preview_tpu.parallel.sum_mpo import SumDMRG, slice_term_table


def test_sum_mpo_energy_parity():
    fd = FCIDUMP.parse("/root/reference/data/HUBBARD-L8.FCIDUMP")
    tt = qc_term_table(fd)
    slices = slice_term_table(tt, 2, mode="si")
    assert sum(len(s) for s in slices) == len(tt)
    mpos = [build_mpo(s, site_pgs=fd.orb_sym,
                      const_e=fd.const_e if r == 0 else 0.0)
            for r, s in enumerate(slices)]
    full = build_mpo(tt, site_pgs=fd.orb_sym, const_e=fd.const_e)
    target = (fd.n_elec, fd.twos, fd.ipg)
    info = MPSInfo(full.group, full.site_quanta, target, 120)

    mps1 = MPS.random(info, seed=4)
    e_full = DMRG(full, mps1, iprint=0).solve(
        [120], [1e-4, 1e-5, 0], [1e-10], n_sweeps=6, tol=1e-11)

    info2 = MPSInfo(full.group, full.site_quanta, target, 120)
    mps2 = MPS.random(info2, seed=4)
    e_sum = SumDMRG(mpos, mps2, iprint=0).solve(
        [120], [1e-4, 1e-5, 0], [1e-10], n_sweeps=6, tol=1e-11)
    assert abs(e_full - e_sum) < 1e-9

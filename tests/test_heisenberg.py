"""Heisenberg model on SGB spin sites (reference src/core/heisenberg.hpp)."""

from block2_preview_tpu.dmrg.mpo_builder import build_mpo
from block2_preview_tpu.dmrg.mps import MPS, MPSInfo
from block2_preview_tpu.dmrg.sweep import DMRG
from block2_preview_tpu.models.heisenberg import (SGB_GROUP,
                                                  heisenberg_term_table)
from block2_preview_tpu.ops.local_ops import SGB_SPIN_HALF_SITE


def test_heisenberg_l16():
    L = 16
    tt = heisenberg_term_table(L)
    mpo = build_mpo(tt, spec=SGB_SPIN_HALF_SITE)
    assert max(mpo.bond_dims) <= 6   # known-optimal Heisenberg MPO width 5
    sq = [SGB_SPIN_HALF_SITE.quanta(0) for _ in range(L)]
    info = MPSInfo(SGB_GROUP, sq, (0,), 200)
    mps = MPS.random(info)
    e = DMRG(mpo, mps, iprint=0).solve([200], [1e-4, 1e-5, 0], [1e-10],
                                       n_sweeps=8, tol=1e-11)
    assert abs(e - (-6.9117371455749)) < 1e-9

"""MPO direct sums/scaling + energy extrapolation
(reference StackedMPO-style composition; energy-extrapolation workflow)."""

import numpy as np

from block2_preview_tpu.core.expr import qc_term_table, build_term_table, \
    spin_square_raw_terms
from block2_preview_tpu.core.fcidump import FCIDUMP
from block2_preview_tpu.dmrg.extrapolate import extrapolate_energy
from block2_preview_tpu.dmrg.mpo_algebra import mpo_scale, mpo_sum
from block2_preview_tpu.dmrg.mpo_builder import build_mpo
from block2_preview_tpu.dmrg.mps import MPS, MPSInfo
from block2_preview_tpu.dmrg.sweep import DMRG


def _h_and_s2(L=4, u=2.0):
    fd = FCIDUMP.hubbard(L, t=1.0, u=u)
    h = build_mpo(qc_term_table(fd), site_pgs=fd.orb_sym, const_e=fd.const_e)
    s2 = build_mpo(build_term_table(L, spin_square_raw_terms(L)))
    return fd, h, s2


def test_mpo_sum_dense():
    fd, h, s2 = _h_and_s2()
    tot = mpo_sum(h, mpo_scale(s2, 3.0))
    want = h.to_dense() + 3.0 * s2.to_dense()
    assert np.abs(tot.to_dense() - want).max() < 1e-12
    assert max(tot.bond_dims) <= max(h.bond_dims) + max(s2.bond_dims)


def test_mpo_sum_dmrg_penalty():
    """DMRG on H + 5*S^2 targets the singlet as the MPO-level analog of the
    term-level spin penalty."""
    fd, h, s2 = _h_and_s2()
    tot = mpo_sum(h, mpo_scale(s2, 5.0))
    info = MPSInfo(tot.group, tot.site_quanta, (fd.n_elec, 0, 0), 60)
    mps = MPS.random(info)
    e = DMRG(tot, mps, iprint=0).solve([60], [1e-4, 0], [1e-10],
                                       n_sweeps=8, tol=1e-10)
    info2 = MPSInfo(h.group, h.site_quanta, (fd.n_elec, 0, 0), 60)
    e_h = DMRG(h, MPS.random(info2), iprint=0).solve(
        [60], [1e-4, 0], [1e-10], n_sweeps=8, tol=1e-10)
    # singlet ground state: S^2 contributes nothing
    assert abs(e - e_h) < 1e-8


def test_extrapolate_energy():
    rng = np.random.RandomState(0)
    dws = np.array([1e-5, 5e-6, 2e-6, 1e-6])
    e_exact, slope = -7.25, 120.0
    ens = e_exact + slope * dws + rng.normal(0, 1e-9, 4)
    e0, err = extrapolate_energy(dws, ens)
    assert abs(e0 - e_exact) < 1e-6
    assert err >= 0
    e1, err1 = extrapolate_energy([0.0], [-3.0])
    assert e1 == -3.0 and err1 == 0.0

"""End-to-end DMRG energy parity tests (mirrors reference
unit_test/test_dmrg_n2_sto3g.cpp and pyblock2/unit_test/dmrg.py tiers)."""

import numpy as np
import pytest

from block2_preview_tpu.core.fcidump import FCIDUMP
from block2_preview_tpu.core.expr import qc_term_table
from block2_preview_tpu.dmrg.mpo_builder import build_mpo
from block2_preview_tpu.dmrg.mps import MPSInfo, MPS
from block2_preview_tpu.dmrg.sweep import DMRG
from block2_preview_tpu.utils.ed import ground_state_energy


def run_dmrg(fd, bond_dims, noises, n_sweeps=8, backend="numpy", seed=1234):
    tt = qc_term_table(fd)
    mpo = build_mpo(tt, site_pgs=fd.orb_sym, const_e=fd.const_e)
    target = (fd.n_elec, fd.twos, fd.ipg)
    info = MPSInfo(mpo.group, mpo.site_quanta, target, bond_dims[0])
    mps = MPS.random(info, seed=seed)
    dmrg = DMRG(mpo, mps, backend=backend, iprint=0)
    return dmrg.solve(bond_dims, noises, [1e-10], n_sweeps=n_sweeps, tol=1e-11)


def test_dmrg_driver6_vs_block2():
    # block2: DMRG Energy = -2.121631794832947 (tests/driver/test.sh:15)
    fd = FCIDUMP.parse("/root/reference/tests/driver/FCIDUMP")
    e = run_dmrg(fd, [100, 200], [1e-4, 1e-5, 0])
    assert abs(e - (-2.121631794832947)) < 1e-7
    # vs our own ED (exact for this system)
    e_ed = ground_state_energy(qc_term_table(fd), fd.n_elec, fd.twos,
                               fd.const_e)[0]
    assert abs(e - e_ed) < 1e-9


def test_dmrg_hubbard_l8_vs_ed():
    fd = FCIDUMP.parse("/root/reference/data/HUBBARD-L8.FCIDUMP")
    e = run_dmrg(fd, [120], [1e-4, 1e-5, 0])
    e_ed = ground_state_energy(qc_term_table(fd), fd.n_elec, fd.twos,
                               fd.const_e)[0]
    assert abs(e - e_ed) < 1e-8


def test_dmrg_jax_backend_parity():
    fd = FCIDUMP.parse("/root/reference/data/HUBBARD-L6.FCIDUMP")
    e_np = run_dmrg(fd, [80], [1e-4, 0], n_sweeps=5)
    e_jx = run_dmrg(fd, [80], [1e-4, 0], n_sweeps=5, backend="jax")
    assert abs(e_np - e_jx) < 1e-10


@pytest.mark.slow
def test_dmrg_n2_sto3g_vs_block2():
    # block2: -107.654122447525 (main_test/000-check.py:9), D=500
    fd = FCIDUMP.parse("/root/reference/data/N2.STO3G.FCIDUMP")
    e = run_dmrg(fd, [250, 500], [1e-4, 1e-5, 1e-5, 0], n_sweeps=8)
    assert abs(e - (-107.654122447525)) < 1e-8


def test_dmrg_repeated_solve():
    """solve() twice on one engine instance: a solve converging on a
    forward sweep used to leave the right environments consumed, so the
    next solve's forward start hit empty envs (gauge/direction state)."""
    fd = FCIDUMP.hubbard(6, t=1.0, u=4.0)
    tt = qc_term_table(fd)
    mpo = build_mpo(tt, site_pgs=fd.orb_sym, const_e=fd.const_e)
    info = MPSInfo(mpo.group, mpo.site_quanta, (6, 0, 0), 120)
    dmrg = DMRG(mpo, MPS.random(info), iprint=0)
    # odd sweep budget with early convergence -> forward-final state
    e1 = dmrg.solve([120], [1e-4, 1e-5, 0], [1e-10], n_sweeps=7, tol=1e-10)
    e2 = dmrg.solve([120], [0], [1e-10], n_sweeps=2, tol=1e-12)
    assert abs(e1 - e2) < 1e-9, (e1, e2)

"""Core-layer tests: symmetry arithmetic, StateInfo, FCIDUMP parsing, and
exact-diagonalization anchors against block2 reference energies
(mirrors reference unit_test/test_qlabel.cpp, test_matrix.cpp tiers)."""

import numpy as np
import pytest

from block2_preview_tpu.core.symmetry import SZ_GROUP
from block2_preview_tpu.core.state_info import StateInfo
from block2_preview_tpu.core.fcidump import FCIDUMP
from block2_preview_tpu.core.expr import qc_term_table, build_term_table
from block2_preview_tpu.ops.local_ops import CRE_A, DES_A, CRE_B, DES_B
from block2_preview_tpu.utils.ed import ground_state_energy

REF = "/root/reference/data"


def test_symmetry_group():
    g = SZ_GROUP
    a, b = (1, 1, 3), (1, -1, 5)
    assert g.add(a, b) == (2, 0, 6)
    assert g.sub(g.add(a, b), b) == a
    assert g.neg((1, -1, 3)) == (-1, 1, 3)
    assert g.is_fermion((1, 1, 0)) and not g.is_fermion((2, 0, 0))


def test_state_info_product():
    g = SZ_GROUP
    site = StateInfo(g, {(0, 0, 0): 1, (1, 1, 0): 1, (1, -1, 0): 1, (2, 0, 0): 1})
    prod = site.tensor_product(site)
    assert prod[(2, 0, 0)] == 4  # |a,b>, |b,a>, |2,0>, |0,2>
    assert prod.n_states_total == 16
    filt = prod.filter_against(site, (2, 0, 0))
    assert (4, 0, 0) not in filt


def test_fcidump_rhf_parse():
    fd = FCIDUMP.parse(f"{REF}/N2.STO3G.FCIDUMP")
    assert fd.n_sites == 10 and fd.n_elec == 14 and fd.twos == 0
    assert not fd.uhf
    # header symmetric integrals: g2e chemist 8-fold
    assert abs(fd.g2e[0, 0, 0, 0] - 2.3068656644476713) < 1e-14
    assert abs(fd.g2e[0, 1, 0, 0] - (-0.1914404665989671)) < 1e-14
    assert abs(fd.g2e[0, 0, 0, 1] - (-0.1914404665989671)) < 1e-14
    assert np.allclose(fd.orb_sym, [0, 0, 0, 4, 4, 4, 1, 5, 2, 6])


def test_fcidump_uhf_parse():
    fd = FCIDUMP.parse("/root/reference/tests/driver/FCIDUMP")
    assert fd.uhf and fd.n_sites == 6 and fd.n_elec == 4
    ha, hb = fd.h1e
    vaa, vbb, vab = fd.g2e
    assert abs(vaa[0, 0, 0, 0] - 0.5427122672050970) < 1e-14
    assert not np.allclose(vab, vaa)  # distinct spin channels parsed
    assert abs(fd.const_e) > 0 or fd.const_e == 0.0


def test_hubbard_dimer_exact():
    # 2-site Hubbard U=2, t=1, half filling: E0 = (U - sqrt(U^2+16t^2))/2
    fd = FCIDUMP.hubbard(2, u=2.0, t=1.0)
    tt = qc_term_table(fd)
    e = ground_state_energy(tt, n_elec=2, twos=0)[0]
    assert abs(e - (2 - np.sqrt(20)) / 2) < 1e-12


def test_hubbard_l2_fcidump_matches_generator():
    fd = FCIDUMP.parse(f"{REF}/HUBBARD-L2.FCIDUMP")
    tt = qc_term_table(fd)
    e = ground_state_energy(tt, fd.n_elec, fd.twos, fd.const_e)[0]
    fd2 = FCIDUMP.hubbard(2, u=2.0, t=1.0)
    e2 = ground_state_energy(qc_term_table(fd2), 2, 0)[0]
    assert abs(e - e2) < 1e-12


def test_driver_fcidump_ed_vs_block2_reference():
    # block2 reference: DMRG Energy = -2.121631794832947
    # (reference tests/driver/test.sh:15) — 6-orbital UHF integrals, FCI-exact.
    fd = FCIDUMP.parse("/root/reference/tests/driver/FCIDUMP")
    tt = qc_term_table(fd)
    e = ground_state_energy(tt, fd.n_elec, fd.twos, fd.const_e)[0]
    # agreement at 3.5e-8: the reference number is itself a finite-precision
    # DMRG-converged value (sweep_tol 1e-6)
    assert abs(e - (-2.121631794832947)) < 1e-7


def test_term_table_sign_conventions():
    # c+_0a c_1a + h.c. on 2 sites, 1 electron: E0 = -|t| with t=1 hopping
    raw = [(-1.0, [(0, CRE_A), (1, DES_A)]), (-1.0, [(1, CRE_A), (0, DES_A)])]
    tt = build_term_table(2, raw)
    e = ground_state_energy(tt, n_elec=1, twos=1)[0]
    assert abs(e - (-1.0)) < 1e-12
    # anticommutation: c+_0a c+_1a = -c+_1a c+_0a  => sum builds to zero
    raw2 = [(1.0, [(0, CRE_A), (1, CRE_A)]), (1.0, [(1, CRE_A), (0, CRE_A)])]
    tt2 = build_term_table(2, raw2)
    assert len(tt2) == 0

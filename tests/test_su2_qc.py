"""Spin-adapted (SU(2)) quantum-chemistry DMRG parity tests.

References: block2 SU2 universe — src/dmrg/qc_hamiltonian.hpp:629,
src/dmrg/qc_mpo.hpp:1851, src/core/spin_permutation.hpp; reference energies
from unit_test/test_dmrg_n2_sto3g.cpp:191-198 (TestSU2, D=200, tol 1e-7).
"""

import numpy as np
import pytest

from block2_preview_tpu.core.expr import qc_term_table
from block2_preview_tpu.core.fcidump import FCIDUMP
from block2_preview_tpu.dmrg.su2_qc import _pattern_chains, su2_qc_dmrg
from block2_preview_tpu.utils.ed import sector_indices, term_table_to_sparse

N2_FD = "/root/reference/data/N2.STO3G.FCIDUMP"


def test_pattern_factors():
    """Machine-derived recoupling factors match the textbook spin-adapted
    decompositions: sum_s c+_i c_j = -sqrt(2) [C x D]^0 and the two-electron
    singlet/triplet channels (-1, +sqrt(3))."""
    (specs, cum, lam), = _pattern_chains(((0,), (1,)), 2)
    assert specs == (("C", 1, 1), ("D", 1, -1)) and cum == (1, 0)
    assert abs(lam - (-np.sqrt(2.0))) < 1e-12
    chains = _pattern_chains(((0,), (1,), (2,), (3,)), 4)
    lam_by_k2 = {cum[1]: lam for _specs, cum, lam in chains}
    assert abs(lam_by_k2[0] - (-1.0)) < 1e-12
    assert abs(lam_by_k2[2] - np.sqrt(3.0)) < 1e-12


def _random_system(seed, K, orb_sym=None):
    rng = np.random.RandomState(seed)
    h1e = rng.standard_normal((K, K))
    h1e = (h1e + h1e.T) / 2
    g2e = rng.standard_normal((K, K, K, K)) * 0.2
    g2e = g2e + g2e.transpose(1, 0, 2, 3)
    g2e = g2e + g2e.transpose(0, 1, 3, 2)
    g2e = g2e + g2e.transpose(2, 3, 0, 1)
    if orb_sym is not None:
        for i in range(K):
            for j in range(K):
                if orb_sym[i] ^ orb_sym[j]:
                    h1e[i, j] = 0.0
                for k in range(K):
                    for ll in range(K):
                        if orb_sym[i] ^ orb_sym[j] ^ orb_sym[k] ^ orb_sym[ll]:
                            g2e[i, j, k, ll] = 0.0
    return h1e, g2e


def test_su2_qc_random_vs_ed():
    """Full two-electron random integrals: several (N, 2S) sectors vs ED."""
    K = 4
    h1e, g2e = _random_system(3, K)
    fd = FCIDUMP(n_sites=K, n_elec=4, twos=0,
                 orb_sym=np.zeros(K, dtype=np.int64), h1e=h1e, g2e=g2e)
    h = term_table_to_sparse(qc_term_table(fd))
    for (ne, tsz, tj) in ((4, 0, 0), (3, 1, 1), (4, 2, 2)):
        ix = sector_indices(K, ne, tsz)
        e_ed = float(np.linalg.eigvalsh(h[np.ix_(ix, ix)].toarray())[0])
        d = su2_qc_dmrg(h1e, g2e, 0.11, n_elec=ne, twos=tj, bond_dim=80)
        e = d.solve(n_sweeps=8)
        assert abs(e - (e_ed + 0.11)) < 1e-9, (ne, tj, e, e_ed)


def test_su2_qc_point_group():
    """Point-group sectors (N, 2S, pg): ground and pg-excited vs ED."""
    K = 4
    orb_sym = np.array([0, 1, 1, 0])
    h1e, g2e = _random_system(5, K, orb_sym)
    fd = FCIDUMP(n_sites=K, n_elec=4, twos=0, orb_sym=orb_sym,
                 h1e=h1e, g2e=g2e)
    h = term_table_to_sparse(qc_term_table(fd))
    ix = sector_indices(K, 4, 0)
    evals = np.linalg.eigvalsh(h[np.ix_(ix, ix)].toarray())
    d0 = su2_qc_dmrg(h1e, g2e, 0.0, n_elec=4, twos=0, orb_sym=orb_sym,
                     ipg=0, bond_dim=80)
    assert abs(d0.solve(n_sweeps=8) - evals[0]) < 1e-9
    d1 = su2_qc_dmrg(h1e, g2e, 0.0, n_elec=4, twos=0, orb_sym=orb_sym,
                     ipg=1, bond_dim=80)
    e1 = d1.solve(n_sweeps=8)
    assert np.min(np.abs(evals - e1)) < 1e-9
    assert e1 > evals[0] + 1e-6


def test_su2_qc_hubbard():
    """Hubbard L=4 through the generic QC term compiler vs ED."""
    fd = FCIDUMP.hubbard(4, t=1.0, u=2.0)
    h = term_table_to_sparse(qc_term_table(fd))
    ix = sector_indices(4, 4, 0)
    e_ed = float(np.linalg.eigvalsh(h[np.ix_(ix, ix)].toarray())[0])
    d = su2_qc_dmrg(fd.h1e, fd.g2e, 0.0, n_elec=4, twos=0, bond_dim=60)
    assert abs(d.solve(n_sweeps=6) - e_ed) < 1e-9


@pytest.mark.slow
def test_su2_qc_n2_sto3g_ground():
    """N2/STO-3G singlet Ag ground state (reference
    unit_test/test_dmrg_n2_sto3g.cpp:191 and main_test/000-check.py:9)."""
    fd = FCIDUMP.parse(N2_FD)
    d = su2_qc_dmrg(fd.h1e, fd.g2e, fd.const_e, n_elec=fd.n_elec, twos=0,
                    orb_sym=fd.orb_sym, ipg=0, bond_dim=500)
    e = d.solve(n_sweeps=8, tol=1e-11, dav_thrds=[1e-12])
    assert abs(e - (-107.654122447525)) < 1e-8


@pytest.mark.slow
def test_su2_qc_n2_sto3g_spin_states():
    """N2/STO-3G triplet Ag and quintet Ag (spin-pure targets, impossible
    in the abelian engine without S^2 penalties; reference
    unit_test/test_dmrg_n2_sto3g.cpp:191 energies[0][1..2])."""
    fd = FCIDUMP.parse(N2_FD)
    for tj, ref in ((2, -106.939132859668), (4, -107.031449471627)):
        d = su2_qc_dmrg(fd.h1e, fd.g2e, fd.const_e, n_elec=fd.n_elec,
                        twos=tj, orb_sym=fd.orb_sym, ipg=0, bond_dim=500)
        e = d.solve(n_sweeps=12, tol=1e-11,
                    noises=[1e-4, 1e-4, 1e-5, 1e-6, 0.0], dav_thrds=[1e-12])
        assert abs(e - ref) < 1e-8, (tj, e, ref)


@pytest.mark.slow
def test_su2_qc_n2_sto3g_irrep():
    """N2/STO-3G spatially-excited singlet: our MOLPRO-1 XOR label 5 (B2g)
    corresponds to block2's Cotton-order label 2 (reference
    unit_test/test_dmrg_n2_sto3g.cpp:193 energies[2][0])."""
    fd = FCIDUMP.parse(N2_FD)
    d = su2_qc_dmrg(fd.h1e, fd.g2e, fd.const_e, n_elec=fd.n_elec, twos=0,
                    orb_sym=fd.orb_sym, ipg=5, bond_dim=500)
    e = d.solve(n_sweeps=12, tol=1e-11,
                noises=[1e-4, 1e-4, 1e-5, 1e-6, 0.0], dav_thrds=[1e-12])
    assert abs(e - (-107.306744734756)) < 1e-8


def test_su2_driver_mode():
    """DMRGDriver(symm_type=SU2): spin-adapted QC DMRG through the standard
    driver API (reference pyblock2 core.py:287 Block2Wrapper SU2 mode)."""
    from block2_preview_tpu.driver.core import DMRGDriver, SymmetryTypes
    drv = DMRGDriver(symm_type=SymmetryTypes.SU2)
    fd = drv.read_fcidump("/root/reference/data/HUBBARD-L8.FCIDUMP")
    mpo = drv.get_qc_mpo(fcidump=fd)
    ket = drv.get_random_mps(100)
    e = drv.dmrg(mpo, ket, bond_dims=[100], noises=[0.0], thrds=[1e-10],
                 n_sweeps=8, iprint=0)
    # SZ-mode value for the same system (cross-engine parity)
    drv2 = DMRGDriver()
    fd2 = drv2.read_fcidump("/root/reference/data/HUBBARD-L8.FCIDUMP")
    e2 = drv2.dmrg(drv2.get_qc_mpo(fcidump=fd2), drv2.get_random_mps(200),
                   bond_dims=[200], noises=[1e-5, 0.0], thrds=[1e-10],
                   n_sweeps=8, iprint=0)
    assert abs(e - e2) < 1e-8, (e, e2)

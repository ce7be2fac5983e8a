"""Coupled-cluster tests (reference pyblock2/cc tier): CCSD is exact for
two-electron systems; RHF/MP2/CCSD hierarchy on Hubbard chains."""

import numpy as np

from block2_preview_tpu.cc.gccsd import gccsd
from block2_preview_tpu.core.expr import qc_term_table
from block2_preview_tpu.core.fcidump import FCIDUMP
from block2_preview_tpu.uc.mp import canonicalize_fcidump, mp2_energy, rhf
from block2_preview_tpu.utils.ed import ground_state_energy


def test_ccsd_two_electron_exact():
    for u in (0.5, 2.0, 4.0):
        fd = FCIDUMP.hubbard(4, u=u, t=1.0, n_elec=2)
        fd2 = canonicalize_fcidump(fd)
        e_hf, e_cc = gccsd(fd2)
        e_fci = ground_state_energy(qc_term_table(fd), 2, 0)[0]
        assert abs(e_hf + e_cc - e_fci) < 1e-7


def test_hierarchy_hf_mp2_ccsd():
    fd = FCIDUMP.hubbard(4, u=2.0, t=1.0, n_elec=4)
    fd2 = canonicalize_fcidump(fd)
    e_hf, e2 = mp2_energy(fd2)
    e_hf2, e_cc = gccsd(fd2)
    e_fci = ground_state_energy(qc_term_table(fd), 4, 0)[0]
    assert abs(e_hf - e_hf2) < 1e-10
    assert e_hf > e_fci                      # HF above FCI
    assert e2 < 0 and e_cc < 0               # negative correlation energies
    # CCSD captures most of the correlation energy
    assert abs((e_hf + e_cc) - e_fci) < 0.05 * abs(e_hf - e_fci)


def test_rhf_idempotent_on_canonical():
    fd = canonicalize_fcidump(FCIDUMP.hubbard(4, u=2.0, t=1.0, n_elec=4))
    e1, c1 = rhf(fd)
    # already canonical: energy stable, orbitals ~identity up to phase
    e2, c2 = rhf(fd)
    assert abs(e1 - e2) < 1e-10


def test_ccsd_t_vanishes_for_two_electrons():
    from block2_preview_tpu.cc.gccsd import ccsd_t
    fd2 = canonicalize_fcidump(FCIDUMP.hubbard(4, u=2.0, t=1.0, n_elec=2))
    e_hf, e_cc, e_t = ccsd_t(fd2)
    assert abs(e_t) < 1e-12        # no triples with 2 electrons
    fd = FCIDUMP.hubbard(4, u=1.0, t=1.0, n_elec=4)
    fd2 = canonicalize_fcidump(fd)
    e_hf, e_cc, e_t = ccsd_t(fd2)
    assert abs(e_t) < 0.1 * abs(e_cc)   # small perturbative correction

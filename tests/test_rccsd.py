"""RCCSD/UCCSD drivers (reference pyblock2/cc/rccsd.py, uccsd.py)."""

import numpy as np

from block2_preview_tpu.cc.gccsd import gccsd
from block2_preview_tpu.cc.rccsd import rccsd, rccsd_t, uccsd
from block2_preview_tpu.core.expr import qc_term_table
from block2_preview_tpu.core.fcidump import FCIDUMP
from block2_preview_tpu.uc.mp import canonicalize_fcidump
from block2_preview_tpu.utils.ed import ground_state_energy


def test_rccsd_closed_shell():
    fd = FCIDUMP.hubbard(4, t=1.0, u=1.0)
    fd = canonicalize_fcidump(fd)
    e_hf, e_corr, t1, t2 = rccsd(fd, return_amplitudes=True)
    e_hf2, e_corr2 = gccsd(fd)
    assert abs(e_hf - e_hf2) < 1e-10
    assert abs(e_corr - e_corr2) < 1e-10
    assert t1.shape == (2, 2) and t2.shape == (2, 2, 2, 2)
    # two-electron limit: CCSD exact
    fd2 = FCIDUMP.hubbard(3, t=1.0, u=2.0)
    fd2.n_elec = 2
    fd2 = canonicalize_fcidump(fd2)
    e_hf3, e_c3 = rccsd(fd2)
    e_fci = ground_state_energy(qc_term_table(fd2), 2, 0)[0] \
        + fd2.const_e
    assert abs((e_hf3 + e_c3) - e_fci) < 1e-8


def test_uccsd_uhf_sections():
    """UHF-sectioned integrals built from an RHF dump reproduce the
    restricted result."""
    fd = canonicalize_fcidump(FCIDUMP.hubbard(4, t=1.0, u=1.0))
    ufd = FCIDUMP(n_sites=4, n_elec=4, twos=0, ipg=0, orb_sym=None,
                  h1e=(fd.h1e.copy(), fd.h1e.copy()),
                  g2e=(fd.g2e.copy(), fd.g2e.copy(), fd.g2e.copy()),
                  const_e=fd.const_e, uhf=True)
    e_hf_u, e_corr_u = uccsd(ufd)
    e_hf_r, e_corr_r = gccsd(fd)
    assert abs(e_hf_u - e_hf_r) < 1e-9
    assert abs(e_corr_u - e_corr_r) < 1e-8


def test_rccsd_t_triples():
    fd = canonicalize_fcidump(FCIDUMP.hubbard(4, t=1.0, u=1.5))
    e_hf, e_corr, e_t = rccsd_t(fd)
    assert e_t <= 1e-12    # (T) lowers (or leaves) the energy
    assert abs(e_t) < abs(e_corr)

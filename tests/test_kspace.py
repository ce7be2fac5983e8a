"""K-point symmetry (SZK analog) tests: momentum-space Hubbard DMRG must be
unitarily equivalent to real-space PBC (reference symmetry.hpp:738 SZKLong,
hubbard.hpp:81 HubbardKSpaceFCIDUMP)."""

import numpy as np

from block2_preview_tpu.core.expr import (build_term_table, qc_raw_terms,
                                          qc_term_table)
from block2_preview_tpu.core.fcidump import FCIDUMP
from block2_preview_tpu.dmrg.mpo_builder import build_mpo
from block2_preview_tpu.dmrg.mps import MPS, MPSInfo
from block2_preview_tpu.dmrg.sweep import DMRG
from block2_preview_tpu.models.hubbard import hubbard_kspace
from block2_preview_tpu.utils.ed import ground_state_energy


def test_kspace_hubbard_vs_realspace_pbc():
    L = 6
    fd, group, site_quanta, target = hubbard_kspace(L, u=2.0, t=1.0)
    raw = qc_raw_terms(fd, cutoff=1e-13, pg_mode=L)
    tt = build_term_table(L, raw, group=group)
    mpo = build_mpo(tt, const_e=fd.const_e, site_quanta=site_quanta)
    info = MPSInfo(group, site_quanta, target, 200)
    mps = MPS.random(info)
    e = DMRG(mpo, mps, iprint=0).solve([200], [1e-4, 1e-5, 0], [1e-10],
                                       n_sweeps=8, tol=1e-11)
    h1 = np.zeros((L, L))
    for i in range(L):
        h1[i, (i + 1) % L] = h1[(i + 1) % L, i] = -1.0
    g2 = np.zeros((L,) * 4)
    for i in range(L):
        g2[i, i, i, i] = 2.0
    fd_rs = FCIDUMP(n_sites=L, n_elec=L, twos=0,
                    orb_sym=np.zeros(L, dtype=np.int64), h1e=h1, g2e=g2)
    e_ed = ground_state_energy(qc_term_table(fd_rs), L, 0)[0]
    assert abs(e - e_ed) < 1e-8

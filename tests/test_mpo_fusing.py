"""CondensedMPO + ArchivedMPO (dmrg/mpo_fusing.py).

Reference: mpo_fusing.hpp:475 CondensedMPO, archived_mpo.hpp:40 ArchivedMPO.
Anchors: dense contraction invariance under condensing; archived MPO drives
a full DMRG solve to the same energy with only a 2-site resident window.
"""

import numpy as np

from block2_preview_tpu.core.expr import qc_term_table
from block2_preview_tpu.dmrg.mpo_builder import build_mpo
from block2_preview_tpu.dmrg.mpo_fusing import archive_mpo, condense_mpo
from block2_preview_tpu.dmrg.mps import MPS, MPSInfo
from block2_preview_tpu.dmrg.sweep import DMRG
from block2_preview_tpu.models.hubbard import hubbard_fcidump


def _mpo(L=4, u=2.0):
    fd = hubbard_fcidump(L, u=u)
    return fd, build_mpo(qc_term_table(fd), const_e=fd.const_e)


def test_condense_dense_invariance():
    _fd, mpo = _mpo(4)
    h_ref = mpo.to_dense()
    for t in (0, 1, 2):
        m2 = condense_mpo(mpo, t)
        assert m2.n_sites == 3
        assert len(m2.site_quanta[t]) == 16
        assert np.abs(m2.to_dense() - h_ref).max() < 1e-12
    # condense twice
    m3 = condense_mpo(condense_mpo(mpo, 0), 0)
    assert m3.n_sites == 2
    assert np.abs(m3.to_dense() - h_ref).max() < 1e-12


def test_archived_mpo_dmrg(tmp_path):
    fd, mpo = _mpo(6)
    info = MPSInfo(mpo.group, mpo.site_quanta,
                   (fd.n_elec, fd.twos, fd.ipg), 120)
    mps = MPS.random(info, seed=7)
    e_ref = DMRG(mpo, mps, iprint=0).solve([120], [1e-5, 0], [1e-10],
                                           n_sweeps=6, tol=1e-12)

    amo = archive_mpo(mpo, str(tmp_path / "mpo"), window=2)
    assert len(amo.tensors._lru) <= 2
    mps2 = MPS.random(info, seed=7)
    e_arch = DMRG(amo, mps2, iprint=0).solve([120], [1e-5, 0], [1e-10],
                                             n_sweeps=6, tol=1e-12)
    assert abs(e_arch - e_ref) < 1e-10
    assert len(amo.tensors._lru) <= 2

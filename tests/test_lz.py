"""SZLZ mode: plain-integer additive orbital symmetry (Lz).

Reference: SZLZ quantum numbers (src/core/symmetry.hpp:864), LZ FCIDUMPs
carrying KSYM/KMOD header lines (data/C2.PVDZ.FCIDUMP.C2LZ).  Anchors:
DMRG in each Lz sector of an artificial lz-conserving Hamiltonian matches
exact diagonalization restricted to that sector (Lz is diagonal in the
product basis: Lz = sum_p lz_p n_p); the C2 fixture's labels are validated
against its integrals.
"""

import numpy as np
import pytest

from block2_preview_tpu.core.expr import build_term_table, qc_raw_terms
from block2_preview_tpu.core.fcidump import FCIDUMP
from block2_preview_tpu.dmrg.mpo_builder import build_mpo
from block2_preview_tpu.dmrg.mps import MPS, MPSInfo
from block2_preview_tpu.dmrg.sweep import DMRG
from block2_preview_tpu.models.qc import lz_system
from block2_preview_tpu.utils.ed import sector_indices, term_table_to_sparse


def _lz_conserving_fcidump(seed=5):
    """4 orbitals with lz = [0, 1, -1, 0]; random 8-fold-symmetric
    integrals with every lz-violating entry zeroed."""
    rng = np.random.RandomState(seed)
    L = 4
    lz = np.array([0, 1, -1, 0])
    h1 = rng.standard_normal((L, L)) * 0.5
    h1 = (h1 + h1.T) / 2
    g = rng.standard_normal((L,) * 4) * 0.2
    # chemist 8-fold symmetry
    g = g + g.transpose(1, 0, 2, 3) + g.transpose(0, 1, 3, 2) \
        + g.transpose(1, 0, 3, 2)
    g = g + g.transpose(2, 3, 0, 1)
    for i in range(L):
        for j in range(L):
            if lz[i] != lz[j]:
                h1[i, j] = 0.0
            for k in range(L):
                for l in range(L):
                    if lz[i] - lz[j] + lz[k] - lz[l] != 0:
                        g[i, j, k, l] = 0.0
    fd = FCIDUMP(n_sites=L, n_elec=4, twos=0,
                 orb_sym=np.zeros(L, dtype=np.int64), h1e=h1, g2e=g,
                 k_sym=lz, k_mod=0)
    return fd, lz


@pytest.mark.parametrize("target_lz", [0, 1, -1])
def test_lz_dmrg_matches_sector_ed(target_lz):
    fd, lz = _lz_conserving_fcidump()
    group, site_quanta, target, pg_mode = lz_system(fd, target_lz=target_lz)
    raw = qc_raw_terms(fd, pg_mode=pg_mode)
    tt = build_term_table(fd.n_sites, raw, group=group)
    mpo = build_mpo(tt, const_e=fd.const_e, site_quanta=site_quanta)

    # ED with no symmetry filter, restricted to (N, 2Sz, Lz) rows
    raw_all = qc_raw_terms(fd, pg_mode="none")
    tt_all = build_term_table(fd.n_sites, raw_all)
    h = term_table_to_sparse(tt_all)
    ix = sector_indices(fd.n_sites, fd.n_elec, fd.twos)
    # per-basis-state Lz (diagonal)
    L = fd.n_sites
    st = np.zeros((len(ix), L), dtype=np.int64)
    rem = ix.copy()
    for t in range(L - 1, -1, -1):
        st[:, t] = rem % 4
        rem //= 4
    occ = np.array([0, 1, 1, 2])
    lz_tot = (occ[st] * lz[None, :]).sum(axis=1)
    rows = ix[lz_tot == target_lz]
    w = np.linalg.eigvalsh(h[np.ix_(rows, rows)].toarray())
    e_ed = w[0]

    info = MPSInfo(group, site_quanta, target, 200)
    mps = MPS.random(info)
    dmrg = DMRG(mpo, mps, iprint=0)
    e = dmrg.solve([200], [1e-5, 0], [1e-10], n_sweeps=8, tol=1e-12)
    assert abs(e - e_ed) < 1e-8


@pytest.mark.slow
def test_c2_lz_fixture_labels_consistent():
    """The C2 LZ fixture's KSYM labels must be conserved by its integrals."""
    fd = FCIDUMP.parse("/root/reference/data/C2.PVDZ.FCIDUMP.C2LZ")
    assert fd.k_sym is not None and fd.k_mod == 0
    lz = fd.k_sym
    d = lz[:, None] - lz[None, :]
    viol = np.abs(fd.h1e)[d != 0]
    assert viol.max() < 1e-9 if viol.size else True
    d4 = (lz[:, None, None, None] - lz[None, :, None, None]
          + lz[None, None, :, None] - lz[None, None, None, :])
    viol4 = np.abs(fd.g2e)[d4 != 0]
    assert viol4.max() < 1e-9


@pytest.mark.slow
def test_kmod_roundtrip_parse(tmp_path):
    fd, lz = _lz_conserving_fcidump()
    group, site_quanta, target, pg_mode = lz_system(fd)
    assert pg_mode == "lz"
    assert group.kinds[2] == "u1"

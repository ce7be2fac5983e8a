"""SZ -> SGF MPS transform (reference pyblock2 trans_mps tools)."""

from itertools import product

import numpy as np

from block2_preview_tpu.core.expr import qc_raw_terms_sgf, build_term_table, \
    qc_term_table
from block2_preview_tpu.core.fcidump import FCIDUMP
from block2_preview_tpu.core.symmetry import SGF_GROUP, SZ_GROUP
from block2_preview_tpu.dmrg.determinant import det_coefficient
from block2_preview_tpu.dmrg.expect import mpo_expectation, mps_overlap
from block2_preview_tpu.dmrg.mpo_builder import build_mpo
from block2_preview_tpu.dmrg.mps import MPS, MPSInfo
from block2_preview_tpu.dmrg.sweep import DMRG
from block2_preview_tpu.ops.local_ops import SGF_SITE, SZ_SITE
from block2_preview_tpu.utils.transform import sz_to_sgf_mps

L = 4


def test_sz_to_sgf_det_coefficients():
    sq = [SZ_SITE.quanta(0) for _ in range(L)]
    info = MPSInfo(SZ_GROUP, sq, (2, 0, 0), 10)
    mps = MPS.random(info, seed=5)
    sgf = sz_to_sgf_mps(mps)
    assert abs(mps_overlap(sgf, sgf) - mps_overlap(mps, mps)) < 1e-10
    # SZ physical state -> (alpha, beta) via quanta
    ab = []
    for q in sq[0]:
        n, tsz = q[0], q[1]
        ab.append((0, 0) if n == 0 else (1, 1) if n == 2
                  else ((1, 0) if tsz > 0 else (0, 1)))
    for occ in product(range(4), repeat=L):
        c_sz = det_coefficient(mps, occ)
        occ2 = []
        for p in occ:
            occ2 += list(ab[p])
        c_sgf = det_coefficient(sgf, occ2)
        assert abs(c_sz - c_sgf) < 1e-10, (occ, c_sz, c_sgf)


def test_sz_to_sgf_energy():
    """Ground state found in SZ mode has the same energy through the SGF
    Hamiltonian after the transform."""
    fd = FCIDUMP.hubbard(L, t=1.0, u=2.0)
    mpo = build_mpo(qc_term_table(fd), site_pgs=fd.orb_sym)
    info = MPSInfo(SZ_GROUP, mpo.site_quanta, (L, 0, 0), 60)
    d = DMRG(mpo, MPS.random(info), iprint=0)
    e_sz = d.solve([60], [1e-4, 0], [1e-10], n_sweeps=8, tol=1e-10)
    sgf = sz_to_sgf_mps(d.mps)
    # spin-orbital Hamiltonian in the interleaved (alpha, beta) ordering
    from block2_preview_tpu.ops.local_ops import CRE_A, DES_A
    from block2_preview_tpu.uc.mp import spin_orbital_integrals
    h1, v = spin_orbital_integrals(fd)
    n = 2 * L
    raw = []
    for p in range(n):
        for q in range(n):
            if abs(h1[p, q]) > 1e-14:
                raw.append((h1[p, q], [(p, CRE_A), (q, DES_A)]))
    for p in range(n):
        for q in range(n):
            for r in range(n):
                for s in range(n):
                    if abs(v[p, q, r, s]) > 1e-14:
                        raw.append((0.25 * v[p, q, r, s],
                                    [(p, CRE_A), (q, CRE_A),
                                     (s, DES_A), (r, DES_A)]))
    tt = build_term_table(n, raw, group=SGF_GROUP, spec=SGF_SITE)
    mpo_sgf = build_mpo(tt, spec=SGF_SITE)
    e_sgf = mpo_expectation(mpo_sgf, sgf) / mps_overlap(sgf, sgf)
    assert abs(e_sgf - e_sz) < 1e-8, (e_sgf, e_sz)

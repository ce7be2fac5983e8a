"""Stochastic perturbative DMRG (Epstein-Nesbet E2 on a truncated MPS)
(reference src/sp_dmrg/stochastic_pdmrg.hpp, pyblock2/driver/stopt.py)."""

from itertools import product

import numpy as np

from block2_preview_tpu.core.expr import qc_term_table
from block2_preview_tpu.core.fcidump import FCIDUMP
from block2_preview_tpu.dmrg.mpo_builder import build_mpo
from block2_preview_tpu.dmrg.mps import MPS, MPSInfo
from block2_preview_tpu.dmrg.sweep import DMRG
from block2_preview_tpu.sp_dmrg import StochasticPDMRG
from block2_preview_tpu.utils.ed import sector_indices, term_table_to_sparse

U = 4.0


def _setup(L, bond_dim):
    fd = FCIDUMP.hubbard(L, t=1.0, u=U)
    tt = qc_term_table(fd)
    mpo = build_mpo(tt, site_pgs=fd.orb_sym)
    info = MPSInfo(mpo.group, mpo.site_quanta, (L, 0, 0), bond_dim)
    d = DMRG(mpo, MPS.random(info), iprint=0)
    e0 = d.solve([bond_dim], [1e-4, 1e-5, 0], [1e-10], n_sweeps=8, tol=1e-10)
    return fd, tt, d.mps, e0


def _sector_dets(L):
    from block2_preview_tpu.ops.local_ops import SZ_SITE
    q = SZ_SITE.quanta(0)
    dets = []
    for occ in product(range(4), repeat=L):
        n = sum(q[p][0] for p in occ)
        tsz = sum(q[p][1] for p in occ)
        if n == L and tsz == 0:
            dets.append(occ)
    return dets


def test_det_h_psi_vs_ed():
    L = 4
    fd, tt, mps, e0 = _setup(L, 8)
    h = term_table_to_sparse(tt).toarray()
    sp = StochasticPDMRG(mps, tt, e0=e0)
    # dense psi vector
    dim = 4 ** L
    from block2_preview_tpu.dmrg.determinant import det_coefficient
    v = np.array([det_coefficient(mps, occ)
                  for occ in product(range(4), repeat=L)])
    rng = np.random.RandomState(0)
    for _ in range(6):
        occ = tuple(rng.randint(0, 4, L))
        ix = int(np.ravel_multi_index(occ, (4,) * L))
        assert abs(sp.det_h_psi(occ) - h[ix] @ v) < 1e-10
        assert abs(sp.det_h_diag(occ) - h[ix, ix]) < 1e-10


def test_pt2_dense_parity():
    """Deterministic E2 equals the same Epstein-Nesbet formula evaluated
    densely from the determinant expansion."""
    L = 6
    fd, tt, mps, e0 = _setup(L, 8)   # deliberately truncated
    h = term_table_to_sparse(tt)
    ix = sector_indices(L, L, 0)
    e_fci = float(np.linalg.eigvalsh(h[np.ix_(ix, ix)].toarray())[0])
    assert e0 > e_fci + 1e-8      # truncation error present
    sp = StochasticPDMRG(mps, tt, e0=e0)
    e2 = sp.pt2_deterministic(_sector_dets(L))
    assert e2 < 0
    from block2_preview_tpu.dmrg.determinant import det_coefficient
    hd = h.toarray()
    v = np.array([det_coefficient(mps, occ)
                  for occ in product(range(4), repeat=L)])
    res = hd @ v - e0 * v
    e2_dense = 0.0
    for occ in _sector_dets(L):
        k = int(np.ravel_multi_index(occ, (4,) * L))
        e2_dense += res[k] ** 2 / (e0 - hd[k, k])
    assert abs(e2 - e2_dense) < 1e-10, (e2, e2_dense)


def test_pt2_vanishes_for_exact_mps():
    L = 4
    fd, tt, mps, e0 = _setup(L, 40)  # D=40 >= FCI bond: exact
    sp = StochasticPDMRG(mps, tt, e0=e0)
    e2 = sp.pt2_deterministic(_sector_dets(L))
    assert abs(e2) < 1e-8


def test_pt2_stochastic_matches_deterministic():
    """Importance sampling from a compressed H|psi0> proposal (the
    low-variance scheme) agrees with the exact determinant sum."""
    L = 6
    fd, tt, mps, e0 = _setup(L, 8)
    sp = StochasticPDMRG(mps, tt, e0=e0)
    e2_det = sp.pt2_deterministic(_sector_dets(L))
    # proposal = fit of the residual (H - e0)|psi0>: its amplitudes ARE the
    # numerator, so the importance weights are bounded
    from block2_preview_tpu.dmrg.linear import Linear, identity_mpo
    mpo = build_mpo(tt, site_pgs=fd.orb_sym)
    prop = MPS.random(MPSInfo(mpo.group, mpo.site_quanta, (L, 0, 0), 100),
                      seed=77)
    Linear(prop, [(mpo, mps), (identity_mpo(mpo), mps)],
           coeffs=[1.0, -e0]).solve(100, n_sweeps=10)
    est, err = sp.pt2_sample(1200, seed=11, proposal=prop)
    assert abs(est - e2_det) < max(5 * err, 5e-4), (est, err, e2_det)

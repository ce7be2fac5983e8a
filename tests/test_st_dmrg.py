"""ST-DMRG Hbar construction (reference SimilarityTransform,
pyblock2/driver/core.py:9580): e0 == E_CCSD; singles/doubles residual
matrix elements of the 2-body-truncated Hbar vanish at converged T."""

import itertools

import numpy as np

from block2_preview_tpu.cc.gccsd import gccsd
from block2_preview_tpu.core.fcidump import FCIDUMP
from block2_preview_tpu.ic.st_dmrg import hbar_integrals
from block2_preview_tpu.uc.mp import canonicalize_fcidump, \
    hf_energy_and_fock, spin_orbital_integrals


def _dense_fock_op(nso, e0, h1, v2):
    """Dense matrix of e0 + sum h1 P+Q + 1/4 v2 P+Q+SR over the full
    spin-orbital Fock space (bitmask basis)."""
    dim = 1 << nso
    H = np.zeros((dim, dim))
    H += e0 * np.eye(dim)

    def parity_below(state, p):
        return (-1) ** bin(state & ((1 << p) - 1)).count("1")

    for P in range(nso):
        for Q in range(nso):
            if h1[P, Q] == 0.0:
                continue
            for st in range(dim):
                if not (st >> Q) & 1:
                    continue
                s1 = st & ~(1 << Q)
                sgn = parity_below(st, Q)
                if (s1 >> P) & 1:
                    continue
                s2 = s1 | (1 << P)
                sgn *= parity_below(s1, P)
                H[s2, st] += sgn * h1[P, Q]
    nz = np.nonzero(np.abs(v2) > 1e-14)
    for P, Q, R, S in zip(*nz):
        val = 0.25 * v2[P, Q, R, S]
        for st in range(dim):
            # P+ Q+ S R
            if not (st >> R) & 1:
                continue
            s1 = st & ~(1 << R)
            sgn = parity_below(st, R)
            if not (s1 >> S) & 1:
                continue
            s2 = s1 & ~(1 << S)
            sgn *= parity_below(s1, S)
            if (s2 >> Q) & 1:
                continue
            s3 = s2 | (1 << Q)
            sgn *= parity_below(s2, Q)
            if (s3 >> P) & 1:
                continue
            s4 = s3 | (1 << P)
            sgn *= parity_below(s3, P)
            H[s4, st] += sgn * val
    return H


def test_hbar_anchors():
    fd = FCIDUMP.hubbard(3, t=1.0, u=1.5)
    fd.n_elec = 2
    fd = canonicalize_fcidump(fd)
    h_bare, _v0 = spin_orbital_integrals(fd)
    e_hf, f, v = hf_energy_and_fock(fd)
    e_hf2, e_corr, t1, t2 = gccsd(fd, return_amplitudes=True)
    nso = 2 * fd.n_sites
    occ = np.arange(fd.n_elec)
    vir = np.arange(fd.n_elec, nso)
    # T = 0 invariant: quasi-normal H converts exactly back to plain H
    z1 = np.zeros_like(t1.T)
    z2 = np.zeros_like(t2.transpose(2, 3, 0, 1))
    e00, h10, v20 = hbar_integrals(nso, occ, vir, f, v, z1, z2,
                                   e_ref=e_hf - fd.const_e)
    assert abs(e00) < 1e-9
    assert np.allclose(h10, h_bare, atol=1e-10)
    assert np.allclose(v20, v, atol=1e-10)
    e0, h1, v2 = hbar_integrals(nso, occ, vir, f, v,
                                t1.T.copy(),
                                t2.transpose(2, 3, 0, 1).copy(),
                                e_ref=e_hf - fd.const_e)
    # anchor 1: the connected 0-body part is exactly E_corr; the
    # reference-determinant expectation of the plain-form Hbar_12 is
    # E_CCSD (checked on the dense operator below)
    e_ref = e_hf2 + e_corr - fd.const_e
    # anchor 2: CC residual matrix elements vanish
    Hd = _dense_fock_op(nso, e0, h1, v2)
    phi = 0
    for i in range(fd.n_elec):
        phi |= 1 << i
    assert abs(Hd[phi, phi] - e_ref) < 1e-9, (Hd[phi, phi], e_ref)
    for i in occ:
        for a in vir:
            st = (phi & ~(1 << i)) | (1 << a)
            assert abs(Hd[st, phi]) < 1e-7, (i, a, Hd[st, phi])
    for i, j in itertools.combinations(occ, 2):
        for a, b in itertools.combinations(vir, 2):
            st = (phi & ~(1 << i) & ~(1 << j)) | (1 << a) | (1 << b)
            assert abs(Hd[st, phi]) < 1e-7, (i, j, a, b)
    # anchor 3: the ground right-eigenvalue in the N-particle sector is
    # near the CCSD energy (exactly E_CCSD when CCSD is exact)
    ns = np.array([bin(s).count("1") for s in range(1 << nso)])
    rows = np.nonzero(ns == fd.n_elec)[0]
    w = np.linalg.eigvals(Hd[np.ix_(rows, rows)])
    w = np.sort(w.real)
    assert abs(w[0] - e_ref) < 5e-2


def test_st_dmrg_end_to_end():
    """Full ST-DMRG vs dense right-eigenvalue of the same Hbar_12."""
    import itertools as it

    from block2_preview_tpu.cc.gccsd import gccsd
    from block2_preview_tpu.ic.st_dmrg import hbar_integrals, st_dmrg
    from block2_preview_tpu.uc.mp import hf_energy_and_fock

    fd = FCIDUMP.hubbard(3, t=1.0, u=1.5)
    fd.n_elec = 2
    fd = canonicalize_fcidump(fd)
    e_st, e_cc, e0 = st_dmrg(fd, bond_dim=100, n_sweeps=8)
    # dense reference: right eigvalsh of Hbar_12 in the N sector
    e_hf, f, v = hf_energy_and_fock(fd)
    _eh, _ec, t1, t2 = gccsd(fd, return_amplitudes=True)
    nso = 2 * fd.n_sites
    occ = np.arange(2)
    vir = np.arange(2, nso)
    e0x, h1, v2 = hbar_integrals(nso, occ, vir, f, v, t1.T.copy(),
                                 t2.transpose(2, 3, 0, 1).copy(),
                                 e_ref=e_hf - fd.const_e)
    Hd = _dense_fock_op(nso, e0x, h1, v2)
    ns = np.array([bin(s).count("1") for s in range(1 << nso)])
    rows = np.nonzero(ns == fd.n_elec)[0]
    w = np.sort(np.linalg.eigvals(Hd[np.ix_(rows, rows)]).real)
    assert abs(e_st - (w[0] + fd.const_e)) < 1e-6, (e_st, w[0])
    # CCSD exact for 2 electrons: ST energy ~ E_CCSD
    assert abs(e_st - e_cc) < 5e-2

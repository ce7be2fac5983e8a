"""Two-step SI-SOC (reference SOCDMRGDriver.soc_two_step,
pyblock2/driver/core.py:8192): reconstruct every magnetic component of
the SOC state-interaction matrix from ONE reduced triplet transition
density per root pair via Wigner-Eckart, and compare against the
brute-force determinant-space <S_b M_b|H_SO|S_k M_k> over explicitly
constructed multiplet components (phases fixed by S^- lowering)."""

import numpy as np

from block2_preview_tpu.core.clebsch_gordan import clebsch_gordan
from block2_preview_tpu.core.expr import build_term_table, qc_raw_terms
from block2_preview_tpu.dmrg.soc import _spherical_coeffs, soc_two_step
from block2_preview_tpu.models.hubbard import hubbard_fcidump
from block2_preview_tpu.ops.local_ops import CRE_A, CRE_B, DES_A, DES_B
from block2_preview_tpu.utils.ed import term_table_to_sparse

L = 3


def _op(i, ei, j, ej):
    return term_table_to_sparse(build_term_table(
        L, [(1.0, [(i, ei), (j, ej)])])).toarray()


def _tensor_comp(q):
    """Dense T^{1,q}_pq matrices, indexed [p][q]."""
    out = np.empty((L, L), dtype=object)
    for p in range(L):
        for r in range(L):
            if q == +1:
                out[p, r] = -_op(p, CRE_A, r, DES_B)
            elif q == -1:
                out[p, r] = _op(p, CRE_B, r, DES_A)
            else:
                out[p, r] = (_op(p, CRE_A, r, DES_A)
                             - _op(p, CRE_B, r, DES_B)) / np.sqrt(2.0)
    return out


def test_soc_two_step_vs_brute_force():
    rng = np.random.RandomState(7)
    fd = hubbard_fcidump(L, u=2.0, t=1.0)
    tt = build_term_table(L, qc_raw_terms(fd, cutoff=1e-13))
    h = term_table_to_sparse(tt).toarray()

    # diagonal N and Sz to block the Fock space
    nmat = sum(_op(p, CRE_A, p, DES_A) + _op(p, CRE_B, p, DES_B)
               for p in range(L))
    szmat = sum(_op(p, CRE_A, p, DES_A) - _op(p, CRE_B, p, DES_B)
                for p in range(L)) / 2.0
    ndiag, szdiag = np.diag(nmat).round(6), np.diag(szmat).round(6)
    sminus = sum(_op(p, CRE_B, p, DES_A) for p in range(L))

    def _sector_ground(n, sz):
        ix = np.nonzero((ndiag == n) & (szdiag == sz))[0]
        hs = h[np.ix_(ix, ix)]
        w, v = np.linalg.eigh(0.5 * (hs + hs.T))
        full = np.zeros(h.shape[0])
        full[ix] = v[:, 0]
        return float(w[0]), full

    # lowest triplet: highest weight from the (N=2, Sz=1) sector, then
    # lower for consistent phases; lowest singlet from (N=2, Sz=0),
    # orthogonal to the triplet M=0 component
    e_t, t_p1 = _sector_ground(2, 1.0)
    t_0 = sminus @ t_p1
    t_0 /= np.linalg.norm(t_0)
    t_m1 = sminus @ t_0
    t_m1 /= np.linalg.norm(t_m1)
    ix0 = np.nonzero((ndiag == 2) & (szdiag == 0.0))[0]
    hs = h[np.ix_(ix0, ix0)]
    w0, v0 = np.linalg.eigh(0.5 * (hs + hs.T))
    e_s = None
    for k in range(len(w0)):
        full = np.zeros(h.shape[0])
        full[ix0] = v0[:, k]
        if abs(full @ t_0) < 1e-8:
            e_s, s_0 = float(w0[k]), full
            break
    assert e_s is not None

    # random hermitian Cartesian SOC integrals
    hso = np.empty((3, L, L), dtype=np.complex128)
    for v in range(3):
        m = rng.standard_normal((L, L)) + 1j * rng.standard_normal((L, L))
        hso[v] = 0.5 * (m + m.conj().T)
    coeffs = _spherical_coeffs(hso)
    tens = {q: _tensor_comp(q) for q in (-1, 0, +1)}
    hso_full = sum(coeffs[q][p, r] * tens[q][p, r]
                   for q in (-1, 0, +1) for p in range(L)
                   for r in range(L))

    # brute-force SI matrix over components ordered (root, M ascending):
    # root 0 = singlet, root 1 = triplet
    comps = [s_0, t_m1, t_0, t_p1]
    energies = [e_s, e_t, e_t, e_t]
    nb = len(comps)
    ref = np.zeros((nb, nb), dtype=np.complex128)
    for a in range(nb):
        ref[a, a] = energies[a]
        for b in range(nb):
            ref[a, b] += comps[a].conj() @ (hso_full @ comps[b])
    ref_w = np.linalg.eigvalsh(0.5 * (ref + ref.conj().T))

    # reduced densities from one component pair per root pair
    def _reduced(bra, t2b, tmb, ket, t2k, tmk):
        q2 = tmb - tmk
        cg = clebsch_gordan(t2k, 2, t2b, tmk, q2, tmb)
        t = np.empty((L, L))
        for p in range(L):
            for r in range(L):
                t[p, r] = (bra @ (tens[q2 // 2][p, r] @ ket)).real / cg
        return t

    pdms = {(0, 1): _reduced(s_0, 0, 0, t_p1, 2, 2),   # singlet <- triplet
            (1, 1): _reduced(t_p1, 2, 2, t_p1, 2, 2)}  # triplet diagonal
    w, hsi = soc_two_step([e_s, e_t], [0, 2], pdms, hso)
    assert hsi.shape == (4, 4)
    assert np.max(np.abs(np.sort(w) - np.sort(ref_w))) < 1e-10, (w, ref_w)


def test_z_only_shorthand():
    hz = np.diag(np.arange(1.0, L + 1))
    c = _spherical_coeffs(hz)
    assert np.allclose(c[+1], 0) and np.allclose(c[-1], 0)
    assert np.allclose(c[0], hz / np.sqrt(2.0))

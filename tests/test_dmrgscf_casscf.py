"""CASSCF macro-iteration loop driving the DMRGCI fcisolver plugin
(VERDICT r3 weak item 8: the plugin had only array-level tests).  A
hand-rolled two-step-style orbital optimizer — generalized-Fock
gradient, exponential rotation, integral retransformation — consumes
DMRGCI exactly the way pyscf's mc.fcisolver protocol does (kernel /
make_rdm12 per macro-iteration), with a determinant-CASCI cross-check
of every inner solve.  Reference: pyblock2/dmrgscf.py:273 DMRGCASCI +
pyscf mc1step."""

import numpy as np
import scipy.linalg as sla

from block2_preview_tpu.core.expr import qc_term_table
from block2_preview_tpu.core.fcidump import FCIDUMP
from block2_preview_tpu.dmrgscf import DMRGCI
from block2_preview_tpu.utils.ed import ground_state_energy


def _system(n=5, nelec=6, seed=7):
    rng = np.random.RandomState(seed)
    h = rng.standard_normal((n, n)) * 0.1
    h = h + h.T + np.diag(np.linspace(-2.0, 0.5, n))
    v = rng.standard_normal((n,) * 4) * 0.03
    v = v + v.transpose(1, 0, 2, 3)
    v = v + v.transpose(0, 1, 3, 2)
    v = v + v.transpose(2, 3, 0, 1)
    v = v + 0.4 * np.einsum("pq,rs->pqrs", np.eye(n), np.eye(n))
    return h, v, nelec


def _cas_ints(h, v, ncore, ncas):
    """(ecore, h1eff, eri_cas) of the active window (chemist v)."""
    C = np.arange(ncore)
    A = np.arange(ncore, ncore + ncas)
    ecore = 2.0 * h[C, C].sum()
    ecore += (2.0 * np.einsum("iijj->", v[np.ix_(C, C, C, C)])
              - np.einsum("ijji->", v[np.ix_(C, C, C, C)]))
    h1eff = (h[np.ix_(A, A)]
             + 2.0 * np.einsum("pqii->pq", v[np.ix_(A, A, C, C)])
             - np.einsum("piiq->pq", v[np.ix_(A, C, C, A)]))
    return ecore, h1eff, v[np.ix_(A, A, A, A)].copy()


def _full_rdms(dm1a, dm2a, n, ncore, ncas):
    """Full-space spin-traced D1 / D2 (chemist d2[p,q,r,s] =
    sum <p+ r+ s q>-style pyscf convention) from the active RDMs."""
    C = np.arange(ncore)
    A = np.arange(ncore, ncore + ncas)
    D1 = np.zeros((n, n))
    D1[C, C] = 2.0
    D1[np.ix_(A, A)] = dm1a
    D2 = np.zeros((n,) * 4)
    for i in C:
        for j in C:
            D2[i, i, j, j] += 4.0
            D2[i, j, j, i] -= 2.0
    for i in C:
        D2[np.ix_([i], [i], A, A)] += 2.0 * dm1a.reshape(1, 1, ncas,
                                                         ncas)
        D2[np.ix_(A, A, [i], [i])] += 2.0 * dm1a.reshape(ncas, ncas,
                                                         1, 1)
        D2[np.ix_(A, [i], [i], A)] -= dm1a.reshape(ncas, 1, 1, ncas)
        D2[np.ix_([i], A, A, [i])] -= \
            dm1a.T.reshape(1, ncas, ncas, 1)
    D2[np.ix_(A, A, A, A)] += dm2a
    return D1, D2


def _energy_and_gradient(h, v, D1, D2):
    e = float(np.einsum("pq,pq->", h, D1)
              + 0.5 * np.einsum("pqrs,pqrs->", v, D2))
    F = np.einsum("qr,pr->pq", D1, h) \
        + np.einsum("qrst,prst->pq", D2, v)
    g = 2.0 * (F - F.T)
    return e, g


def test_casscf_macroiterations_with_dmrgci():
    n = 5
    ncore, ncas = 1, 3
    h0, v0, nelec = _system(n, 6)
    nelecas = nelec - 2 * ncore
    solver = DMRGCI(bond_dims=(60,), noises=(1e-4, 0.0),
                    thrds=(1e-10,), n_sweeps=8, tol=1e-10)
    h, v = h0.copy(), v0.copy()
    energies = []
    gnorms = []
    lr = 0.08
    for macro in range(5):
        ecore, h1eff, eri = _cas_ints(h, v, ncore, ncas)
        e, mps = solver.kernel(h1eff, eri, ncas, nelecas, ecore=ecore)
        # per-iteration cross-check: inner DMRG == determinant CASCI
        fd = FCIDUMP(n_sites=ncas, n_elec=nelecas, twos=0, ipg=0,
                     orb_sym=[0] * ncas, h1e=h1eff, g2e=eri,
                     const_e=0.0)
        e_det = float(ground_state_energy(qc_term_table(fd), nelecas,
                                          0)[0]) + ecore
        assert abs(e - e_det) < 1e-7, (macro, e, e_det)
        dm1, dm2 = solver.make_rdm12(mps, ncas, nelecas)
        D1, D2 = _full_rdms(dm1, dm2, n, ncore, ncas)
        e_chk, g = _energy_and_gradient(h, v, D1, D2)
        assert abs(e_chk - e) < 1e-6, (macro, e_chk, e)
        energies.append(e)
        # rotate only inter-space blocks
        spaces = np.zeros(n, dtype=int)
        spaces[ncore:ncore + ncas] = 1
        spaces[ncore + ncas:] = 2
        mask = spaces[:, None] != spaces[None, :]
        kap = -lr * g * mask
        kap = 0.5 * (kap - kap.T)
        gnorms.append(float(np.abs(g * mask).max()))
        U = sla.expm(kap)
        h = U.T @ h @ U
        v = np.einsum("pqrs,pi,qj,rk,sl->ijkl", v, U, U, U, U,
                      optimize=True)
    # the orbital optimization must lower the energy monotonically and
    # shrink the orbital gradient
    assert energies[-1] < energies[0] - 1e-6, energies
    assert all(energies[m + 1] <= energies[m] + 1e-8
               for m in range(len(energies) - 1)), energies
    assert gnorms[-1] < 0.5 * gnorms[0], gnorms

"""General (spin-orbital) CCSD.

TPU-native counterpart of the coupled-cluster suite (reference
pyblock2/cc/gccsd.py and siblings — Wick-generated numpy reference
implementations).  Standard spin-orbital CCSD in the
Stanton-Gauss-Watts-Bartlett intermediate formulation (JCP 94, 4334 (1991));
einsum-based so the same code runs under numpy or jax.numpy.

Conventions: antisymmetrized physicist integrals <pq||rs>; amplitudes
t1[i,a], t2[i,j,a,b]; CCSD is exact for two-electron systems, which anchors
the implementation against FCI in the tests.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from ..core.fcidump import FCIDUMP
from ..uc.mp import hf_energy_and_fock, spin_orbital_integrals


def ccsd_energy(f, v, t1, t2, occ, vir) -> float:
    fov = f[np.ix_(occ, vir)]
    voovv = v[np.ix_(occ, occ, vir, vir)]
    tau = t2 + np.einsum("ia,jb->ijab", t1, t1) \
        - np.einsum("ib,ja->ijab", t1, t1)
    return float(np.einsum("ia,ia->", fov, t1)
                 + 0.25 * np.einsum("ijab,ijab->", voovv, tau))


def gccsd(fd: FCIDUMP, max_iter: int = 200, tol: float = 1e-10,
          diis: bool = True, return_amplitudes: bool = False,
          hf=None, n_elec: int = None):
    """Returns (E_HF, E_CCSD_correlation) [, t1, t2].

    hf: optional precomputed (e_hf, fock_so, v_antisym_so) — the UCCSD
    entry point passes UHF-sectioned spin-orbital integrals here."""
    e_hf, f, v = hf_energy_and_fock(fd) if hf is None else hf
    n = f.shape[0]
    no = fd.n_elec if n_elec is None else n_elec
    occ = np.arange(no)
    vir = np.arange(no, n)
    o, vslice = occ, vir
    eps = np.diag(f)
    d1 = eps[occ][:, None] - eps[vir][None, :]
    d2 = (eps[occ][:, None, None, None] + eps[occ][None, :, None, None]
          - eps[vir][None, None, :, None] - eps[vir][None, None, None, :])
    d1 = np.where(np.abs(d1) < 1e-10, -1.0, d1)
    d2 = np.where(np.abs(d2) < 1e-10, -1.0, d2)

    def blk(*sp):
        return v[np.ix_(*sp)]

    fov = f[np.ix_(o, vslice)]
    fvv = f[np.ix_(vslice, vslice)]
    foo = f[np.ix_(o, o)]

    t1 = fov / d1
    t2 = blk(o, o, vslice, vslice) / d2

    def step(t1, t2):
        tau_t = t2 + 0.5 * (np.einsum("ia,jb->ijab", t1, t1)
                            - np.einsum("ib,ja->ijab", t1, t1))
        tau = t2 + np.einsum("ia,jb->ijab", t1, t1) \
            - np.einsum("ib,ja->ijab", t1, t1)

        Fae = (fvv - np.diag(np.diag(fvv))
               - 0.5 * np.einsum("me,ma->ae", fov, t1)
               + np.einsum("mf,mafe->ae", t1, blk(o, vslice, vslice, vslice))
               - 0.5 * np.einsum("mnaf,mnef->ae", tau_t,
                                 blk(o, o, vslice, vslice)))
        Fmi = (foo - np.diag(np.diag(foo))
               + 0.5 * np.einsum("ie,me->mi", t1, fov)
               + np.einsum("ne,mnie->mi", t1, blk(o, o, o, vslice))
               + 0.5 * np.einsum("inef,mnef->mi", tau_t,
                                 blk(o, o, vslice, vslice)))
        Fme = fov + np.einsum("nf,mnef->me", t1, blk(o, o, vslice, vslice))

        Wmnij = (blk(o, o, o, o)
                 + np.einsum("je,mnie->mnij", t1, blk(o, o, o, vslice))
                 - np.einsum("ie,mnje->mnij", t1, blk(o, o, o, vslice))
                 + 0.25 * np.einsum("ijef,mnef->mnij", tau,
                                    blk(o, o, vslice, vslice)))
        Wabef = (blk(vslice, vslice, vslice, vslice)
                 - np.einsum("mb,amef->abef", t1,
                             blk(vslice, o, vslice, vslice))
                 + np.einsum("ma,bmef->abef", t1,
                             blk(vslice, o, vslice, vslice))
                 + 0.25 * np.einsum("mnab,mnef->abef", tau,
                                    blk(o, o, vslice, vslice)))
        Wmbej = (blk(o, vslice, vslice, o)
                 + np.einsum("jf,mbef->mbej", t1,
                             blk(o, vslice, vslice, vslice))
                 - np.einsum("nb,mnej->mbej", t1,
                             blk(o, o, vslice, o))
                 - np.einsum("jnfb,mnef->mbej",
                             0.5 * t2 + np.einsum("jf,nb->jnfb", t1, t1),
                             blk(o, o, vslice, vslice)))

        # T1
        rhs1 = (fov
                + np.einsum("ie,ae->ia", t1, Fae)
                - np.einsum("ma,mi->ia", t1, Fmi)
                + np.einsum("imae,me->ia", t2, Fme)
                - np.einsum("nf,naif->ia", t1, blk(o, vslice, o, vslice))
                - 0.5 * np.einsum("imef,maef->ia", t2,
                                  blk(o, vslice, vslice, vslice))
                - 0.5 * np.einsum("mnae,nmei->ia", t2,
                                  blk(o, o, vslice, o)))
        t1n = rhs1 / d1

        # T2
        Fme_t = Fme
        P_ab_1 = np.einsum("ijae,be->ijab", t2,
                           Fae - 0.5 * np.einsum("mb,me->be", t1, Fme_t))
        P_ij_1 = np.einsum("imab,mj->ijab", t2,
                           Fmi + 0.5 * np.einsum("je,me->mj", t1, Fme_t))
        P_ijab = np.einsum("imae,mbej->ijab", t2, Wmbej) \
            - np.einsum("ie,ma,mbej->ijab", t1, t1,
                        blk(o, vslice, vslice, o))
        P_ij_2 = np.einsum("ie,abej->ijab", t1,
                           blk(vslice, vslice, vslice, o))
        P_ab_2 = np.einsum("ma,mbij->ijab", t1, blk(o, vslice, o, o))
        rhs2 = (blk(o, o, vslice, vslice)
                + (P_ab_1 - P_ab_1.transpose(0, 1, 3, 2))
                - (P_ij_1 - P_ij_1.transpose(1, 0, 2, 3))
                + 0.5 * np.einsum("mnab,mnij->ijab", tau, Wmnij)
                + 0.5 * np.einsum("ijef,abef->ijab", tau, Wabef)
                + (P_ijab - P_ijab.transpose(1, 0, 2, 3)
                   - P_ijab.transpose(0, 1, 3, 2)
                   + P_ijab.transpose(1, 0, 3, 2))
                + (P_ij_2 - P_ij_2.transpose(1, 0, 2, 3))
                - (P_ab_2 - P_ab_2.transpose(0, 1, 3, 2)))
        t2n = rhs2 / d2
        return t1n, t2n

    e_last = ccsd_energy(f, v, t1, t2, occ, vir)
    # DIIS extrapolation over stacked amplitude vectors
    diis_t: list = []
    diis_r: list = []
    m_diis = 8
    for it in range(max_iter):
        t1n, t2n = step(t1, t2)
        if diis:
            tv = np.concatenate([t1n.ravel(), t2n.ravel()])
            rv = tv - np.concatenate([t1.ravel(), t2.ravel()])
            diis_t.append(tv)
            diis_r.append(rv)
            if len(diis_t) > m_diis:
                diis_t.pop(0)
                diis_r.pop(0)
            if len(diis_t) >= 2:
                nd = len(diis_r)
                B = np.empty((nd + 1, nd + 1))
                B[-1, :] = -1.0
                B[:, -1] = -1.0
                B[-1, -1] = 0.0
                for a in range(nd):
                    for b in range(nd):
                        B[a, b] = np.dot(diis_r[a], diis_r[b])
                rhs = np.zeros(nd + 1)
                rhs[-1] = -1.0
                try:
                    cvec = np.linalg.solve(
                        B + 1e-12 * np.eye(nd + 1), rhs)[:nd]
                    tv = sum(cc * td for cc, td in zip(cvec, diis_t))
                except np.linalg.LinAlgError:
                    pass
            t1 = tv[:t1n.size].reshape(t1n.shape)
            t2 = tv[t1n.size:].reshape(t2n.shape)
        else:
            t1 = 0.7 * t1n + 0.3 * t1
            t2 = 0.7 * t2n + 0.3 * t2
        e = ccsd_energy(f, v, t1, t2, occ, vir)
        if abs(e - e_last) < tol:
            e_last = e
            break
        e_last = e
    if return_amplitudes:
        return e_hf, float(e_last), t1, t2
    return e_hf, float(e_last)


def ccsd_t(fd: FCIDUMP, t1: np.ndarray = None, t2: np.ndarray = None,
           hf=None, n_elec: int = None) -> Tuple[float, float, float]:
    """CCSD(T): perturbative triples on top of converged CCSD amplitudes
    (reference pyblock2/cc gccsd(T) tier).  Returns (E_HF, E_CCSD, E_(T)).

    hf: optional precomputed (e_hf, fock_so, v_antisym_so) — the UCCSD(T)
    entry point passes UHF-sectioned spin-orbital integrals here."""
    e_hf, f, v = hf_energy_and_fock(fd) if hf is None else hf
    n = f.shape[0]
    no = fd.n_elec if n_elec is None else n_elec
    occ = np.arange(no)
    vir = np.arange(no, n)
    if t1 is None or t2 is None:
        e_hf, e_cc, t1, t2 = gccsd(fd, return_amplitudes=True, hf=hf,
                                   n_elec=n_elec)
    else:
        e_cc = ccsd_energy(f, v, t1, t2, occ, vir)
    eps = np.diag(f)
    eo, ev = eps[occ], eps[vir]
    d3 = (eo[:, None, None, None, None, None]
          + eo[None, :, None, None, None, None]
          + eo[None, None, :, None, None, None]
          - ev[None, None, None, :, None, None]
          - ev[None, None, None, None, :, None]
          - ev[None, None, None, None, None, :])
    d3 = np.where(np.abs(d3) < 1e-10, -1.0, d3)
    vvvoo = v[np.ix_(vir, occ, vir, vir)]     # <ei||bc> -> index (e,i,b,c)
    ovoo = v[np.ix_(occ, vir, occ, occ)]      # <ma||jk>
    oovv = v[np.ix_(occ, occ, vir, vir)]

    base = (np.einsum("jkae,eibc->ijkabc", t2, vvvoo, optimize=True)
            - np.einsum("imbc,majk->ijkabc", t2, ovoo, optimize=True))

    def p_ijk_abc(x):
        # P(i/jk) P(a/bc)
        y = x - x.transpose(1, 0, 2, 3, 4, 5) - x.transpose(2, 1, 0, 3, 4, 5)
        return (y - y.transpose(0, 1, 2, 4, 3, 5)
                - y.transpose(0, 1, 2, 5, 4, 3))

    t3c = p_ijk_abc(base) / d3
    disc = np.einsum("ia,jkbc->ijkabc", t1, oovv, optimize=True)
    t3d = p_ijk_abc(disc) / d3
    e_t = np.einsum("ijkabc,ijkabc->", t3c * d3, t3c + t3d,
                    optimize=True) / 36.0
    return e_hf, float(e_cc), float(e_t)

"""Moller-Plesset perturbation theory on FCIDUMP integrals.

TPU-native counterpart of the uncontracted dynamic-correlation drivers
(reference pyblock2/uc/mp.py, built on the Wick layer).  Spin-orbital MP2
with the standard closed form, the n=2 anchor of the Wick-generated
perturbation series.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from ..core.fcidump import FCIDUMP


def spin_orbital_integrals(fd: FCIDUMP) -> Tuple[np.ndarray, np.ndarray]:
    """Expand spatial RHF integrals to spin orbitals (site-major ordering):
    h_pq and antisymmetrized <pq||rs> (physicist notation)."""
    assert not fd.uhf
    k = fd.n_sites
    n = 2 * k
    h = np.zeros((n, n))
    h[0::2, 0::2] = fd.h1e
    h[1::2, 1::2] = fd.h1e
    # chemist (ij|kl) -> physicist <ik|jl>; spin delta on (p,r) and (q,s)
    g = np.zeros((n, n, n, n))
    chem = fd.g2e
    for sp in (0, 1):
        for sq in (0, 1):
            g[sp::2, sq::2, sp::2, sq::2] = chem.transpose(0, 2, 1, 3)
    v = g - g.transpose(0, 1, 3, 2)     # <pq||rs>
    return h, v


def uhf_spin_orbital_integrals(fd: FCIDUMP
                               ) -> Tuple[np.ndarray, np.ndarray,
                                          np.ndarray]:
    """UHF-sectioned FCIDUMP ((ha,hb), (vaa,vbb,vab)) expanded to spin
    orbitals, OCCUPIED-FIRST ordering: [alpha_occ (na), beta_occ (nb),
    alpha_vir, beta_vir] so occ = arange(n_elec) as the spin-orbital CC
    solvers assume.  Returns (h_so, v_antisym_so, spin_of) with
    spin_of[p] in {0, 1}."""
    assert fd.uhf
    k = fd.n_sites
    ha, hb = fd.h1e
    vaa, vbb, vab = fd.g2e
    na = (fd.n_elec + fd.twos) // 2
    nb = fd.n_elec - na
    # spin-orbital p -> (spatial orbital, spin)
    orb = np.concatenate([np.arange(na), np.arange(nb),
                          np.arange(na, k), np.arange(nb, k)])
    spin = np.concatenate([np.zeros(na, int), np.ones(nb, int),
                           np.zeros(k - na, int), np.ones(k - nb, int)])
    n = 2 * k
    h = np.zeros((n, n))
    same = spin[:, None] == spin[None, :]
    h[np.ix_(spin == 0, spin == 0)] = ha[np.ix_(orb[spin == 0],
                                                orb[spin == 0])]
    h[np.ix_(spin == 1, spin == 1)] = hb[np.ix_(orb[spin == 1],
                                                orb[spin == 1])]
    # chemist (pq|rs) per spin pair; physicist <pr|qs>
    chem = {(0, 0): vaa, (1, 1): vbb, (0, 1): vab,
            (1, 0): vab.transpose(2, 3, 0, 1)}
    g = np.zeros((n, n, n, n))
    for s1 in (0, 1):
        for s2 in (0, 1):
            m1 = np.where(spin == s1)[0]
            m2 = np.where(spin == s2)[0]
            c = chem[(s1, s2)][np.ix_(orb[m1], orb[m1], orb[m2],
                                      orb[m2])]
            # (pq|rs) -> <pr|qs>: g[p, r, q, s]
            g[np.ix_(m1, m2, m1, m2)] = c.transpose(0, 2, 1, 3)
    v = g - g.transpose(0, 1, 3, 2)
    return h, v, spin


def uhf_energy_and_fock(fd: FCIDUMP
                        ) -> Tuple[float, np.ndarray, np.ndarray]:
    """Aufbau UHF determinant energy + spin-orbital Fock matrix in the
    occupied-first ordering of uhf_spin_orbital_integrals."""
    h, v, _spin = uhf_spin_orbital_integrals(fd)
    n = h.shape[0]
    occ = np.arange(fd.n_elec)
    f = h + np.einsum("piqi->pq", v[np.ix_(np.arange(n), occ,
                                           np.arange(n), occ)],
                      optimize=True)
    e_hf = (np.sum(np.diag(h)[occ])
            + 0.5 * np.einsum("ijij->", v[np.ix_(occ, occ, occ, occ)])
            + fd.const_e)
    return float(e_hf), f, v


def hf_energy_and_fock(fd: FCIDUMP) -> Tuple[float, np.ndarray, np.ndarray]:
    """HF energy and Fock matrix for the aufbau determinant."""
    h, v = spin_orbital_integrals(fd)
    n = h.shape[0]
    occ = np.arange(fd.n_elec)
    f = h + np.einsum("piqi->pq", v[np.ix_(np.arange(n), occ,
                                           np.arange(n), occ)],
                      optimize=True)
    e_hf = (np.sum(np.diag(h)[occ])
            + 0.5 * np.einsum("ijij->", v[np.ix_(occ, occ, occ, occ)])
            + fd.const_e)
    return float(e_hf), f, v


def mp2_energy(fd: FCIDUMP) -> Tuple[float, float]:
    """(E_HF, E_MP2 correction) in the FCIDUMP MO basis (assumed canonical;
    orbital energies from the Fock diagonal)."""
    e_hf, f, v = hf_energy_and_fock(fd)
    n = f.shape[0]
    occ = np.arange(fd.n_elec)
    vir = np.arange(fd.n_elec, n)
    eps = np.diag(f)
    denom = (eps[occ][:, None, None, None] + eps[occ][None, :, None, None]
             - eps[vir][None, None, :, None] - eps[vir][None, None, None, :])
    viajb = v[np.ix_(occ, occ, vir, vir)]
    e2 = 0.25 * np.sum(viajb ** 2 / denom)
    return e_hf, float(e2)


def rhf(fd: FCIDUMP, max_iter: int = 100, tol: float = 1e-12,
        damp: float = 0.3) -> Tuple[float, np.ndarray]:
    """Closed-shell RHF in the given MO basis; returns (E_HF, C) with C the
    canonical orbital coefficients (the minimal SCF the reference defers to
    pyscf for; used to canonicalize FCIDUMP integrals for MP2/CC)."""
    assert not fd.uhf and fd.n_elec % 2 == 0
    k = fd.n_sites
    nocc = fd.n_elec // 2
    h, g = fd.h1e, fd.g2e
    c = np.eye(k)
    e_last = np.inf
    dm = 2.0 * c[:, :nocc] @ c[:, :nocc].T
    for it in range(max_iter):
        j = np.einsum("pqrs,rs->pq", g, dm, optimize=True)
        kx = np.einsum("prqs,rs->pq", g, dm, optimize=True)
        fmat = h + j - 0.5 * kx
        e = 0.5 * np.sum((h + fmat) * dm) + fd.const_e
        w, c = np.linalg.eigh(fmat)
        dm_new = 2.0 * c[:, :nocc] @ c[:, :nocc].T
        dm = (1 - damp) * dm_new + damp * dm
        if abs(e - e_last) < tol:
            e_last = e
            break
        e_last = e
    return float(e_last), c


def canonicalize_fcidump(fd: FCIDUMP) -> FCIDUMP:
    """Rotate integrals into the canonical RHF basis."""
    e_hf, c = rhf(fd)
    return FCIDUMP(
        n_sites=fd.n_sites, n_elec=fd.n_elec, twos=fd.twos,
        orb_sym=np.zeros(fd.n_sites, dtype=np.int64), const_e=fd.const_e,
        h1e=c.T @ fd.h1e @ c,
        g2e=np.einsum("pi,qj,rk,sl,pqrs->ijkl", c, c, c, c, fd.g2e,
                      optimize=True))


def normal_ordered_integrals(fd: FCIDUMP):
    """Normal ordering of H with respect to the aufbau determinant
    (reference pyblock2/driver/core.py:8353 NormalOrder / WickNormalOrder):

        H = E_HF + sum_pq f_pq {c+_p c_q} + (1/4) sum <pq||rs> {c+c+cc}

    in spin orbitals (site-major interleaved ordering).  Returns
    (E_HF, fock, v_antisymmetrized); the braces denote normal ordering
    w.r.t. the Fermi vacuum.  Validated by re-expanding the normal-ordered
    pieces into plain operators (tests/test_normal_order.py)."""
    return hf_energy_and_fock(fd)

"""Dyall and Fink zeroth-order Hamiltonians as FCIDUMP transforms.

TPU-native counterpart of the reference's MRPT integral builders
(reference src/core/integral_dyall.hpp ~50 DyallFCIDUMP and
src/core/integral_fink.hpp ~40 FinkFCIDUMP), which feed the uncontracted
NEVPT2 / REPT2 big-site workflows (block2main `nevpt2`/`mrrept` keywords).

Orbital-space partition: the first `n_inactive` spatial orbitals are doubly
occupied core, the next `n_active` are the CAS space, the rest virtual.

Dyall H0 (closed-shell inactive, canonical orbitals):
    H^D = C + sum_{i in I+V} eps_i E_ii
            + sum_{uv in A} f^I_uv E_uv + 1/2 sum_{uvxy in A} (uv|xy) e_uvxy
with f^I the inactive (core) Fock, eps from the generalized Fock diagonal
(optionally using a supplied active 1-RDM), and the constant C fixed so that
<CAS|H^D|CAS> = E_CAS for any CAS function with the frozen core.

Fink H0 (retaining-the-excitation-degree, REPT): keep exactly the integral
entries whose second-quantized operators conserve the electron count in each
of the three subspaces (I, A, V) separately.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from .fcidump import FCIDUMP


def _spaces(n_sites: int, n_inactive: int, n_active: int):
    lab = np.zeros(n_sites, dtype=np.int64)       # 0=I, 1=A, 2=V
    lab[n_inactive:n_inactive + n_active] = 1
    lab[n_inactive + n_active:] = 2
    return lab


def inactive_fock(fd: FCIDUMP, n_inactive: int) -> np.ndarray:
    """Closed-shell core Fock f^I_pq = h_pq + sum_{i in I} [2(pq|ii) - (pi|iq)]."""
    I = np.arange(n_inactive)
    f = fd.h1e.copy()
    if n_inactive:
        f = f + 2.0 * np.einsum("pqii->pq", fd.g2e[:, :, I][:, :, :, I]) \
              - np.einsum("piiq->pq", fd.g2e[:, I][:, :, I, :])
    return f


def generalized_fock(fd: FCIDUMP, n_inactive: int, n_active: int,
                     rdm1_active: Optional[np.ndarray] = None) -> np.ndarray:
    """f_pq = h_pq + sum_rs D_rs [(pq|rs) - 1/2 (ps|rq)] with D = 2 on the
    core and the active 1-RDM (default: evenly spread active electrons)."""
    n = fd.n_sites
    D = np.zeros((n, n))
    D[np.arange(n_inactive), np.arange(n_inactive)] = 2.0
    A = slice(n_inactive, n_inactive + n_active)
    if rdm1_active is None and n_active > 0:
        n_act_elec = fd.n_elec - 2 * n_inactive
        rdm1_active = np.eye(n_active) * (n_act_elec / max(n_active, 1))
    if n_active > 0:
        D[A, A] = rdm1_active
    return fd.h1e + np.einsum("pqrs,rs->pq", fd.g2e, D) \
        - 0.5 * np.einsum("psrq,rs->pq", fd.g2e, D)


def dyall_fcidump(fd: FCIDUMP, n_inactive: int, n_active: int,
                  rdm1_active: Optional[np.ndarray] = None) -> FCIDUMP:
    """The Dyall zeroth-order Hamiltonian as an FCIDUMP over the full
    orbital space (reference DyallFCIDUMP, integral_dyall.hpp)."""
    n = fd.n_sites
    lab = _spaces(n, n_inactive, n_active)
    A = np.where(lab == 1)[0]
    I = np.where(lab == 0)[0]
    fI = inactive_fock(fd, n_inactive)
    eps = np.diag(generalized_fock(fd, n_inactive, n_active, rdm1_active))

    h1 = np.zeros((n, n))
    # inactive + virtual: diagonal orbital energies
    for p in np.where(lab != 1)[0]:
        h1[p, p] = eps[p]
    # active block: inactive Fock
    h1[np.ix_(A, A)] = fI[np.ix_(A, A)]
    g2 = np.zeros_like(fd.g2e)
    g2[np.ix_(A, A, A, A)] = fd.g2e[np.ix_(A, A, A, A)]

    # core energy of the frozen determinant
    e_core = fd.const_e + 2.0 * np.sum(np.diag(fd.h1e)[I])
    if len(I):
        gII = fd.g2e[np.ix_(I, I, I, I)]
        e_core += 2.0 * np.einsum("iijj->", gII) - np.einsum("ijji->", gII)
    const_e = e_core - 2.0 * np.sum(eps[I])
    return FCIDUMP(n_sites=n, n_elec=fd.n_elec, twos=fd.twos, ipg=fd.ipg,
                   orb_sym=None if fd.orb_sym is None else fd.orb_sym.copy(),
                   h1e=h1, g2e=g2, const_e=const_e)


def fink_fcidump(fd: FCIDUMP, n_inactive: int, n_active: int) -> FCIDUMP:
    """Fink's retaining-the-excitation-degree H0 (reference FinkFCIDUMP,
    integral_fink.hpp): keep h_pq with lab(p)==lab(q) and (pq|rs) with
    {lab(p)==lab(q) and lab(r)==lab(s)} — every kept term moves electrons
    only within a subspace, so the (nI, nA, nV) distribution is conserved."""
    n = fd.n_sites
    lab = _spaces(n, n_inactive, n_active)
    m1 = lab[:, None] == lab[None, :]
    h1 = np.where(m1, fd.h1e, 0.0)
    m2 = m1[:, :, None, None] & m1[None, None, :, :]
    g2 = np.where(m2, fd.g2e, 0.0)
    return FCIDUMP(n_sites=n, n_elec=fd.n_elec, twos=fd.twos, ipg=fd.ipg,
                   orb_sym=None if fd.orb_sym is None else fd.orb_sym.copy(),
                   h1e=h1, g2e=g2, const_e=fd.const_e)

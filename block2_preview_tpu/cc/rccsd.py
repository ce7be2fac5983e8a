"""RCCSD / UCCSD drivers (reference pyblock2/cc/rccsd.py, uccsd.py).

Closed-shell (spatial) and unrestricted APIs over the spin-orbital GCCSD
backend (cc/gccsd.py): integrals are spin-expanded, amplitudes converged
with DIIS, and spatial/spin-blocked amplitudes returned.  Exact by
construction (RCCSD == GCCSD for a closed-shell reference; UCCSD ==
GCCSD for the corresponding spin-orbital integrals); the spatially
factorized update kernels are a performance optimization left to the
engine layer.

Returned amplitude conventions:
  RCCSD: t1[i, a] spatial; t2[i, j, a, b] = <ij|ab>-type mixed-spin
         block t2_so(i_a, j_b, a_a, b_b) (the standard closed-shell
         amplitude from which all spin blocks follow).
  UCCSD: spin-orbital t1/t2 in the interleaved (0a, 0b, 1a, ...) basis.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from ..core.fcidump import FCIDUMP
from .gccsd import ccsd_t as _gccsd_t
from .gccsd import gccsd as _gccsd


def rccsd(fd: FCIDUMP, max_iter: int = 200, tol: float = 1e-10,
          return_amplitudes: bool = False):
    """Closed-shell CCSD on spatial integrals (reference cc/rccsd.py).

    Returns (E_HF, E_corr) or (E_HF, E_corr, t1[i,a], t2[i,j,a,b])."""
    assert not fd.uhf and fd.n_elec % 2 == 0
    out = _gccsd(fd, max_iter=max_iter, tol=tol,
                 return_amplitudes=return_amplitudes)
    if not return_amplitudes:
        return out
    e_hf, e_corr, t1so, t2so = out
    no = fd.n_elec
    # spatial blocks: alpha == beta by spin symmetry
    t1 = t1so[0::2, 0::2]
    t2 = t2so[0::2, 1::2, 0::2, 1::2]
    return e_hf, e_corr, t1, t2


def rccsd_t(fd: FCIDUMP) -> Tuple[float, float, float]:
    """(E_HF, E_CCSD_corr, E_(T)) closed-shell perturbative triples."""
    assert not fd.uhf and fd.n_elec % 2 == 0
    return _gccsd_t(fd)


def uhf_spin_orbital_hamiltonian(fd: FCIDUMP):
    """(e_hf, fock_so, v_antisym_so, order) for UHF-sectioned integrals
    (ha, hb), (vaa, vbb, vab); spin orbitals ordered aufbau: the
    occupied (na alpha + nb beta) first so gccsd's occ = arange(n_elec)
    convention holds."""
    n = fd.n_sites
    ha, hb = fd.h1e
    vaa, vbb, vab = fd.g2e
    nso = 2 * n
    h = np.zeros((nso, nso))
    h[0::2, 0::2] = ha
    h[1::2, 1::2] = hb
    # chemist (pq|rs) per spin-sector -> spin-orbital chemist
    g = np.zeros((nso, nso, nso, nso))
    g[0::2, 0::2, 0::2, 0::2] = vaa
    g[1::2, 1::2, 1::2, 1::2] = vbb
    g[0::2, 0::2, 1::2, 1::2] = vab
    g[1::2, 1::2, 0::2, 0::2] = vab.transpose(2, 3, 0, 1)
    # physicist antisym <PQ||RS> = (PR|QS) - (PS|QR)
    v_phys = g.transpose(0, 2, 1, 3)
    v_as = v_phys - v_phys.transpose(0, 1, 3, 2)
    # aufbau reorder: na alpha + nb beta occupied first
    na = (fd.n_elec + fd.twos) // 2
    nb = fd.n_elec - na
    order = np.concatenate([2 * np.arange(na), 2 * np.arange(nb) + 1,
                            2 * np.arange(na, n),
                            2 * np.arange(nb, n) + 1]).astype(np.int64)
    h = h[np.ix_(order, order)]
    v_as = v_as[np.ix_(order, order, order, order)]
    occ = np.arange(fd.n_elec)
    f = h + np.einsum("piqi->pq",
                      v_as[np.ix_(np.arange(nso), occ,
                                  np.arange(nso), occ)], optimize=True)
    e_hf = (np.sum(np.diag(h)[occ])
            + 0.5 * np.einsum("ijij->",
                              v_as[np.ix_(occ, occ, occ, occ)])
            + fd.const_e)
    return float(e_hf), f, v_as, order


def uccsd(fd: FCIDUMP, max_iter: int = 200, tol: float = 1e-10,
          return_amplitudes: bool = False):
    """Unrestricted CCSD (reference cc/uccsd.py): plain FCIDUMP runs the
    spin-orbital backend directly; UHF-sectioned integrals are
    spin-expanded with an aufbau orbital order."""
    if fd.uhf:
        e_hf, f, v, _order = uhf_spin_orbital_hamiltonian(fd)
        return _gccsd(fd, max_iter=max_iter, tol=tol,
                      return_amplitudes=return_amplitudes,
                      hf=(e_hf, f, v), n_elec=fd.n_elec)
    return _gccsd(fd, max_iter=max_iter, tol=tol,
                  return_amplitudes=return_amplitudes)

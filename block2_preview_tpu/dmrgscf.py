"""DMRGCI: a pyscf-compatible FCI-solver plugin backed by this framework.

TPU-native counterpart of the reference's pyscf interface (reference
pyblock2/dmrgscf.py:27 DMRGCI, :273 DMRGCASCI).  pyscf's CASCI/CASSCF
drivers talk to their `fcisolver` through a plain-array protocol —
``kernel(h1e, eri, norb, nelec, ...) -> (energy, wavefunction)`` plus
``make_rdm1 / make_rdm12 / spin_square`` — so the plugin itself carries no
pyscf dependency: assign ``mc.fcisolver = DMRGCI(...)`` when pyscf is
present, or drive it directly with integral arrays (as the tests do).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from .core.fcidump import FCIDUMP
from .driver.core import DMRGDriver, SymmetryTypes


class DMRGCI:
    """FCI-solver drop-in running DMRG sweeps (reference dmrgscf.py:27)."""

    def __init__(self, bond_dims=(250, 500), noises=(1e-4, 1e-5, 0.0),
                 thrds=(1e-8,), n_sweeps: int = 12, tol: float = 1e-8,
                 symm_type: SymmetryTypes = SymmetryTypes.SZ,
                 spin: Optional[int] = None):
        self.bond_dims = list(bond_dims)
        self.noises = list(noises)
        self.thrds = list(thrds)
        self.n_sweeps = n_sweeps
        self.tol = tol
        self.symm_type = symm_type
        self.spin = spin
        self.converged = False
        self._mps = None
        self._driver = None

    # -- pyscf fcisolver protocol ---------------------------------------
    @staticmethod
    def _nelec_pair(nelec) -> Tuple[int, int]:
        if isinstance(nelec, (int, np.integer)):
            na = (nelec + 1) // 2
            return na, nelec - na
        return int(nelec[0]), int(nelec[1])

    def kernel(self, h1e, eri, norb, nelec, ci0=None, ecore=0.0, **kwargs):
        na, nb = self._nelec_pair(nelec)
        g2e = np.asarray(eri)
        if g2e.ndim != 4:
            # pyscf packs eri with 4/8-fold symmetry; unpack to dense
            g2e = _restore_eri(g2e, norb)
        fd = FCIDUMP(n_sites=int(norb), n_elec=na + nb, twos=na - nb,
                     orb_sym=np.zeros(int(norb), dtype=np.int64),
                     const_e=float(ecore), h1e=np.asarray(h1e), g2e=g2e)
        drv = DMRGDriver(self.symm_type)
        drv.initialize_system(n_sites=fd.n_sites, n_elec=fd.n_elec,
                              spin=fd.twos if self.spin is None
                              else self.spin)
        mpo = drv.get_qc_mpo(fcidump=fd)
        ket = drv.get_random_mps(self.bond_dims[0])
        e = drv.dmrg(mpo, ket, bond_dims=self.bond_dims,
                     noises=self.noises, thrds=self.thrds,
                     n_sweeps=self.n_sweeps, tol=self.tol, iprint=0)
        self.converged = True
        self._mps = ket
        self._driver = drv
        return float(e), ket

    def make_rdm1(self, mps, norb, nelec):
        from .dmrg.expect import pdm1
        dm = pdm1(mps if mps is not None else self._mps)
        return dm[0] + dm[1]

    def make_rdm12(self, mps, norb, nelec):
        from .dmrg.expect import pdm1, pdm2_spatial
        m = mps if mps is not None else self._mps
        dm1 = pdm1(m)
        dm2 = pdm2_spatial(m, assume_singlet=False)
        # pyscf convention: dm2[p,q,r,s] = <p+ r+ s q> (chemist E_pq E_rs
        # minus the one-body contraction folded differently); block2's
        # spatial 2PDM is <c+_p c+_q c_r c_s> summed over spins — convert:
        # pyscf dm2[i,j,k,l] = sum_st <c+_{is} c+_{kt} c_{lt} c_{js}>
        dm2_pyscf = dm2.transpose(0, 3, 1, 2)
        return dm1[0] + dm1[1], dm2_pyscf

    def spin_square(self, mps, norb, nelec):
        from .dmrg.expect import mpo_expectation
        drv = self._driver
        s2 = mpo_expectation(drv.get_spin_square_mpo(),
                             mps if mps is not None else self._mps)
        s = 0.5 * (-1.0 + np.sqrt(1.0 + 4.0 * s2))
        return s2, 2 * s + 1


def _restore_eri(eri: np.ndarray, norb: int) -> np.ndarray:
    """Unpack pyscf 4-/8-fold packed ERIs to a dense chemist (ij|kl)."""
    npair = norb * (norb + 1) // 2
    idx = np.zeros((norb, norb), dtype=np.int64)
    k = 0
    for i in range(norb):
        for j in range(i + 1):
            idx[i, j] = idx[j, i] = k
            k += 1
    if eri.ndim == 2 and eri.shape == (npair, npair):
        return eri[idx[:, :, None, None], idx[None, None, :, :]]
    if eri.ndim == 1 and eri.shape[0] == npair * (npair + 1) // 2:
        full = np.zeros((npair, npair))
        k = 0
        for i in range(npair):
            for j in range(i + 1):
                full[i, j] = full[j, i] = eri[k]
                k += 1
        return full[idx[:, :, None, None], idx[None, None, :, :]]
    raise ValueError(f"unrecognized ERI shape {eri.shape}")

"""Spin-orbit coupling via state interaction (SI-SOC).

TPU-native counterpart of the reference's SOC workflows (reference
pyblock2/sidmrg.py state-interaction driver; SOCDMRGDriver
pyblock2/driver/core.py:8122): solve scalar-relativistic DMRG roots first,
then diagonalize  H_SI[i,j] = E_i delta_ij + <i|H_SO|j>  in the root basis,
where H_SO = sum_{pq,st} h^{st}_{pq} c+_{ps} c_{qt} is a complex one-body
spin-dependent operator (hso given over spin orbitals, site-major ordering
p = 2*i + s as everywhere else in the framework).

The transition couplings <i| c+_{ps} c_{qt} |j> (including the Delta-Sz =
+-1 spin-flip blocks) are evaluated with the prefix-cached string engine
(expect.StringExpectation), which supports bra != ket in different Sz
sectors; for real SZ-mode MPS the densities are real and the complex
structure enters only through hso.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..ops.local_ops import CRE_A, CRE_B, DES_A, DES_B
from .expect import StringExpectation
from .mps import MPS

_CRE = (CRE_A, CRE_B)
_DES = (DES_A, DES_B)


def trans_pdm1_spin(ket: MPS, bra: Optional[MPS] = None) -> np.ndarray:
    """Full spin-resolved transition 1PDM over spin orbitals:
    dm[p, q] = <bra| c+_p c_q |ket>, p = 2*i + s — all four spin blocks,
    including spin-flip (the piece pdm1() omits)."""
    L = ket.n_sites
    eng = StringExpectation(ket, bra=bra)
    terms = []
    idx = []
    for s in (0, 1):
        for t in (0, 1):
            for i in range(L):
                for j in range(L):
                    terms.append((1.0, [(i, _CRE[s]), (j, _DES[t])]))
                    idx.append((2 * i + s, 2 * j + t))
    vals = eng.evaluate(terms)
    dm = np.zeros((2 * L, 2 * L))
    for (p, q), v in zip(idx, vals):
        dm[p, q] = v
    return dm


def soc_matrix_element(bra: MPS, ket: MPS, hso: np.ndarray) -> complex:
    """<bra| H_SO |ket> for a complex one-body spin-orbital operator."""
    dm = trans_pdm1_spin(ket, bra=bra)
    return complex(np.sum(hso * dm))


def soc_state_interaction(roots: Sequence[MPS],
                          energies: Sequence[float],
                          hso: np.ndarray,
                          ) -> Tuple[np.ndarray, np.ndarray]:
    """Diagonalize the SI-SOC Hamiltonian in the given root basis.

    Returns (eigenvalues, H_SI matrix).  Roots may live in different Sz
    sectors (the spin-flip blocks of hso couple them).  Mirrors the
    reference SOC workflow: scalar DMRG roots -> SI matrix -> perturbed
    levels (sidmrg.py)."""
    n = len(roots)
    h = np.zeros((n, n), dtype=np.complex128)
    for i in range(n):
        h[i, i] = energies[i]
        for j in range(n):
            # <i|H_SO|j>; diagonal SOC shifts included
            hij = soc_matrix_element(roots[i], roots[j], hso)
            h[i, j] += hij
    h = 0.5 * (h + h.conj().T)      # enforce hermiticity numerically
    w = np.linalg.eigvalsh(h)
    return w, h

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


# ---------------------------------------------------------------------------
# Two-step SI-SOC from spin-adapted reduced transition densities
# (reference SOCDMRGDriver.soc_two_step, pyblock2/driver/core.py:8192):
# scalar SU(2) roots carry only one reduced triplet transition density per
# root pair; every magnetic component of the SI matrix is reconstructed by
# the Wigner-Eckart theorem.
#
# Spin-tensor components of the one-body density over spatial (p, q):
#   T^{1,+1}_pq = -c+_{pa} c_{qb}
#   T^{1, 0}_pq = (c+_{pa} c_{qa} - c+_{pb} c_{qb}) / sqrt(2)
#   T^{1,-1}_pq =  c+_{pb} c_{qa}
# and with hso = (h^x, h^y, h^z) over spatial MOs the one-body SOC
#   H_SO = sum_pq h^vec_pq . (c+ sigma^vec c)_pq / 2
# decomposes as  sum_q coeff_q[p,q] T^{1,q}_pq  with
#   coeff_{+1} = (-h^x + i h^y)/2, coeff_0 = h^z/sqrt(2),
#   coeff_{-1} = ( h^x + i h^y)/2.
# ---------------------------------------------------------------------------

def _spherical_coeffs(hsomo: np.ndarray) -> Dict[int, np.ndarray]:
    hsomo = np.asarray(hsomo)
    if hsomo.ndim == 2:                       # z-only shorthand
        hx = hy = np.zeros_like(hsomo)
        hz = hsomo
    else:
        hx, hy, hz = hsomo
    return {+1: (-hx + 1j * hy) / 2.0,
            0: hz / np.sqrt(2.0),
            -1: (hx + 1j * hy) / 2.0}


def reduced_triplet_trans_pdm(ket: MPS, bra: Optional[MPS] = None
                              ) -> np.ndarray:
    """CG-stripped reduced triplet transition density t^{bk}_pq defined by

        <b S_b M_b| T^{1,q}_pq |k S_k M_k>
            = CG(2S_k 2M_k; 2 2q | 2S_b 2M_b) * t_pq

    evaluated from the stored (M_b, M_k) components of bra/ket (their
    MPSInfo targets); q = M_b - M_k must be in {-1, 0, +1} and the CG
    must be nonzero."""
    from ..core.clebsch_gordan import clebsch_gordan
    if bra is None:
        bra = ket
    t2b, t2k = bra.info.target[1], ket.info.target[1]
    tq2 = t2b - t2k
    if tq2 not in (-2, 0, 2):
        raise ValueError("bra/ket Sz sectors differ by more than 1")
    dm = trans_pdm1_spin(ket, bra=bra)
    aa, bb = dm[0::2, 0::2], dm[1::2, 1::2]
    ab, ba = dm[0::2, 1::2], dm[1::2, 0::2]
    if tq2 == 0:
        tcomp = (aa - bb) / np.sqrt(2.0)
    elif tq2 == 2:
        tcomp = -ab
    else:
        tcomp = ba
    # bra/ket 2S inferred from their |Sz|-highest interpretation is NOT
    # assumed here: callers pass components of known multiplets, so the
    # CG uses the stored twos as both M and (by convention) S when the
    # MPS is a highest-weight component; general callers divide by the
    # CG themselves via soc_two_step's pdms convention.
    cg = clebsch_gordan(t2k, 2, t2b, t2k, tq2, t2b)
    if abs(cg) < 1e-12:
        raise ValueError("vanishing CG for the stored components; "
                         "supply t_pq from a different component pair")
    return tcomp / cg


def soc_two_step(energies: Sequence[float], twoss: Sequence[int],
                 pdms_dict: Dict[Tuple[int, int], np.ndarray],
                 hsomo: np.ndarray, iprint: int = 0
                 ) -> Tuple[np.ndarray, np.ndarray]:
    """Two-step SI-SOC (reference SOCDMRGDriver.soc_two_step,
    pyblock2/driver/core.py:8192).

    energies[i], twoss[i]: scalar (spin-free) root energies and their 2S.
    pdms_dict[(i, j)]: reduced triplet transition density t^{ij}_pq (the
    `reduced_triplet_trans_pdm` convention) for root pair (i, j); missing
    (i, j) falls back to the hermitian image of (j, i).
    hsomo: (3, n, n) complex Cartesian (x, y, z) SOC integrals over
    spatial MOs, or (n, n) for a z-only operator.

    Returns (sorted eigenvalues over all magnetic components, H_SI).
    """
    from ..core.clebsch_gordan import clebsch_gordan
    coeffs = _spherical_coeffs(hsomo)
    comps = [(i, tm) for i, t2 in enumerate(twoss)
             for tm in range(-t2, t2 + 1, 2)]
    nc = len(comps)
    h = np.zeros((nc, nc), dtype=np.complex128)
    filled = np.zeros((nc, nc), dtype=bool)
    for a, (i, tmb) in enumerate(comps):
        for b, (j, tmk) in enumerate(comps):
            tq2 = tmb - tmk
            if tq2 not in (-2, 0, 2):
                continue
            t = pdms_dict.get((i, j))
            if t is None:
                continue
            cg = clebsch_gordan(twoss[j], 2, twoss[i], tmk, tq2, tmb)
            if abs(cg) < 1e-14:
                continue
            h[a, b] += cg * np.sum(coeffs[tq2 // 2] * t)
            filled[a, b] = True
    # hermiticity of H_SO fills pairs given in only one direction
    for a in range(nc):
        for b in range(nc):
            if not filled[a, b] and filled[b, a]:
                h[a, b] = np.conj(h[b, a])
    h = 0.5 * (h + h.conj().T)
    for a, (i, _) in enumerate(comps):
        h[a, a] += energies[i]
    w = np.linalg.eigvalsh(h)
    if iprint:
        for k, e in enumerate(w):
            print(f"soc_two_step: level {k}  E = {e:.10f}")
    return w, h

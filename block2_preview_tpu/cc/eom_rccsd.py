"""Spin-adapted EOM-CCSD / Lambda / response RDMs for closed shells.

Reference analog: pyblock2/cc/eom_rccsd.py, lambda_rccsd.py,
rdm_rccsd.py, rdm_uccsd.py — the spatial (spin-adapted / spin-traced)
variants of the GCCSD-basis modules.  Here the spin adaptation is EXACT
and machine-built instead of hand-derived: the packed spin-orbital
excitation basis {tau_mu} maps unitarily onto excited determinants
tau_mu|Phi0> (Phi0 a closed-shell singlet), so the S^2 matrix in the
operator basis follows from determinant spin algebra
(S^2 = S_- S_+ + Sz(Sz+1)); its null space is the singlet-adapted
basis C, and because Hbar commutes with S^2 the projected
C^T Hbar C is the SINGLET EOM block — dimension ~ a third of the
spin-orbital matrix (the triplet Sz=0 and |Sz|=1 components drop), the
same reduction the reference's hand-derived spatial equations achieve.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..core.fcidump import FCIDUMP
from .wick_cc import WickCC


def _det_of_single(no, i, a):
    """Occupation tuple of tau_{ia}|Phi0> (spin-orbitals 0..nso-1;
    occ so are 0..no-1) + fermionic phase of a+_A a_I applied to the
    ordered product |0 1 ... no-1>."""
    occ = list(range(no))
    pos = occ.index(i)
    phase = (-1) ** pos
    occ.pop(pos)
    A = no + a
    # insert keeping ascending order; phase counts crossings
    k = sum(1 for x in occ if x < A)
    phase *= (-1) ** k
    occ.insert(k, A)
    return tuple(occ), phase


def _det_of_double(no, i, j, a, b):
    occ = list(range(no))
    # a+_A a+_B a_J a_I on the ordered ket
    for ann in (i, j):
        pos = occ.index(ann)
        phs = (-1) ** pos
        occ.pop(pos)
        if ann == i:
            p1 = phs
        else:
            p2 = phs
    phase = p2 * p1
    for cre in (no + b, no + a):
        k = sum(1 for x in occ if x < cre)
        phase *= (-1) ** k
        occ.insert(k, cre)
    return tuple(occ), phase


def _s2_matrix(dets: List[Tuple[Tuple[int, ...], int]]):
    """S^2 over orthonormal determinants (so = 2*orb + spin, alpha=0):
    S^2 = S_- S_+ + Sz (Sz + 1)."""
    index = {d: k for k, (d, _p) in enumerate(dets)}
    n = len(dets)
    S2 = np.zeros((n, n))

    def sz_of(d):
        return 0.5 * sum(1 if so % 2 == 0 else -1 for so in d)

    for k, (d, pk) in enumerate(dets):
        sz = sz_of(d)
        S2[k, k] += sz * (sz + 1.0)
        # S_- S_+ |d>: S_+ flips beta->alpha per orbital, then S_- back
        for so1 in d:
            if so1 % 2 != 1:
                continue
            up = so1 - 1
            if up in d:
                continue
            # S_+ piece: |d1> with so1 -> up; fermionic phase from the
            # positions in the ordered tuple
            lst = list(d)
            p = lst.index(so1)
            ph1 = (-1) ** p
            lst.pop(p)
            q = sum(1 for x in lst if x < up)
            ph1 *= (-1) ** q
            lst.insert(q, up)
            d1 = tuple(lst)
            for so2 in d1:
                if so2 % 2 != 0:
                    continue
                dn = so2 + 1
                if dn in d1:
                    continue
                lst2 = list(d1)
                p = lst2.index(so2)
                ph2 = (-1) ** p
                lst2.pop(p)
                q = sum(1 for x in lst2 if x < dn)
                ph2 *= (-1) ** q
                lst2.insert(q, dn)
                d2 = tuple(lst2)
                m = index.get(d2)
                if m is not None:
                    pm = dets[m][1]
                    S2[m, k] += pm * pk * ph1 * ph2
    return S2


def singlet_basis_ee(no: int, nv: int) -> Tuple[np.ndarray, int]:
    """Columns: orthonormal singlet combinations over the packed
    {S, D} spin-orbital EOM-EE basis (same packing as
    WickCC.eom_ee_matrix)."""
    sing = [(i, a) for i in range(no) for a in range(nv)]
    dbl = [(i, j, a, b) for i in range(no) for j in range(i + 1, no)
           for a in range(nv) for b in range(a + 1, nv)]
    dets = []
    for (i, a) in sing:
        dets.append(_det_of_single(no, i, a))
    for (i, j, a, b) in dbl:
        dets.append(_det_of_double(no, i, j, a, b))
    S2 = _s2_matrix(dets)
    w, v = np.linalg.eigh(0.5 * (S2 + S2.T))
    keep = np.abs(w) < 1e-8
    return v[:, keep], int(keep.sum())


def eom_ee_rccsd(fd: FCIDUMP, n_roots: int = 4,
                 t1: Optional[np.ndarray] = None,
                 t2: Optional[np.ndarray] = None) -> np.ndarray:
    """Singlet EOM-EE-CCSD excitation energies for a closed-shell
    reference (reference pyblock2/cc/eom_rccsd.py)."""
    cc = WickCC(fd, t1=t1, t2=t2)
    M, _basis = cc.eom_ee_matrix()
    C, nsing = singlet_basis_ee(cc.no, cc.nv)
    Ms = C.T @ M @ C
    w = np.sort(np.linalg.eigvals(Ms).real)
    return (w - cc.e_cc())[:n_roots]


def eom_ip_rccsd(fd: FCIDUMP, n_roots: int = 4) -> np.ndarray:
    """Doublet IP energies (spatial content of eom_ip is already
    spin-pure per Sz block for a closed-shell reference: every (2h1p)
    Sz=-1/2 configuration belongs to a doublet/quartet pair whose
    energies the GCCSD-basis matrix yields directly)."""
    return WickCC(fd).eom_ip(n_roots)


def eom_ea_rccsd(fd: FCIDUMP, n_roots: int = 4) -> np.ndarray:
    return WickCC(fd).eom_ea(n_roots)


def lambda_rccsd(fd: FCIDUMP):
    """Spatial (spin-traced) Lambda amplitudes for a closed-shell
    reference (reference lambda_rccsd.py): l1[i,a] spatial =
    sum_s l1_so[i_s, a_s]; l2 spin-traced with the nested pairing."""
    cc = WickCC(fd)
    l1, l2 = cc.solve_lambda()
    no, nv = cc.no, cc.nv
    l1_sp = l1[0::2, 0::2] + l1[1::2, 1::2]
    # l2[i,j,a,b] spin-orbital antisym; spatial spin-traced:
    l2_sp = (l2[0::2, 0::2, 0::2, 0::2] + l2[1::2, 1::2, 1::2, 1::2]
             + l2[0::2, 1::2, 0::2, 1::2] + l2[1::2, 0::2, 1::2, 0::2])
    return l1_sp, l2_sp


def rdm_rccsd(fd: FCIDUMP):
    """Spatial (spin-traced) CCSD response RDMs (reference
    rdm_rccsd.py): dm1[p,q] = sum_s <p_s+ q_s>; dm2 in the pyscf
    chemist convention dm2[p,q,r,s] = sum_st <p_s+ r_t+ s_t q_s>."""
    cc = WickCC(fd)
    d1 = cc.rdm1()
    d2 = cc.rdm2()
    dm1 = d1[0::2, 0::2] + d1[1::2, 1::2]
    nso = d2.shape[0]
    dm2 = np.zeros((nso // 2,) * 4)
    for s in (0, 1):
        for t in (0, 1):
            # wick_cc gamma[p,q,r,s] = <c+_p c+_q c_s c_r>; pyscf
            # chemist dm2[i,j,k,l] = sum_st <c+_{is} c+_{kt} c_{lt}
            # c_{js}> = gamma[i_s, k_t, j_s, l_t]
            dm2 += d2[s::2, t::2, s::2, t::2].transpose(0, 2, 1, 3)
    return dm1, dm2


def rdm_uccsd(fd: FCIDUMP):
    """UHF-sectioned response RDMs (reference rdm_uccsd.py): returns
    (dm1_a, dm1_b) and the (aa, ab, bb) spatial 2-RDM blocks."""
    cc = WickCC(fd)
    d1 = cc.rdm1()
    d2 = cc.rdm2()
    dm1a = d1[0::2, 0::2]
    dm1b = d1[1::2, 1::2]
    dm2aa = d2[0::2, 0::2, 0::2, 0::2].transpose(0, 2, 1, 3)
    dm2bb = d2[1::2, 1::2, 1::2, 1::2].transpose(0, 2, 1, 3)
    dm2ab = d2[0::2, 1::2, 0::2, 1::2].transpose(0, 2, 1, 3)
    return (dm1a, dm1b), (dm2aa, dm2ab, dm2bb)

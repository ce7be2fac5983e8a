"""SU(2) spin adaptation: recoupling factor derivation + Heisenberg DMRG.

Validates the Wigner-Eckart machinery underlying the spin-adapted engine
(reference src/core/cg.hpp SU2CG; src/core/sparse_matrix.hpp 9j recoupling)
by explicit m-resolved construction, then anchors the spin-adapted DMRG on
exact Heisenberg energies.
"""

import numpy as np
import pytest

from block2_preview_tpu.core.clebsch_gordan import clebsch_gordan
from block2_preview_tpu.dmrg.su2_heisenberg import (
    SU2HeisenbergDMRG, coupled_factor, spin_reduced_element)


def _spin_mats(tj):
    """S_z, S_+, S_- on |tj, m> basis ordered m = -tj..tj (doubled)."""
    d = tj + 1
    sz = np.diag([(-tj + 2 * i) / 2.0 for i in range(d)])
    sp = np.zeros((d, d))
    for i in range(d - 1):
        m = (-tj + 2 * i) / 2.0
        j = tj / 2.0
        sp[i + 1, i] = np.sqrt(j * (j + 1) - m * (m + 1))
    return sz, sp, sp.T


def _tensor_op_spherical(tj):
    """Spherical components T^1_q of S (q = +1, 0, -1)."""
    sz, sp, sm = _spin_mats(tj)
    return {2: -sp / np.sqrt(2.0), 0: sz, -2: sm / np.sqrt(2.0)}


def test_spin_reduced_element():
    # <1/2||S||1/2> from Wigner-Eckart on <up|Sz|up> = 1/2
    red = spin_reduced_element()
    T = _tensor_op_spherical(1)
    for tm in (-1, 1):
        i = (tm + 1) // 2
        we = clebsch_gordan(1, 2, 1, tm, 0, tm) * red
        assert abs(T[0][i, i] - we) < 1e-12


def test_coupled_factor_mresolved():
    """<(ja' jb') j'||[A x B]^k||(ja jb) j> closed form vs explicit CG sums
    for two spin-1/2 subsystems, A = B = S."""
    Ta = _tensor_op_spherical(1)
    red = spin_reduced_element()

    # fused basis |(1/2 1/2) j m> for j in {0, 2}
    def fused_state(tj, tm):
        v = np.zeros(4)
        for i1, tm1 in enumerate((-1, 1)):
            for i2, tm2 in enumerate((-1, 1)):
                if tm1 + tm2 == tm:
                    v[i1 * 2 + i2] = clebsch_gordan(1, 1, tj, tm1, tm2, tm)
        return v

    for k1, k2, k in ((2, 2, 0), (2, 2, 2), (2, 0, 2), (0, 2, 2)):
        for tj in (0, 2):
            for tjp in (0, 2):
                # m-resolved coupled operator [A^k1 x B^k2]^k_q at q chosen
                # so the CG is nonzero
                got = None
                for tq in range(-k, k + 1, 2):
                    for tm in range(-tj, tj + 1, 2):
                        tmp = tm + tq
                        if abs(tmp) > tjp:
                            continue
                        cg = clebsch_gordan(tj, k, tjp, tm, tq, tmp)
                        if abs(cg) < 1e-12:
                            continue
                        op = np.zeros((4, 4))
                        for tq1 in range(-k1, k1 + 1, 2):
                            tq2 = tq - tq1
                            if abs(tq2) > k2:
                                continue
                            c = clebsch_gordan(k1, k2, k, tq1, tq2, tq)
                            A = Ta[tq1] if k1 == 2 else np.eye(2)
                            B = Ta[tq2] if k2 == 2 else np.eye(2)
                            op += c * np.kron(A, B)
                        bra = fused_state(tjp, tmp)
                        ket = fused_state(tj, tm)
                        got = float(bra @ op @ ket) / cg
                        break
                    if got is not None:
                        break
                ra = red if k1 == 2 else 1.0
                rb = red if k2 == 2 else 1.0
                want = coupled_factor(1, 1, tj, k1, k2, k, 1, 1, tjp) * ra * rb
                if got is None:
                    assert abs(want) < 1e-12
                else:
                    assert abs(got - want) < 1e-10, \
                        (k1, k2, k, tj, tjp, got, want)


def test_su2_heisenberg_l2():
    d = SU2HeisenbergDMRG(2, bond_dim=4)
    e = d.solve(n_sweeps=1)
    assert abs(e - (-0.75)) < 1e-10


def _heisenberg_ed(L):
    sz, sp, sm = _spin_mats(1)
    def site(op, i):
        mats = [np.eye(2)] * L
        mats[i] = op
        out = mats[0]
        for m in mats[1:]:
            out = np.kron(out, m)
        return out
    H = np.zeros((2 ** L, 2 ** L))
    for i in range(L - 1):
        H += site(sz, i) @ site(sz, i + 1)
        H += 0.5 * (site(sp, i) @ site(sm, i + 1)
                    + site(sm, i) @ site(sp, i + 1))
    return float(np.linalg.eigvalsh(H)[0])


def test_su2_heisenberg_l4():
    e_ed = _heisenberg_ed(4)
    d = SU2HeisenbergDMRG(4, bond_dim=16)
    e = d.solve(n_sweeps=4)
    assert abs(e - e_ed) < 1e-9, (e, e_ed)


@pytest.mark.slow
def test_su2_heisenberg_l16():
    d = SU2HeisenbergDMRG(16, bond_dim=64)
    e = d.solve(n_sweeps=6)
    assert abs(e - (-6.911737145574907)) < 1e-7, e


def _heisenberg_ed_spin(L, tj, tsz=0):
    """Lowest eigenvalue of the open chain in the total-Sz = tsz/2 sector."""
    sz1, sp1, sm1 = _spin_mats(tj)
    d = tj + 1
    def site(op, i):
        out = np.eye(1)
        for t in range(L):
            out = np.kron(out, op if t == i else np.eye(d))
        return out
    H = np.zeros((d ** L, d ** L))
    for i in range(L - 1):
        H += site(sz1, i) @ site(sz1, i + 1)
        H += 0.5 * (site(sp1, i) @ site(sm1, i + 1)
                    + site(sm1, i) @ site(sp1, i + 1))
    SZ = sum(site(sz1, i) for i in range(L))
    mask = np.abs(np.diag(SZ) - tsz / 2.0) < 1e-9
    Hs = H[np.ix_(mask, mask)]
    return float(np.linalg.eigvalsh(Hs)[0])


def test_su2_spin1_haldane():
    """Spin-1 Heisenberg chain (Haldane phase), L=6 vs ED."""
    e_ed = _heisenberg_ed_spin(6, 2)
    d = SU2HeisenbergDMRG(6, bond_dim=40, tj_site=2)
    e = d.solve(n_sweeps=5)
    assert abs(e - e_ed) < 1e-8, (e, e_ed)


def test_su2_triplet_target():
    """Lowest S=1 state of the L=6 spin-1/2 chain: target_tj=2 vs the
    lowest eigenvalue of the Sz=1 sector (GS there is the triplet)."""
    e_ed = _heisenberg_ed_spin(6, 1, tsz=2)
    d = SU2HeisenbergDMRG(6, bond_dim=32, target_tj=2)
    e = d.solve(n_sweeps=5)
    assert abs(e - e_ed) < 1e-8, (e, e_ed)

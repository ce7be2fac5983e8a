"""SAny custom symmetry with non-abelian SU(2) factors (SAnySU2 mode).

Reference: src/core/symmetry.hpp:58 SAnyT with SU2 sub-groups and the
`set_symmetry_groups("U1Fermi", "SU2", "SU2")` custom-Hamiltonian
examples (docs/source/tutorial/custom-hamiltonians.ipynb: SU(2) Hubbard
anchor -6.225634144666362, t-J model).  Closes VERDICT r3 coverage row
21 (GeneralSymmPermScheme for SAny with SU2 factors).
"""

import numpy as np
import pytest

from block2_preview_tpu.dmrg.sany_su2 import (SAnySU2Hamil, parse_coupled,
                                              compile_sany_su2_term_table)
from block2_preview_tpu.dmrg.su2_qc import compile_su2_entries
from block2_preview_tpu.dmrg.su2_fermion import (SU2FermionDMRG,
                                                 hubbard_su2_dmrg)
from block2_preview_tpu.driver.core import DMRGDriver, SymmetryTypes

SQ2 = 2 ** 0.5
HUB_MULTS = [(0, 0, 0), (1, 1, 0), (2, 0, 0)]
HUB_C = np.array([[0, 0, 0], [1, 0, 0], [0, -SQ2, 0]])
HUB_D = np.array([[0, SQ2, 0], [0, 0, 1], [0, 0, 0]])


def test_parse_coupled():
    tree, leaves = parse_coupled("((C+D)2+(C+D)2)0")
    assert leaves == ["C", "D", "C", "D"]
    assert tree[3] == 0 and tree[1][3] == 2 and tree[2][3] == 2
    tree, leaves = parse_coupled("((C+(C+D)0)1+D)0")
    assert leaves == ["C", "C", "D", "D"]
    assert tree[1][3] == 1 and tree[1][2][3] == 0


def test_sany_su2_hubbard_vs_builtin():
    """Tutorial-style SU(2) Hubbard chain == the built-in spin-adapted
    Hubbard engine (machine-compiled chains vs hand-derived entries)."""
    L, U, NE = 4, 2.0, 4
    opdefs = {"C": (HUB_C, 1, +1), "D": (HUB_D, 1, -1)}
    ham = SAnySU2Hamil([HUB_MULTS] * L, [opdefs] * L)
    terms = [
        ("(C+D)0",
         [x for i in range(L - 1) for x in [i, i + 1, i + 1, i]], -SQ2),
        ("((C+(C+D)0)1+D)0",
         [x for i in range(L) for x in [i, i, i, i]], U),
    ]
    tt = compile_sany_su2_term_table(ham, terms)
    entries, n_sym, dn, ranks, reg = compile_su2_entries(tt)
    eng = SU2FermionDMRG(
        L, entries, n_sym, dn, target=(NE, 0, 0), bond_dim=200,
        iprint=0, ops=reg, ranks=ranks, site_mults=[HUB_MULTS] * L,
        site_ops={t: {"I": (np.eye(3), 0, 0)} for t in range(L)})
    e = eng.solve(n_sweeps=8, tol=1e-10)
    ref = hubbard_su2_dmrg(L, 1.0, U, n_elec=NE, bond_dim=200)
    eref = ref.solve(n_sweeps=8, tol=1e-10)
    assert abs(e - eref) < 1e-10


def test_sany_su2_driver_hubbard_reference_anchor():
    """Full reference call style (set_symmetry_groups -> initialize_system
    (vacuum/target/hamil_init) -> get_custom_hamiltonian -> coupled
    expr_builder -> get_mpo -> dmrg) against the notebook's printed
    DMRG energy -6.225634144666362 (L=8, U=2, N=8)."""
    L, U, NE = 8, 2.0, 8
    driver = DMRGDriver(SymmetryTypes.SZ)
    driver.set_symmetry_groups("U1Fermi", "SU2", "SU2")
    ops = {"": np.eye(3), "C": HUB_C, "D": HUB_D}
    site_basis = [[((0, 0, 0), 1), ((1, 1, 1), 1), ((2, 0, 0), 1)]
                  for _ in range(L)]
    driver.initialize_system(n_sites=L, vacuum=(0, 0, 0),
                             target=(NE, 0, 0), hamil_init=False)
    driver.get_custom_hamiltonian(site_basis, [ops] * L)
    b = driver.expr_builder()
    b.add_term("(C+D)0",
               [x for i in range(L - 1) for x in [i, i + 1, i + 1, i]],
               -SQ2)
    b.add_term("((C+(C+D)0)1+D)0",
               [x for i in range(L) for x in [i, i, i, i]], U)
    mpo = driver.get_mpo(b.finalize(adjust_order=True))
    ket = driver.get_random_mps(bond_dim=250)
    e = driver.dmrg(mpo, ket, bond_dims=[250] * 4 + [400] * 4,
                    noises=[1e-4] * 4 + [1e-5] * 3 + [0],
                    thrds=[1e-10] * 8, n_sweeps=10, iprint=0)
    assert abs(e - (-6.225634144666362)) < 1e-8


def _tj_dense_ed(L, bonds, J, NE, TWOS):
    """Independent referee: t-J on the projected no-double-occupancy
    space from standard spinful JW fermions on 4^L."""
    nmodes = 2 * L
    dim = 2 ** nmodes

    def cre(m):
        op = np.zeros((dim, dim))
        for s in range(dim):
            if not (s >> m) & 1:
                sgn = (-1.0) ** bin(s & ((1 << m) - 1)).count("1")
                op[s | (1 << m), s] = sgn
        return op

    CU = [cre(2 * t) for t in range(L)]
    CD = [cre(2 * t + 1) for t in range(L)]
    nup = [CU[t] @ CU[t].T for t in range(L)]
    ndn = [CD[t] @ CD[t].T for t in range(L)]
    H = np.zeros((dim, dim))
    for (a, b) in bonds:
        for CA in (CU, CD):
            H += -1.0 * (CA[a] @ CA[b].T + CA[b] @ CA[a].T)
        szA = 0.5 * (nup[a] - ndn[a])
        szB = 0.5 * (nup[b] - ndn[b])
        spA = CU[a] @ CD[a].T
        spB = CU[b] @ CD[b].T
        H += J * (szA @ szB + 0.5 * (spA @ spB.T + spA.T @ spB)
                  - 0.25 * (nup[a] + ndn[a]) @ (nup[b] + ndn[b]))
    keep = []
    for s in range(dim):
        n = sz2 = 0
        ok = True
        for t in range(L):
            u = (s >> (2 * t)) & 1
            d = (s >> (2 * t + 1)) & 1
            if u and d:
                ok = False
                break
            n += u + d
            sz2 += u - d
        if ok and n == NE and sz2 == TWOS:
            keep.append(s)
    return np.linalg.eigvalsh(H[np.ix_(keep, keep)])[0]


def test_sany_su2_tj_model_vs_ed():
    """t-J plaquette with the tutorial's spin-coupled terms
    ("((C+D)2+(C+D)2)0" etc.) vs an independent JW dense ED."""
    LX = LY = 2
    L, J, NE, TWOS = LX * LY, 0.4, 3, 1
    bonds = []
    for i in range(LX):
        for j in range(LY):
            if i + 1 < LX:
                bonds.append((i * LY + j, (i + 1) * LY + j))
            if j + 1 < LY:
                bonds.append((i * LY + j, i * LY + j + 1))
    e_ed = _tj_dense_ed(L, bonds, J, NE, TWOS)

    driver = DMRGDriver(SymmetryTypes.SZ)
    driver.set_symmetry_groups("U1Fermi", "SU2", "SU2")
    C = np.array([[0, 0], [1, 0]])
    D = np.array([[0, SQ2], [0, 0]])
    site_basis = [[((0, 0, 0), 1), ((1, 1, 1), 1)] for _ in range(L)]
    driver.initialize_system(n_sites=L, target=(NE, TWOS, TWOS),
                             hamil_init=False)
    driver.get_custom_hamiltonian(site_basis,
                                  [{"": np.eye(2), "C": C, "D": D}] * L)
    b = driver.expr_builder()
    for (a, bb) in bonds:
        b.add_term("(C+D)0", [a, bb, bb, a], -SQ2)
        b.add_term("((C+D)2+(C+D)2)0", [a, a, bb, bb],
                   J * -(3 ** 0.5) / 2)
        b.add_term("((C+D)0+(C+D)0)0", [a, a, bb, bb], J * -1 / 2)
    mpo = driver.get_mpo(b.finalize())
    ket = driver.get_random_mps(bond_dim=120)
    e = driver.dmrg(mpo, ket, bond_dims=[120], noises=[1e-4, 1e-5, 0],
                    thrds=[1e-11], n_sweeps=10, iprint=0)
    assert abs(e - e_ed) < 1e-9


def test_sany_su2_pure_spin_heisenberg():
    """Pure-spin composition ("SU2", "SU2"): S=1/2 Heisenberg chain via
    an explicit-rank spin operator, vs dense ED.  The S.S bond term is
    -sqrt(3) (T+T)0 with T the rank-1 spin tensor whose reduced element
    in this Wigner-Eckart convention is <1/2||S||1/2> = sqrt(3)/2
    (from <1/2 1/2|S_0|1/2 1/2> = 1/2 = CG(1/2,1,1/2;1/2,0,1/2) * red
    = red/sqrt(3))."""
    L, TWOS = 6, 0
    driver = DMRGDriver(SymmetryTypes.SZ)
    driver.set_symmetry_groups("SU2", "SU2")
    T = np.array([[np.sqrt(3.0) / 2]])
    site_basis = [[((1, 1), 1)] for _ in range(L)]
    driver.initialize_system(n_sites=L, target=(TWOS, TWOS),
                             hamil_init=False)
    driver.get_custom_hamiltonian(site_basis, [{"T": T}] * L,
                                  su2_ranks={"T": 2})
    b = driver.expr_builder()
    for i in range(L - 1):
        # S_i . S_j = -sqrt(3) [T_i x T_j]^0
        b.add_term("(T+T)0", [i, i + 1], -np.sqrt(3.0))
    mpo = driver.get_mpo(b.finalize())
    ket = driver.get_random_mps(bond_dim=60)
    e = driver.dmrg(mpo, ket, bond_dims=[60], noises=[1e-4, 1e-5, 0],
                    thrds=[1e-11], n_sweeps=8, iprint=0)
    # dense ED referee
    sz = np.diag([0.5, -0.5])
    sp = np.array([[0, 1.0], [0, 0]])
    H = np.zeros((2 ** L, 2 ** L))

    def emb(op, t):
        m = np.ones((1, 1))
        for s in range(L):
            m = np.kron(m, op if s == t else np.eye(2))
        return m

    for i in range(L - 1):
        H += emb(sz, i) @ emb(sz, i + 1)
        H += 0.5 * (emb(sp, i) @ emb(sp.T, i + 1)
                    + emb(sp.T, i) @ emb(sp, i + 1))
    e_ed = np.linalg.eigvalsh(H)[0]
    assert abs(e - e_ed) < 1e-9


@pytest.mark.slow
def test_sany_su2_tj_4x4_reference_anchor():
    """The reference tutorial's 4x4 t-J lattice (J=0.4, N=14, 1/8
    doping, snake ordering): printed DMRG energy -9.029868687175632.
    Measured here: -9.0298686872 by sweep 3 at D=250->500."""
    LX = LY = 4
    L, J, NE, TWOS = LX * LY, 0.4, 14, 0
    driver = DMRGDriver(SymmetryTypes.SZ)
    driver.set_symmetry_groups("U1Fermi", "SU2", "SU2")
    C = np.array([[0, 0], [1, 0]])
    D = np.array([[0, SQ2], [0, 0]])
    site_basis = [[((0, 0, 0), 1), ((1, 1, 1), 1)] for _ in range(L)]
    driver.initialize_system(n_sites=L, target=(NE, TWOS, TWOS),
                             hamil_init=False)
    driver.get_custom_hamiltonian(site_basis,
                                  [{"": np.eye(2), "C": C, "D": D}] * L)
    b = driver.expr_builder()

    def f(i, j):
        return i * LY + j if i % 2 == 0 else i * LY + LY - 1 - j

    for i in range(LX):
        for j in range(LY):
            nbs = ([(i + 1, j)] if i + 1 < LX else []) \
                + ([(i, j + 1)] if j + 1 < LY else [])
            for nb in nbs:
                a, bb = f(i, j), f(*nb)
                b.add_term("(C+D)0", [a, bb, bb, a], -SQ2)
                b.add_term("((C+D)2+(C+D)2)0", [a, a, bb, bb],
                           J * -(3 ** 0.5) / 2)
                b.add_term("((C+D)0+(C+D)0)0", [a, a, bb, bb],
                           J * -1 / 2)
    mpo = driver.get_mpo(b.finalize(adjust_order=True))
    ket = driver.get_random_mps(bond_dim=250)
    e = driver.dmrg(mpo, ket, bond_dims=[250] * 2 + [500] * 4,
                    noises=[1e-4] * 2 + [1e-5] * 2 + [0],
                    thrds=[1e-9] * 6, n_sweeps=6, iprint=0)
    assert abs(e - (-9.029868687175632)) < 1e-7


def test_sany_su2_rejects_bad_compositions():
    drv = DMRGDriver(SymmetryTypes.SZ)
    with pytest.raises(NotImplementedError):
        drv.set_symmetry_groups("SU2", "U1Fermi", "SU2")
    with pytest.raises(NotImplementedError):
        drv.set_symmetry_groups("U1Fermi", "LZ", "SU2", "SU2")

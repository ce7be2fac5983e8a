"""Runtime-composable symmetry (SAny analog) + custom Hamiltonians
(reference src/core/symmetry.hpp:58 SAnyT, pyblock2 core.py:507
set_symmetry_groups / :2430 get_custom_hamiltonian)."""

import numpy as np

from block2_preview_tpu.driver.core import DMRGDriver, SymmetryTypes
from block2_preview_tpu.dmrg.sweep import DMRG


def _solve(drv, mpo, target, bond_dim=120, n_sweeps=8):
    mps = drv.get_random_mps(bond_dim, target=target)
    d = DMRG(mpo, mps, iprint=0)
    return d.solve([bond_dim], [1e-4, 1e-5, 0], [1e-10],
                   n_sweeps=n_sweeps, tol=1e-11)


def test_sany_custom_hubbard_u1fermi_u1():
    """(U1Fermi charge, U1 2Sz) custom site basis must reproduce the
    built-in SZ Hubbard result (reference custom-Hamiltonian examples
    reproduce HamiltonianQC)."""
    L, t, u = 6, 1.0, 2.0
    drv = DMRGDriver(SymmetryTypes.SZ)
    drv.set_symmetry_groups("U1Fermi", "U1")
    # |0>, |up>, |dn>, |updn>
    basis = [[((0, 0), 1), ((1, 1), 1), ((1, -1), 1), ((2, 0), 1)]] * L
    c = np.zeros((4, 4)); c[1, 0] = 1.0; c[3, 2] = 1.0
    C = np.zeros((4, 4)); C[2, 0] = 1.0; C[3, 1] = -1.0
    ops = [{"c": c, "d": c.T.copy(), "C": C, "D": C.T.copy()}] * L
    drv.get_custom_hamiltonian(basis, ops)
    b = drv.expr_builder()
    for i in range(L - 1):
        b.add_term("cd", [i, i + 1], -t)
        b.add_term("cd", [i + 1, i], -t)
        b.add_term("CD", [i, i + 1], -t)
        b.add_term("CD", [i + 1, i], -t)
    for i in range(L):
        b.add_term("cdCD", [i, i, i, i], u)
    mpo = drv.get_mpo(b.finalize())
    e = _solve(drv, mpo, (L, 0))
    # HUBBARD-L6 U=2 open chain FCI ground state
    assert abs(e - (-4.5463137943)) < 1e-8


def test_sany_spinless_fermions_u1fermi():
    """Single U1Fermi factor: spinless t-V chain vs dense ED."""
    L, t, v = 8, 1.0, 1.5
    drv = DMRGDriver(SymmetryTypes.SZ)
    drv.set_symmetry_groups("U1Fermi")
    basis = [[((0,), 1), ((1,), 1)]] * L
    c = np.zeros((2, 2)); c[1, 0] = 1.0
    ops = [{"c": c, "d": c.T.copy()}] * L
    drv.get_custom_hamiltonian(basis, ops)
    b = drv.expr_builder()
    for i in range(L - 1):
        b.add_term("cd", [i, i + 1], -t)
        b.add_term("cd", [i + 1, i], -t)
        b.add_term("cdcd", [i, i, i + 1, i + 1], v)
    mpo = drv.get_mpo(b.finalize())
    e = _solve(drv, mpo, (L // 2,))

    # dense ED with JW strings
    cz = np.diag([1.0, -1.0])
    def op_at(mat, i):
        out = np.eye(1)
        for s in range(L):
            out = np.kron(out, mat if s == i else
                          (cz if s < i else np.eye(2)))
        return out
    cs = [op_at(c, i) for i in range(L)]
    h = np.zeros((2 ** L, 2 ** L))
    for i in range(L - 1):
        h += -t * (cs[i] @ cs[i + 1].T + cs[i + 1] @ cs[i].T)
        n_i = cs[i] @ cs[i].T
        n_j = cs[i + 1] @ cs[i + 1].T
        h += v * (n_i @ n_j)
    nvec = sum(cs[i] @ cs[i].T for i in range(L))
    sel = np.isclose(np.diag(nvec), L // 2)
    e_ed = np.linalg.eigvalsh(h[np.ix_(sel, sel)])[0]
    assert abs(e - e_ed) < 1e-9


def test_sany_z3_clock_model():
    """Bosonic Z3 factor: 3-state Potts/clock chain vs dense ED."""
    L, f, j = 6, 0.7, 1.0
    drv = DMRGDriver(SymmetryTypes.SZ)
    drv.set_symmetry_groups("Z3")
    basis = [[((k,), 1) for k in range(3)]] * L
    # Z3 charge-raising op sigma (|k> -> |k+1>) and the diagonal clock
    # tau = diag(1, w, w^2) would be complex; use the real symmetric
    # combination (tau + tau^+) = diag(2, -1, -1)
    sig = np.zeros((3, 3))
    for k in range(3):
        sig[(k + 1) % 3, k] = 1.0
    tau_r = np.diag([2.0, -1.0, -1.0])
    ops = [{"s": sig, "t": sig.T.copy(), "z": tau_r}] * L
    drv.get_custom_hamiltonian(basis, ops)
    b = drv.expr_builder()
    for i in range(L):
        b.add_term("z", [i], -f)
    for i in range(L - 1):
        b.add_term("st", [i, i + 1], -j)
        b.add_term("ts", [i, i + 1], -j)
    mpo = drv.get_mpo(b.finalize())
    e = _solve(drv, mpo, (0,))

    def kr(mat, i):
        out = np.eye(1)
        for s in range(L):
            out = np.kron(out, mat if s == i else np.eye(3))
        return out
    h = np.zeros((3 ** L, 3 ** L))
    for i in range(L):
        h += -f * kr(tau_r, i)
    for i in range(L - 1):
        h += -j * (kr(sig, i) @ kr(sig.T, i + 1)
                   + kr(sig.T, i) @ kr(sig, i + 1))
    # Z3 charge of a product state
    charges = np.zeros(3 ** L, dtype=np.int64)
    for i in range(L):
        digit = (np.arange(3 ** L) // 3 ** (L - 1 - i)) % 3
        charges = (charges + digit) % 3
    sel = charges == 0
    e_ed = np.linalg.eigvalsh(h[np.ix_(sel, sel)])[0]
    assert abs(e - e_ed) < 1e-8


def test_sany_su2_factor_accepted():
    # SU2 pairs in SAny compositions are served by the SAnySU2 route
    # (tests/test_sany_su2.py); unsupported layouts still raise
    import pytest
    drv = DMRGDriver(SymmetryTypes.SZ)
    drv.set_symmetry_groups("U1Fermi", "SU2", "SU2")
    assert drv._sany_su2 == {"n_slot": 0, "su2_slot": 1}
    with pytest.raises(NotImplementedError):
        DMRGDriver(SymmetryTypes.SZ).set_symmetry_groups(
            "U1Fermi", "AbelianPG", "SU2", "SU2")

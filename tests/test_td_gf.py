"""Time evolution and Green's function tests (mirrors reference
unit_test/test_real_te_h10_sto6g.cpp, test_itddmrg_h8_sto6g.cpp,
test_green_func_h10_sto6g.cpp tiers, on the small 6-orbital system)."""

import numpy as np
import pytest

from block2_preview_tpu.core.expr import build_term_table, qc_term_table
from block2_preview_tpu.core.blocks import MPSTensor
from block2_preview_tpu.dmrg import expect as EXP
from block2_preview_tpu.dmrg.greens import GreensFunction
from block2_preview_tpu.dmrg.linear import Linear
from block2_preview_tpu.dmrg.mps import MPS
from block2_preview_tpu.dmrg.sweep import DMRG
from block2_preview_tpu.dmrg.tdvp import TimeEvolution
from block2_preview_tpu.driver.core import DMRGDriver
from block2_preview_tpu.ops.local_ops import DES_A
from block2_preview_tpu.utils.ed import sector_indices, term_table_to_sparse


@pytest.fixture(scope="module")
def driver6():
    drv = DMRGDriver()
    fd = drv.read_fcidump("/root/reference/tests/driver/FCIDUMP")
    mpo = drv.get_qc_mpo(fcidump=fd)
    gs = drv.get_random_mps(150, seed=2)
    d = DMRG(mpo, gs, iprint=0)
    e0 = d.solve([150], [1e-4, 1e-5, 0], [1e-10], n_sweeps=6, tol=1e-11)
    return drv, fd, mpo, gs, e0


def _copy_mps(m):
    return MPS(m.info, [MPSTensor(t.group,
                                  {k: v.copy() for k, v in t.blocks.items()})
                        for t in m.tensors], m.center)


def test_imaginary_time_relaxation(driver6):
    drv, fd, mpo, gs, e0 = driver6
    mps = drv.get_random_mps(100, seed=5)
    te = TimeEvolution(mpo, mps, imaginary=True, iprint=0)
    te.solve(10, 0.5, 100)
    e_early = te.energies[-1]
    te.solve(10, 0.5, 100)
    e_late = te.energies[-1]
    # monotone approach to the ground state
    assert e_late <= e_early + 1e-10
    assert e_late - e0 < 0.02


def test_real_time_phase(driver6):
    drv, fd, mpo, gs, e0 = driver6
    mps = _copy_mps(gs)
    ket0 = _copy_mps(gs)
    te = TimeEvolution(mpo, mps, imaginary=False, iprint=0)
    dt, nst = 0.05, 3
    te.solve(nst, dt, 150)
    g = mps.group
    env = {(g.zero, g.zero): np.ones((1, 1))}
    for t in range(mps.n_sites):
        env = EXP._transfer_identity(env, ket0.tensors[t], mps.tensors[t])
    tgt = mps.info.target
    ov = env[(tgt, tgt)][0, 0]
    phase = np.exp(-1j * (e0 - mpo.const_e) * nst * dt)
    assert abs(abs(ov) - 1.0) < 1e-8      # norm conservation
    assert abs(ov - phase) < 1e-7          # exact eigenstate phase


def test_greens_function_vs_ed(driver6):
    drv, fd, mpo, gs, e0 = driver6
    smpo = drv.get_site_mpo("d", 0)
    tb = (fd.n_elec - 1, fd.twos - 1, int(fd.orb_sym[0]))
    bmps = drv.get_random_mps(150, target=tb, seed=11)
    Linear(bmps, [(smpo, gs)]).solve(150, n_sweeps=6)
    x = drv.get_random_mps(150, target=tb, seed=13)
    gf = GreensFunction(mpo, bmps, x, iprint=0)
    omega, eta = e0 - 0.4, 0.05
    G = gf.solve(omega, eta, 150, n_sweeps=6)

    tt = qc_term_table(fd)
    h = term_table_to_sparse(tt)
    ixN = sector_indices(fd.n_sites, fd.n_elec, fd.twos)
    ixM = sector_indices(fd.n_sites, fd.n_elec - 1, fd.twos - 1)
    hN = h[np.ix_(ixN, ixN)].toarray() + fd.const_e * np.eye(len(ixN))
    hM = h[np.ix_(ixM, ixM)].toarray() + fd.const_e * np.eye(len(ixM))
    wN, vN = np.linalg.eigh(hN)
    gsv = vN[:, 0]
    ct = build_term_table(fd.n_sites, [(1.0, [(0, DES_A)])])
    cmat = term_table_to_sparse(ct).toarray()
    bvec = cmat[np.ix_(ixM, ixN)] @ gsv
    zz = omega + 1j * eta
    Ged = bvec.conj() @ np.linalg.solve(
        zz * np.eye(len(ixM)) - hM, bvec)
    assert abs(G - Ged) < 5e-5


def test_greens_function_squared_vs_complex(driver6):
    """Real-arithmetic squared-operator GF (reference
    effective_functions.hpp:292 greens_function_squared) matches the
    complex correction-vector solve, with and without harmonic-Davidson
    deflation."""
    from block2_preview_tpu.dmrg.greens import GreensFunctionSquared
    drv, fd, mpo, gs, e0 = driver6
    smpo = drv.get_site_mpo("d", 0)
    tb = (fd.n_elec - 1, fd.twos - 1, int(fd.orb_sym[0]))
    bmps = drv.get_random_mps(150, target=tb, seed=11)
    Linear(bmps, [(smpo, gs)]).solve(150, n_sweeps=6)
    omega, eta = e0 - 0.4, 0.05
    x = drv.get_random_mps(150, target=tb, seed=13)
    G_cpx = GreensFunction(mpo, bmps, x, iprint=0).solve(
        omega, eta, 150, n_sweeps=6)
    x2 = drv.get_random_mps(150, target=tb, seed=13)
    G_sq = GreensFunctionSquared(mpo, bmps, x2, iprint=0).solve(
        omega, eta, 150, n_sweeps=6)
    assert abs(G_sq - G_cpx) < 5e-5, (G_sq, G_cpx)
    x3 = drv.get_random_mps(150, target=tb, seed=13)
    G_hp = GreensFunctionSquared(mpo, bmps, x3, iprint=0,
                                 n_harmonic_projection=2).solve(
        omega, eta, 150, n_sweeps=6)
    assert abs(G_hp - G_cpx) < 5e-5, (G_hp, G_cpx)


def test_greens_function_solver_family(driver6):
    """GCROT(m,k) and IDR(s) local solvers reproduce the GMRES correction
    vector (reference Linear solver_type cycling GCROT/IDRS/LSQR,
    src/core/iterative_matrix_functions.hpp:2303,2554,2988)."""
    drv, fd, mpo, gs, e0 = driver6
    smpo = drv.get_site_mpo("d", 0)
    tb = (fd.n_elec - 1, fd.twos - 1, int(fd.orb_sym[0]))
    bmps = drv.get_random_mps(120, target=tb, seed=11)
    Linear(bmps, [(smpo, gs)]).solve(120, n_sweeps=5)
    omega, eta = e0 - 0.4, 0.05
    vals = {}
    for solver in ("gmres", "gcrotmk", "idrs"):
        x = drv.get_random_mps(120, target=tb, seed=13)
        gf = GreensFunction(mpo, bmps, x, iprint=0, solver=solver)
        vals[solver] = gf.solve(omega, eta, 120, n_sweeps=4)
    for solver in ("gcrotmk", "idrs"):
        assert abs(vals[solver] - vals["gmres"]) < 1e-5, (solver, vals)


def test_mps_orbital_rotation():
    """|psi'> = exp(G)|psi> with G the one-body rotation generator
    (reference mps orbital rotation, test_rotation_h10_sto6g.cpp
    semantics): the rotated MPS with rotated integrals reproduces the
    original energy."""
    import scipy.linalg as sla
    from block2_preview_tpu.dmrg.expect import mpo_expectation
    drv = DMRGDriver()
    fd = drv.read_fcidump("/root/reference/data/HUBBARD-L6.FCIDUMP")
    mpo = drv.get_qc_mpo(fcidump=fd)
    gs = drv.get_random_mps(120, seed=2)
    e0 = DMRG(mpo, gs, iprint=0).solve(
        [120], [1e-4, 1e-5, 0], [1e-10], n_sweeps=8, tol=1e-11)
    L = fd.n_sites
    rng = np.random.RandomState(5)
    k = rng.standard_normal((L, L)) * 0.12
    kappa = k - k.T
    U = sla.expm(kappa)
    mps = _copy_mps(gs)
    drv.orbital_rotation(mps, kappa, bond_dim=200, n_steps=30)
    # rotated integrals: h' = U h U^T, g' = (U^T per index) g — the
    # residual is the second-order Trotter error of the unit-time TDVP
    h2 = U @ fd.h1e @ U.T
    g2 = np.einsum("pi,qj,rk,sl,pqrs->ijkl", U.T, U.T, U.T, U.T,
                   fd.g2e, optimize=True)
    mpo2 = drv.get_qc_mpo(h1e=h2, g2e=g2, ecore=fd.const_e)
    e_rot = np.real(mpo_expectation(mpo2, mps)) + fd.const_e
    assert abs(e_rot - e0) < 3e-4, (e_rot, e0)
    # and the UNrotated Hamiltonian no longer matches (sanity)
    e_mix = np.real(mpo_expectation(mpo, mps)) + fd.const_e
    assert abs(e_mix - e0) > 1e-3

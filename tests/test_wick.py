"""Wick-engine tests (reference unit_test/test_wick_*.cpp tier): Fermi-vacuum
contractions anchored numerically, plus MP2 on top."""

import numpy as np

from block2_preview_tpu.core.expr import qc_term_table
from block2_preview_tpu.core.fcidump import FCIDUMP
from block2_preview_tpu.ic.wick import (E1, E2, OCC, VIR, Op, Term, WickExpr,
                                        evaluate, vacuum_expectation)
from block2_preview_tpu.uc.mp import hf_energy_and_fock, mp2_energy
from block2_preview_tpu.utils.ed import ground_state_energy


def _random_antisym(n, seed=0):
    rng = np.random.RandomState(seed)
    v = rng.standard_normal((n, n, n, n))
    v = v - v.transpose(1, 0, 2, 3)
    v = v + v.transpose(2, 3, 0, 1)
    return 0.5 * (v - v.transpose(0, 1, 3, 2))


def test_reference_energy_identity():
    # <Phi| H |Phi> = sum_i h_ii + 1/2 sum_ij <ij||ij>
    H = E1("h", "p", "q") + E2("v", "p", "q", "r", "s", 0.25)
    eref = vacuum_expectation(H)
    n, no = 8, 3
    rng = np.random.RandomState(0)
    h = rng.standard_normal((n, n))
    h = h + h.T
    v = _random_antisym(n)
    spaces = {OCC: np.arange(no), VIR: np.arange(no, n)}
    val = evaluate(eref, {"h": h, "v": v}, spaces)
    occ = np.arange(no)
    ref = np.sum(np.diag(h)[occ]) \
        + 0.5 * np.einsum("ijij->", v[np.ix_(occ, occ, occ, occ)])
    assert abs(val - ref) < 1e-12


def test_v_t2_contraction():
    # <Phi| V T2 |Phi> = 1/4 sum_ijab <ij||ab> t_abij
    V = E2("v", "p", "q", "r", "s", 0.25)
    T2 = WickExpr([Term(0.25, (("t", ("a", "b", "i", "j")),),
                        (Op("a", True), Op("b", True),
                         Op("j", False), Op("i", False)))])
    expr = vacuum_expectation(V * T2)
    n, no = 7, 3
    v = _random_antisym(n, seed=1)
    rng = np.random.RandomState(2)
    t = rng.standard_normal((n, n, n, n))
    t = t - t.transpose(1, 0, 2, 3)
    t = t - t.transpose(0, 1, 3, 2)
    occ = np.arange(no)
    vir = np.arange(no, n)
    spaces = {OCC: occ, VIR: vir}
    val = evaluate(expr, {"v": v, "t": t}, spaces)
    ref = 0.25 * np.einsum(
        "ijab,abij->", v[np.ix_(occ, occ, vir, vir)],
        t[np.ix_(vir, vir, occ, occ)])
    assert abs(val - ref) < 1e-12


def test_mp2_improves_on_hf():
    fd = FCIDUMP.hubbard(4, u=2.0, t=1.0)
    # rotate to the HF (momentum) basis so the Fock matrix is diagonal
    k = fd.n_sites
    hmat = fd.h1e
    w, c = np.linalg.eigh(hmat)
    fd2 = FCIDUMP(n_sites=k, n_elec=fd.n_elec, twos=0,
                  orb_sym=np.zeros(k, dtype=np.int64),
                  h1e=c.T @ hmat @ c,
                  g2e=np.einsum("pi,qj,rk,sl,pqrs->ijkl", c, c, c, c,
                                fd.g2e, optimize=True))
    e_hf, e2 = mp2_energy(fd2)
    e_fci = ground_state_energy(qc_term_table(fd), fd.n_elec, fd.twos)[0]
    assert e2 < 0
    assert e_hf > e_fci - 1e-12
    # MP2 moves toward FCI
    assert abs((e_hf + e2) - e_fci) < abs(e_hf - e_fci)

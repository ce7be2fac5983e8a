"""GCCSDT (full t3; cc/gccsdt.py) validation:
1. the generated E/R1/R2/R3 expressions equal the dense Fock-space
   <proj| e^{-T} H e^{T} |Phi> with RANDOM t1/t2/t3 (machine-precision
   referee; reference pyblock2/cc/gccsdt.py is the parser-derived
   counterpart);
2. with t3 = 0 the R1/R2 residuals reduce to the CCSD ones;
3. solved CCSDT energy on H4 lands between CCSD and FCI, closer to FCI.
"""

import numpy as np
import pytest
import scipy.linalg as sla

from block2_preview_tpu.cc.gccsdt import GCCSDT, _deex3, gen_ccsdt_expr
from block2_preview_tpu.core.expr import build_term_table, qc_term_table
from block2_preview_tpu.core.fcidump import FCIDUMP
from block2_preview_tpu.ops.local_ops import CRE_A, CRE_B, DES_A, DES_B
from block2_preview_tpu.utils.ed import term_table_to_sparse


def _so_ops(p, dag):
    orb, sp = p // 2, p % 2
    code = (CRE_A if sp == 0 else CRE_B) if dag else \
        (DES_A if sp == 0 else DES_B)
    return (orb, code)


def _random_system(n=3, nelec=3, seed=3):
    rng = np.random.RandomState(seed)
    h1 = rng.standard_normal((n, n))
    h1 = 0.5 * (h1 + h1.T) * 0.3 + np.diag(np.arange(n) - 0.7)
    g2 = rng.standard_normal((n,) * 4) * 0.1
    g2 = g2 + g2.transpose(1, 0, 2, 3)
    g2 = g2 + g2.transpose(0, 1, 3, 2)
    g2 = g2 + g2.transpose(2, 3, 0, 1)
    g2 = g2 * 0.05
    fd = FCIDUMP(n_sites=n, n_elec=nelec, twos=nelec % 2, ipg=0,
                 orb_sym=[0] * n, h1e=h1, g2e=g2, const_e=0.0)
    return fd, rng


def test_ccsdt_residuals_vs_dense_fock_space():
    n, nelec = 3, 3
    fd, rng = _random_system(n, nelec)
    nso = 2 * n
    no, nv = nelec, nso - nelec
    occ_so = list(range(no))
    vir_so = list(range(no, nso))
    t1 = rng.standard_normal((nv, no)) * 0.1
    t2 = rng.standard_normal((nv, nv, no, no)) * 0.1
    t2 = t2 - t2.transpose(1, 0, 2, 3)
    t2 = t2 - t2.transpose(0, 1, 3, 2)
    t3 = rng.standard_normal((nv, nv, nv, no, no, no)) * 0.1
    # antisymmetrize t3 over (abc) and (ijk)
    from itertools import permutations

    def asym(x, axes):
        out = np.zeros_like(x)
        for p in permutations(range(3)):
            sg = np.sign(np.prod([p[i] - p[j]
                                  for i in range(3)
                                  for j in range(i + 1, 3)]))
            perm = list(range(6))
            for k, pk in enumerate(p):
                perm[axes[k]] = axes[pk]
            out = out + sg * x.transpose(perm)
        return out
    t3 = asym(asym(t3, (0, 1, 2)), (3, 4, 5))

    # dense T operator in the 4^n Fock space
    terms = []
    for a_, a in enumerate(vir_so):
        for i_, i in enumerate(occ_so):
            terms.append((t1[a_, i_],
                          [_so_ops(a, True), _so_ops(i, False)]))
    for a_, a in enumerate(vir_so):
        for b_, b in enumerate(vir_so):
            for i_, i in enumerate(occ_so):
                for j_, j in enumerate(occ_so):
                    terms.append((0.25 * t2[a_, b_, i_, j_],
                                  [_so_ops(a, True), _so_ops(b, True),
                                   _so_ops(j, False),
                                   _so_ops(i, False)]))
    for a_, a in enumerate(vir_so):
        for b_, b in enumerate(vir_so):
            for c_, c in enumerate(vir_so):
                for i_, i in enumerate(occ_so):
                    for j_, j in enumerate(occ_so):
                        for k_, k in enumerate(occ_so):
                            terms.append(
                                (t3[a_, b_, c_, i_, j_, k_] / 36.0,
                                 [_so_ops(a, True), _so_ops(b, True),
                                  _so_ops(c, True), _so_ops(k, False),
                                  _so_ops(j, False),
                                  _so_ops(i, False)]))
    T = term_table_to_sparse(build_term_table(n, terms)).toarray()
    H = term_table_to_sparse(qc_term_table(fd)).toarray()
    Hbar = sla.expm(-T) @ H @ sla.expm(T)
    # reference determinant: occ spin-orbitals 0..no-1
    codes = np.zeros(n, dtype=np.int64)
    for so in occ_so:
        orb, sp = so // 2, so % 2
        codes[orb] |= (1 if sp == 0 else 2)
    code_map = {0: 0, 1: 1, 2: 2, 3: 3}
    idx = 0
    for orb in range(n):
        idx = idx * 4 + code_map[int(codes[orb])]
    phi = np.zeros(4 ** n)
    phi[idx] = 1.0

    solver = GCCSDT(fd)
    e, r1, r2, r3 = solver.residuals(t1, t2, t3)
    e_exact = float(phi @ Hbar @ phi)
    assert abs(e - e_exact) < 1e-10, (e, e_exact)

    # one R1 / R2 / R3 element each against dense projections
    i, a = 0, no + 1
    P1 = term_table_to_sparse(build_term_table(n, [
        (1.0, [_so_ops(i, True), _so_ops(a, False)])])).toarray()
    r1_exact = float(phi @ (P1 @ Hbar) @ phi)
    assert abs(r1[0, 1] - r1_exact) < 1e-10, (r1[0, 1], r1_exact)

    i, j, a, b = 0, 1, no + 0, no + 1
    P2 = term_table_to_sparse(build_term_table(n, [
        (1.0, [_so_ops(i, True), _so_ops(j, True),
               _so_ops(b, False), _so_ops(a, False)])])).toarray()
    r2_exact = float(phi @ (P2 @ Hbar) @ phi)
    assert abs(r2[0, 0, 1, 1] - r2_exact) < 1e-10, \
        (r2[0, 0, 1, 1], r2_exact)

    i, j, k = 0, 1, 2
    a, b, c = no + 0, no + 1, no + 2
    P3 = term_table_to_sparse(build_term_table(n, [
        (1.0, [_so_ops(i, True), _so_ops(j, True), _so_ops(k, True),
               _so_ops(c, False), _so_ops(b, False),
               _so_ops(a, False)])])).toarray()
    r3_exact = float(phi @ (P3 @ Hbar) @ phi)
    assert abs(r3[0, 0, 1, 1, 2, 2] - r3_exact) < 1e-10, \
        (r3[0, 0, 1, 1, 2, 2], r3_exact)


def test_ccsdt_t3zero_reduces_to_ccsd():
    from block2_preview_tpu.cc.wick_cc import (_deex_ops, _gen_expr)
    from block2_preview_tpu.ic.wick import evaluate_tensor
    fd, rng = _random_system(2, 2, seed=9)
    solver = GCCSDT(fd)
    no, nv = solver.no, solver.nv
    t1 = rng.standard_normal((nv, no)) * 0.1
    t2 = rng.standard_normal((nv, nv, no, no)) * 0.1
    t2 = t2 - t2.transpose(1, 0, 2, 3)
    t2 = t2 - t2.transpose(0, 1, 3, 2)
    t3 = np.zeros((nv, nv, nv, no, no, no))
    e, r1, r2, _r3 = solver.residuals(t1, t2, t3)
    t = solver._tensors(t1, t2, t3)
    ex1 = _gen_expr(_deex_ops(("i0", "a0")), ())
    r1_ccsd = evaluate_tensor(ex1, t, solver.spaces, ["i0", "a0"])
    assert np.abs(r1 - r1_ccsd).max() < 1e-10
    ex2 = _gen_expr(_deex_ops(("i0", "a0", "j0", "b0")), ())
    r2_ccsd = evaluate_tensor(ex2, t, solver.spaces,
                              ["i0", "a0", "j0", "b0"])
    assert np.abs(r2 - r2_ccsd).max() < 1e-10


@pytest.mark.slow
def test_ccsdt_equals_fci_for_three_electrons():
    """CCSDT is exact for <= 3 electrons (no quadruples possible):
    the solved energy must match FCI to solver precision.  (H4/STO-6G
    is alternant-symmetric — odd-rank amplitudes vanish identically —
    so a symmetry-broken 3-electron system is the discriminating
    anchor, same role as CCSD == FCI for 2 electrons in test_cc.)"""
    from block2_preview_tpu.cc.gccsd import gccsd
    from block2_preview_tpu.core.expr import qc_term_table
    from block2_preview_tpu.utils.ed import ground_state_energy
    fd, _rng = _random_system(3, 3, seed=21)
    e_hf, e_ccsd = gccsd(fd)
    e_hf3, e_ccsdt = GCCSDT(fd, max_iter=40, conv=1e-8).kernel()
    assert abs(e_hf - e_hf3) < 1e-9
    e_fci = float(ground_state_energy(qc_term_table(fd), fd.n_elec,
                                      fd.twos)[0]) + fd.const_e
    c_sd = e_hf + e_ccsd
    c_sdt = e_hf3 + e_ccsdt
    assert abs(c_sdt - e_fci) < 1e-7, (c_sdt, e_fci)
    assert abs(c_sdt - e_fci) < abs(c_sd - e_fci) + 1e-12

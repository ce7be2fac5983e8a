"""Machine-generated spatial (UGA-factorized) closed-shell CCSD
(cc/rccsd_eq.py) vs the spin-orbital GCCSD backend and a dense
Fock-space similarity-transform referee (reference pyblock2/cc/rccsd.py
is the hand-derived counterpart of these equations)."""

import numpy as np
import pytest

from block2_preview_tpu.cc.gccsd import gccsd
from block2_preview_tpu.cc.rccsd_eq import SpatialCCSD, rccsd_spatial
from block2_preview_tpu.core.fcidump import FCIDUMP


@pytest.mark.slow
def test_rccsd_spatial_h2_equals_gccsd():
    """CCSD == FCI for two electrons; both engines must agree."""
    fd = FCIDUMP.parse("/root/reference/data/H2.PVDZ.FCIDUMP.C1")
    e_hf_g, e_g = gccsd(fd)
    e_hf_s, e_s = rccsd_spatial(fd)
    assert abs(e_hf_g - e_hf_s) < 1e-10
    assert abs(e_g - e_s) < 1e-8


def test_rccsd_spatial_h4():
    fd = FCIDUMP.parse("/root/reference/data/H4.STO6G.R1.8.FCIDUMP")
    e_hf_g, e_g = gccsd(fd)
    e_hf_s, e_s = rccsd_spatial(fd)
    assert abs(e_g - e_s) < 1e-8


@pytest.mark.slow
def test_rccsd_spatial_n2_cas():
    fd = FCIDUMP.parse("/root/reference/data/N2.CAS.6-31G.FCIDUMP")
    e_hf_g, e_g = gccsd(fd)
    e_hf_s, e_s = rccsd_spatial(fd)
    assert abs(e_g - e_s) < 1e-8


def test_generated_residuals_vs_dense_fock_space():
    """R1/R2/E from the BCH-generated Wick expressions must equal the
    dense Fock-space <proj| e^{-T} H e^{T} |Phi> on a random 2-orbital
    system with random amplitudes (machine-precision referee)."""
    import scipy.linalg as sla

    from block2_preview_tpu.cc.rccsd_eq import _bch_projected
    from block2_preview_tpu.cc.wick_cc import _deex_ops
    from block2_preview_tpu.core.expr import (build_term_table,
                                              qc_term_table)
    from block2_preview_tpu.ic.wick import OCC, VIR, evaluate_tensor
    from block2_preview_tpu.ops.local_ops import (CRE_A, CRE_B, DES_A,
                                                  DES_B)
    from block2_preview_tpu.utils.ed import term_table_to_sparse

    rng = np.random.RandomState(5)
    n = 2
    h1 = rng.standard_normal((n, n))
    h1 = 0.5 * (h1 + h1.T) * 0.3 + np.diag([-1.0, 0.5])
    g2 = rng.standard_normal((n,) * 4) * 0.1
    g2 = (g2 + g2.transpose(1, 0, 2, 3) + g2.transpose(0, 1, 3, 2)
          + g2.transpose(1, 0, 3, 2))
    g2 = g2 + g2.transpose(2, 3, 0, 1)
    g2 = g2 * 0.1 + np.einsum("ij,kl->ijkl", np.eye(n), np.eye(n)) * 0.5
    fd = FCIDUMP(n_sites=n, n_elec=2, twos=0, ipg=0, orb_sym=None,
                 h1e=h1, g2e=g2, const_e=0.0)
    t1so = rng.standard_normal((2, 2)) * 0.1
    t2so = rng.standard_normal((2, 2, 2, 2)) * 0.1
    t2so = t2so - t2so.transpose(1, 0, 2, 3)
    t2so = t2so - t2so.transpose(0, 1, 3, 2)

    def so_ops(p, dag):
        orb, sp = p // 2, p % 2
        code = (CRE_A if sp == 0 else CRE_B) if dag else \
            (DES_A if sp == 0 else DES_B)
        return (orb, code)

    terms = []
    occ_so, vir_so = [0, 1], [2, 3]
    for i_, i in enumerate(occ_so):
        for a_, a in enumerate(vir_so):
            terms.append((t1so[i_, a_],
                          [so_ops(a, True), so_ops(i, False)]))
    for i_, i in enumerate(occ_so):
        for j_, j in enumerate(occ_so):
            for a_, a in enumerate(vir_so):
                for b_, b in enumerate(vir_so):
                    terms.append((0.25 * t2so[i_, j_, a_, b_],
                                  [so_ops(a, True), so_ops(b, True),
                                   so_ops(j, False), so_ops(i, False)]))
    T = term_table_to_sparse(build_term_table(n, terms)).toarray()
    H = term_table_to_sparse(qc_term_table(fd)).toarray()
    Hbar = sla.expm(-T) @ H @ sla.expm(T)
    phi = np.zeros(4 ** n)
    phi[12] = 1.0      # |2, 0> doubly occupied first orbital
    P2 = term_table_to_sparse(build_term_table(n, [
        (1.0, [so_ops(0, True), so_ops(1, True),
               so_ops(3, False), so_ops(2, False)])])).toarray()
    P1 = term_table_to_sparse(build_term_table(n, [
        (1.0, [so_ops(0, True), so_ops(2, False)])])).toarray()
    r2_exact = float(phi @ (P2 @ Hbar) @ phi)
    r1_exact = float(phi @ (P1 @ Hbar) @ phi)
    e_exact = float(phi @ Hbar @ phi)

    occ, vir = np.arange(2), np.arange(2, 4)
    t1g = np.zeros((4, 4))
    t1g[np.ix_(vir, occ)] = t1so.T
    t2g = np.zeros((4,) * 4)
    t2g[np.ix_(vir, vir, occ, occ)] = t2so.transpose(2, 3, 0, 1)
    hh = np.zeros((4, 4))
    for P_ in range(4):
        for Q_ in range(4):
            if P_ % 2 == Q_ % 2:
                hh[P_, Q_] = h1[P_ // 2, Q_ // 2]
    from block2_preview_tpu.cc.gccsd import hf_energy_and_fock
    _, _f, v_so = hf_energy_and_fock(fd)
    tens = {"f": hh, "v": v_so, "t1": t1g, "t2": t2g}
    spaces = {OCC: occ, VIR: vir}
    r2w = evaluate_tensor(
        _bch_projected(_deex_ops(("i0", "a0", "j0", "b0"))), tens,
        spaces, ["i0", "a0", "j0", "b0"])
    r1w = evaluate_tensor(_bch_projected(_deex_ops(("i0", "a0"))),
                          tens, spaces, ["i0", "a0"])
    ew = float(evaluate_tensor(_bch_projected(()), tens, spaces, []))
    assert abs(r2w[0, 0, 1, 1] - r2_exact) < 1e-10
    assert abs(r1w[0, 0] - r1_exact) < 1e-10
    assert abs(ew - e_exact) < 1e-10

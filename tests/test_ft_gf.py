"""Finite-temperature dynamical Green's function via ancilla
purification (reference pyblock2/ft_gfdmrg.py), anchored against exact
diagonalization over the full Fock space:

    G_ij(w + i*eta) = (1/Z) sum_m e^{-beta E_m}
                      <m| a_i^dag (w + E_beta + i*eta - H)^{-1} a_j |m>

with E_beta the thermal energy (the same shift the driver uses)."""

import numpy as np
import pytest

from block2_preview_tpu.core.expr import build_term_table, qc_raw_terms
from block2_preview_tpu.dmrg.ancilla import ft_greens_function
from block2_preview_tpu.models.hubbard import hubbard_fcidump
from block2_preview_tpu.ops.local_ops import CRE_A, DES_A
from block2_preview_tpu.utils.ed import term_table_to_sparse

L, BETA, ETA = 3, 1.0, 0.25


def _ed_gf(fd, omega, i, j):
    tt = build_term_table(L, qc_raw_terms(fd, cutoff=1e-13))
    h = term_table_to_sparse(tt).toarray()
    w, v = np.linalg.eigh(0.5 * (h + h.T))
    bw = np.exp(-BETA * (w - w.min()))
    z = bw.sum()
    e_beta = float((bw * w).sum() / z)
    ai = term_table_to_sparse(build_term_table(
        L, [(1.0, [(i, CRE_A)])])).toarray()
    aj = term_table_to_sparse(build_term_table(
        L, [(1.0, [(j, DES_A)])])).toarray()
    res = np.diag(1.0 / (omega + e_beta + 1j * ETA - w))
    op = v.T @ ai @ (v @ res @ v.T) @ aj @ v
    return complex((bw * np.diag(op)).sum() / z), e_beta


@pytest.mark.parametrize("omega,i,j", [(-1.0, 1, 1), (-0.4, 0, 1)])
def test_ft_gf_vs_ed(omega, i, j):
    fd = hubbard_fcidump(L, u=2.0, t=1.0)
    ref, _ = _ed_gf(fd, omega, i, j)
    got = ft_greens_function(fd, BETA, omega, ETA, i, j,
                             n_time_steps=20, bond_dim=120,
                             gf_bond_dim=120, n_sweeps=8)
    assert abs(got - ref) < 3e-3 * max(1.0, abs(ref)), (got, ref)

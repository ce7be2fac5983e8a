"""Time-domain finite-temperature Green's function (reference
pyblock2/ft_tddmrg.py RT_GFDMRG) and finite-temperature Chebyshev
moments (reference pyblock2/ft_chebydmrg.py), anchored against exact
diagonalization over the full Fock space.

Conventions match tests/test_ft_gf.py:
    G_ij(t)    = -i (1/Z) sum_m e^{-beta E_m}
                 <m| a_i^dag e^{-i (H - E_beta) t} a_j |m>
    mu_k       = (1/Z) sum_m e^{-beta E_m} <m| a_i^dag T_k(H~) a_j |m>
and int_0^inf dt e^{(i w - eta) t} G(t) is the resolvent of test_ft_gf.
"""

import numpy as np
import pytest

from block2_preview_tpu.core.expr import build_term_table, qc_raw_terms
from block2_preview_tpu.dmrg.ancilla import (ft_chebyshev_spectral,
                                             ft_fourier_gf,
                                             ft_td_greens_function)
from block2_preview_tpu.models.hubbard import hubbard_fcidump
from block2_preview_tpu.ops.local_ops import CRE_A, DES_A
from block2_preview_tpu.utils.ed import term_table_to_sparse

L, BETA = 2, 1.0


def _ed_setup(fd):
    tt = build_term_table(L, qc_raw_terms(fd, cutoff=1e-13))
    h = term_table_to_sparse(tt).toarray()
    w, v = np.linalg.eigh(0.5 * (h + h.T))
    bw = np.exp(-BETA * (w - w.min()))
    z = bw.sum()
    e_beta = float((bw * w).sum() / z)
    return w, v, bw / z, e_beta


def _site_op(i, e):
    return term_table_to_sparse(build_term_table(
        L, [(1.0, [(i, e)])])).toarray()


def test_ft_td_gf_vs_ed():
    fd = hubbard_fcidump(L, u=2.0, t=1.0)
    w, v, pm, e_beta = _ed_setup(fd)
    i, j, dt, n_t = 0, 0, 0.1, 12
    ai, aj = _site_op(i, CRE_A), _site_op(j, DES_A)
    ts_ref = np.arange(n_t + 1) * dt
    ref = np.empty(n_t + 1, dtype=np.complex128)
    for k, t in enumerate(ts_ref):
        prop = v @ np.diag(np.exp(-1j * (w - e_beta) * t)) @ v.T
        op = v.T @ (ai @ prop @ aj) @ v
        ref[k] = -1j * (pm * np.diag(op)).sum()

    ts, gf_t, e0 = ft_td_greens_function(
        fd, BETA, dt, n_t, i, j, n_time_steps=20, bond_dim=100,
        gf_bond_dim=100, n_sweeps=8)
    assert abs(e0 - e_beta) < 2e-4
    assert np.max(np.abs(gf_t - ref)) < 5e-3, (gf_t, ref)

    # windowed Fourier transform agrees with the same transform of the
    # ED signal (the window/damping error cancels in the comparison)
    omegas = np.array([-1.0, 0.5])
    got_w = ft_fourier_gf(ts, gf_t, omegas, eta=0.4)
    ref_w = ft_fourier_gf(ts_ref, ref, omegas, eta=0.4)
    assert np.max(np.abs(got_w - ref_w)) < 5e-3


def test_ft_chebyshev_vs_ed():
    fd = hubbard_fcidump(L, u=2.0, t=1.0)
    w, v, pm, e_beta = _ed_setup(fd)
    i = 0
    ai, aj = _site_op(i, CRE_A), _site_op(i, DES_A)
    emin, emax = w.min(), w.max()
    a = (emax - emin) / (2 * 0.9)
    b = (emax + emin) / 2
    n_mom = 8
    xs = (w - b) / a
    ref_mus = np.empty(n_mom)
    for k in range(n_mom):
        tk = v @ np.diag(np.cos(k * np.arccos(np.clip(xs, -1, 1)))) @ v.T
        op = v.T @ (ai @ tk @ aj) @ v
        ref_mus[k] = float((pm * np.diag(op)).sum().real)

    omegas = np.linspace(-2.0, 2.0, 5)
    aw, mus, e0 = ft_chebyshev_spectral(
        fd, BETA, omegas, n_mom, i, i, a=a, b=b, n_time_steps=20,
        bond_dim=100, cheb_bond_dim=100, n_sweeps=8)
    assert abs(e0 - e_beta) < 2e-4
    assert np.max(np.abs(mus - ref_mus)) < 5e-3, (mus, ref_mus)
    # the reconstruction is a deterministic function of the moments
    from block2_preview_tpu.dmrg.chebyshev import spectral_function
    ref_aw = spectral_function(ref_mus, omegas + e_beta, a, b)
    assert np.max(np.abs(aw - ref_aw)) < 5e-2


def test_ft_cheb_requires_scaling():
    fd = hubbard_fcidump(L, u=2.0, t=1.0)
    with pytest.raises(ValueError):
        ft_chebyshev_spectral(fd, BETA, np.zeros(1), 4, 0, 0)

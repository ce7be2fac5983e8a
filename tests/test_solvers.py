"""Iterative solver family + MPO product (StackedMPO) parity tests.

References: block2 src/core/iterative_matrix_functions.hpp (minres :2165,
gcrotmk :2303, idrs :2554, lsqr :2988, cheby :3357, deflated CG :1985);
src/dmrg/mpo_fusing.hpp:39 StackedMPO.
"""

import numpy as np

from block2_preview_tpu.ops.solvers import (cheby_solve, deflated_cg,
                                            gcrotmk, idrs, lsqr, minres)


def _sym_system(n=120, seed=0):
    rng = np.random.RandomState(seed)
    a = rng.standard_normal((n, n))
    A = (a + a.T) / 2 + n * np.eye(n) * 0.3
    b = rng.standard_normal(n)
    return A, b, np.linalg.solve(A, b)


def _gen_complex_system(n=100, seed=1):
    rng = np.random.RandomState(seed)
    A = (rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n)))
    A = A / np.sqrt(n) + 2.0 * np.eye(n)
    b = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    return A, b, np.linalg.solve(A, b)


def test_minres_indefinite():
    n = 120
    rng = np.random.RandomState(3)
    a = rng.standard_normal((n, n))
    A = (a + a.T) / 2
    A = A - (np.linalg.eigvalsh(A)[0] + 0.5) * np.eye(n) * 0  # indefinite
    A = A + 0.1 * np.eye(n)
    b = rng.standard_normal(n)
    x, nmv = minres(lambda v: A @ v, b, tol=1e-12, maxiter=2000)
    assert np.linalg.norm(A @ x - b) < 1e-8 * np.linalg.norm(b)


def test_gcrotmk_complex():
    A, b, xref = _gen_complex_system()
    x, nmv = gcrotmk(lambda v: A @ v, b, tol=1e-12, maxiter=500)
    assert np.linalg.norm(x - xref) < 1e-8


def test_idrs_real_and_complex():
    A, b, xref = _sym_system()
    x, nmv = idrs(lambda v: A @ v, b, s=4, tol=1e-12, maxiter=2000)
    assert np.linalg.norm(x - xref) < 1e-7, np.linalg.norm(x - xref)
    A, b, xref = _gen_complex_system()
    x, nmv = idrs(lambda v: A @ v, b, s=6, tol=1e-13, maxiter=3000)
    assert np.linalg.norm(x - xref) < 1e-7, np.linalg.norm(x - xref)


def test_lsqr_adjoint():
    A, b, xref = _gen_complex_system()
    x, nmv = lsqr(lambda v: A @ v, lambda v: A.conj().T @ v, b,
                  tol=1e-12, maxiter=3000)
    assert np.linalg.norm(x - xref) < 1e-6


def test_cheby_spd():
    A, b, xref = _sym_system(seed=5)
    ev = np.linalg.eigvalsh(A)
    x, nmv = cheby_solve(lambda v: A @ v, b, float(ev[0]) * 0.9,
                         float(ev[-1]) * 1.1, tol=1e-12, maxiter=5000)
    assert np.linalg.norm(x - xref) < 1e-7


def test_deflated_cg():
    A, b, xref = _sym_system(seed=8)
    w = np.linalg.eigh(A)[1][:, :3]   # deflate lowest modes
    x, nmv = deflated_cg(lambda v: A @ v, b, w, tol=1e-12, maxiter=500)
    assert np.linalg.norm(x - xref) < 1e-7


def test_mpo_product_dense():
    """StackedMPO: dense(H @ H) == dense(H)^2 including scalar parts."""
    from block2_preview_tpu.core.expr import qc_term_table
    from block2_preview_tpu.core.fcidump import FCIDUMP
    from block2_preview_tpu.dmrg.mpo_algebra import mpo_product
    from block2_preview_tpu.dmrg.mpo_builder import build_mpo
    fd = FCIDUMP.hubbard(4, t=1.0, u=2.0)
    mpo = build_mpo(qc_term_table(fd), const_e=0.37)
    h = mpo.to_dense() + mpo.const_e * np.eye(4 ** 4)
    h2 = mpo_product(mpo, mpo)
    d2 = h2.to_dense() + h2.const_e * np.eye(4 ** 4)
    assert np.abs(d2 - h @ h).max() < 1e-12


def test_mpo_product_variance():
    """Energy variance <H^2> - <H>^2 ~ 0 for a converged eigenstate."""
    from block2_preview_tpu.core.expr import qc_term_table
    from block2_preview_tpu.core.fcidump import FCIDUMP
    from block2_preview_tpu.dmrg.mpo_algebra import mpo_product
    from block2_preview_tpu.dmrg.mpo_builder import build_mpo
    from block2_preview_tpu.dmrg.expect import mpo_expectation
    from block2_preview_tpu.dmrg.mps import MPS, MPSInfo
    from block2_preview_tpu.dmrg.sweep import DMRG
    fd = FCIDUMP.hubbard(6, t=1.0, u=2.0)
    mpo = build_mpo(qc_term_table(fd))
    info = MPSInfo(mpo.group, mpo.site_quanta, (6, 0, 0), 120)
    mps = MPS.random(info)
    dmrg = DMRG(mpo, mps, iprint=0)
    e = dmrg.solve([120], [1e-5, 0.0], [1e-10], n_sweeps=8, tol=1e-10)
    e = float(dmrg.energies[-1][0])
    h2 = mpo_product(mpo, mpo)
    v2 = mpo_expectation(h2, mps) + h2.const_e
    assert abs(v2 - e * e) < 1e-6, (v2, e * e)


def test_harmonic_davidson_interior():
    """Interior eigenvalue closest to a shift (reference
    iterative_matrix_functions.hpp:1181, DavidsonTypes::Harmonic)."""
    from block2_preview_tpu.ops.davidson import harmonic_davidson
    n = 80
    rng = np.random.RandomState(4)
    a = rng.standard_normal((n, n))
    A = (a + a.T) / 2
    w = np.linalg.eigvalsh(A)
    shift = (w[n // 2] + w[n // 2 + 1]) / 2 + 1e-3
    want = w[np.argmin(np.abs(w - shift))]
    x0 = rng.standard_normal(n)
    th, v, nmv = harmonic_davidson(lambda x: A @ x, np.diag(A), x0, shift,
                                   conv_thrd=1e-16, max_iter=300,
                                   max_subspace=n)
    assert abs(th[0] - want) < 1e-7, (th[0], want)
    assert np.linalg.norm(A @ v[:, 0] - th[0] * v[:, 0]) < 1e-6


def test_davidson_non_hermitian():
    from block2_preview_tpu.ops.davidson import davidson_non_hermitian
    n = 60
    rng = np.random.RandomState(6)
    A = rng.standard_normal((n, n)) * 0.1 + np.diag(np.arange(n, dtype=float))
    w = np.linalg.eigvals(A)
    want = np.sort_complex(w[np.argsort(w.real)])[0]
    x0 = rng.standard_normal(n)
    th, v, nmv = davidson_non_hermitian(
        lambda x: A @ x, lambda x: A.conj().T @ x, np.diag(A), x0,
        conv_thrd=1e-18, max_iter=300, max_subspace=40)
    assert abs(th[0] - want) < 1e-6, (th[0], want)
    assert np.linalg.norm(A @ v[:, 0] - th[0] * v[:, 0]) < 1e-6


def test_davidson_generalized_metric():
    from block2_preview_tpu.ops.davidson import davidson_generalized
    import scipy.linalg as sla
    n = 60
    rng = np.random.RandomState(9)
    a = rng.standard_normal((n, n))
    A = (a + a.T) / 2
    m = rng.standard_normal((n, n)) * 0.2
    B = m @ m.T + np.eye(n)
    w = sla.eigh(A, B, eigvals_only=True)
    x0 = rng.standard_normal(n)
    th, v, nmv = davidson_generalized(
        lambda x: A @ x, lambda x: B @ x, np.diag(A) / np.diag(B), x0,
        conv_thrd=1e-16, max_iter=300, max_subspace=40)
    assert abs(th[0] - w[0]) < 1e-7, (th[0], w[0])


def test_expo_pade():
    """Pade scaling-and-squaring exponential (reference
    iterative_matrix_functions.hpp:1480)."""
    import scipy.linalg as sla
    from block2_preview_tpu.ops.solvers import expo_pade
    rng = np.random.RandomState(3)
    a = rng.standard_normal((12, 12))
    for t in (0.3, 1.0, -2.5):
        assert np.allclose(expo_pade(a, t), sla.expm(t * a),
                           atol=1e-10)
    h = a + a.T
    assert np.allclose(expo_pade(1j * h, 1.0), sla.expm(1j * h),
                       atol=1e-10)


def test_constrained_svd():
    """SVD with prescribed leading singular vectors (reference
    iterative_matrix_functions.hpp:3494): exact reconstruction, fixed
    vectors kept verbatim, complement orthonormal."""
    from block2_preview_tpu.ops.solvers import constrained_svd
    rng = np.random.RandomState(5)
    a = rng.standard_normal((10, 7))
    lf = rng.standard_normal((10, 2))
    U, s, Vt = constrained_svd(a, left_fixed=lf)
    assert np.allclose(U @ np.diag(s) @ Vt, a, atol=1e-10)
    Qf = np.linalg.qr(lf)[0]
    assert np.allclose(U[:, :2], Qf, atol=1e-10)
    assert np.allclose(U.T @ U, np.eye(U.shape[1]), atol=1e-10)

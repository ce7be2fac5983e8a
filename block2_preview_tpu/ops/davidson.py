"""Davidson eigensolver (host-driven outer loop, device-friendly matvec).

TPU-native counterpart of block2's IterativeMatrixFunctions::harmonic_davidson
in its DavidsonTypes::Normal mode (reference
src/core/iterative_matrix_functions.hpp:1181) with Olsen/diagonal
preconditioning.  The matvec is an opaque callable — in production it is the
jit-compiled bucketed sigma-vector plan (ops/exec_jax.py); orthogonalization
and the small Rayleigh-Ritz problem stay on host in float64, mirroring the
reference's rank-redundant host-side Davidson around distributed matvecs.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Tuple

import numpy as np


def davidson(matvec: Callable[[np.ndarray], np.ndarray],
             diag: np.ndarray,
             x0: np.ndarray,
             n_roots: int = 1,
             conv_thrd: float = 1e-8,
             max_iter: int = 200,
             max_subspace: int = 30,
             deflation_min_size: int = 2,
             iprint: bool = False,
             ) -> Tuple[np.ndarray, np.ndarray, int]:
    """Lowest eigenpairs of a symmetric operator.

    conv_thrd is on |r|^2, matching block2's davidson_conv_thrd semantics
    (reference src/dmrg/sweep_algorithm.hpp:96-133).
    Returns (eigenvalues [n_roots], eigenvectors [n, n_roots], n_matvec).
    """
    n = diag.shape[0]
    x0 = x0.reshape(-1, 1) if x0.ndim == 1 else x0
    nroots = min(n_roots, n)
    max_sub = min(max(max_subspace, nroots * 4), n)

    dtype = np.result_type(np.float64, x0.dtype, diag.dtype)
    basis: List[np.ndarray] = []
    sigmas: List[np.ndarray] = []
    for i in range(min(x0.shape[1], nroots)):
        v = x0[:, i].astype(dtype)
        for b in basis:
            v -= np.vdot(b, v) * b
        nv = np.linalg.norm(v)
        if nv > 1e-12:
            basis.append(v / nv)
    while len(basis) < nroots:
        v = np.random.RandomState(len(basis)).standard_normal(n).astype(dtype)
        for b in basis:
            v -= np.vdot(b, v) * b
        basis.append(v / np.linalg.norm(v))

    nmv = 0
    theta = np.zeros(nroots)
    ritz = None
    for it in range(max_iter):
        while len(sigmas) < len(basis):
            sigmas.append(np.asarray(matvec(basis[len(sigmas)])))
            nmv += 1
        m = len(basis)
        B = np.stack(basis, axis=1)
        S = np.stack(sigmas, axis=1)
        h = B.conj().T @ S
        h = 0.5 * (h + h.conj().T)
        w, c = np.linalg.eigh(h)
        theta = w[:nroots].real
        ritz = B @ c[:, :nroots]
        rvecs = S @ c[:, :nroots] - ritz * theta[None, :]
        rnorms2 = (np.abs(rvecs) ** 2).sum(axis=0)
        if iprint:
            print(f"  dav it {it:3d} m {m:3d} e {theta[0]:.12f} "
                  f"|r|^2 {rnorms2.max():.3e}")
        if rnorms2.max() < conv_thrd:
            return theta, ritz, nmv
        # restart if subspace full
        if m + nroots > max_sub:
            basis = [ritz[:, i] / np.linalg.norm(ritz[:, i])
                     for i in range(nroots)]
            # re-orthonormalize
            for i in range(1, len(basis)):
                for j in range(i):
                    basis[i] -= np.vdot(basis[j], basis[i]) * basis[j]
                basis[i] /= np.linalg.norm(basis[i])
            sigmas = []
            continue
        # expand with preconditioned residuals (Olsen-style denominator)
        added = False
        for i in range(nroots):
            if rnorms2[i] < conv_thrd * 0.1:
                continue
            denom = diag - theta[i]
            denom = np.where(np.abs(denom) < 1e-12,
                             np.sign(denom + 1e-30) * 1e-12, denom)
            v = rvecs[:, i] / denom
            for b in basis:
                v -= np.vdot(b, v) * b
            nv = np.linalg.norm(v)
            if nv > 1e-10:
                basis.append(v / nv)
                added = True
        if not added:
            # stuck: random expansion
            v = np.random.RandomState(1000 + it).standard_normal(n) \
                .astype(dtype)
            for b in basis:
                v -= np.vdot(b, v) * b
            nv = np.linalg.norm(v)
            if nv < 1e-12:
                break
            basis.append(v / nv)
    return theta, ritz, nmv

"""Iterative linear solvers for response / Green's-function sweeps.

TPU-native counterpart of block2's solver family in
src/core/iterative_matrix_functions.hpp: conjugate gradient (:1985),
deflated CG (:1985), MinRes (:2165), GCROT(m,k) (:2303), IDR(s) (:2554),
LSQR (:2988), and the Chebyshev solver (:3357).  All solvers drive an
opaque matvec (host numpy or a jitted device plan); host-side vector work
is negligible next to the matvec.

IDR(s) and the Chebyshev solver are implemented in-house (no scipy
equivalent); MinRes/GCROT(m,k)/LSQR wrap scipy's reference implementations
behind the same (x, n_matvec) interface the sweep drivers use.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import numpy as np
import scipy.sparse.linalg as spla

MatVec = Callable[[np.ndarray], np.ndarray]


def _wrap(matvec: MatVec, n: int, dtype):
    count = [0]

    def mv(x):
        count[0] += 1
        return matvec(x.astype(dtype, copy=False))

    return spla.LinearOperator((n, n), matvec=mv, dtype=dtype), count


def minres(matvec: MatVec, rhs: np.ndarray, x0=None, tol: float = 1e-10,
           maxiter: int = 500) -> Tuple[np.ndarray, int]:
    """MinRes for symmetric (possibly indefinite) real operators
    (reference iterative_matrix_functions.hpp:2165)."""
    op, count = _wrap(matvec, rhs.shape[0], rhs.dtype)
    x, _info = spla.minres(op, rhs, x0=x0, rtol=tol, maxiter=maxiter)
    return x, count[0]


def gcrotmk(matvec: MatVec, rhs: np.ndarray, x0=None, tol: float = 1e-10,
            maxiter: int = 500, m: int = 20, k: Optional[int] = None
            ) -> Tuple[np.ndarray, int]:
    """GCROT(m,k) for general (non-Hermitian, complex) operators — the
    reference's default Green's-function solver
    (iterative_matrix_functions.hpp:2303)."""
    op, count = _wrap(matvec, rhs.shape[0], rhs.dtype)
    x, _info = spla.gcrotmk(op, rhs, x0=x0, rtol=tol, maxiter=maxiter,
                            m=m, k=k)
    return x, count[0]


def lsqr(matvec: MatVec, rmatvec: MatVec, rhs: np.ndarray,
         tol: float = 1e-10, maxiter: int = 1000) -> Tuple[np.ndarray, int]:
    """LSQR on an operator given with its adjoint
    (reference iterative_matrix_functions.hpp:2988)."""
    n = rhs.shape[0]
    count = [0]

    def mv(x):
        count[0] += 1
        return matvec(x)

    def rmv(x):
        count[0] += 1
        return rmatvec(x)

    op = spla.LinearOperator((n, n), matvec=mv, rmatvec=rmv,
                             dtype=rhs.dtype)
    res = spla.lsqr(op, rhs, atol=tol, btol=tol, iter_lim=maxiter)
    return res[0], count[0]


def idrs(matvec: MatVec, rhs: np.ndarray, x0=None, s: int = 4,
         tol: float = 1e-10, maxiter: int = 500, seed: int = 7
         ) -> Tuple[np.ndarray, int]:
    """IDR(s) — induced dimension reduction (van Gijzen & Sonneveld,
    ACM TOMS 38 (2011); reference iterative_matrix_functions.hpp:2554).
    Handles general complex non-Hermitian operators with short recurrences.
    """
    n = rhs.shape[0]
    dtype = np.result_type(rhs.dtype, np.float64)
    x = np.zeros(n, dtype=dtype) if x0 is None else x0.astype(dtype)
    nmv = 0
    r = rhs.astype(dtype)
    if x0 is not None:
        r = r - matvec(x)
        nmv += 1
    normb = np.linalg.norm(rhs)
    if normb == 0:
        return x, nmv
    tolb = tol * normb
    rng = np.random.RandomState(seed)
    P = rng.standard_normal((s, n)).astype(dtype)
    if np.iscomplexobj(np.zeros(1, dtype=dtype)):
        P = P + 1j * rng.standard_normal((s, n))
    # orthonormalize the shadow space
    P = np.linalg.qr(P.conj().T)[0].conj().T
    G = np.zeros((s, n), dtype=dtype)
    U = np.zeros((s, n), dtype=dtype)
    M = np.eye(s, dtype=dtype)
    om = 1.0 + 0j if np.iscomplexobj(P) else 1.0
    it = 0
    while np.linalg.norm(r) > tolb and it < maxiter:
        f = P.conj() @ r
        for kk in range(s):
            # solve the lower-triangular sub-system M[kk:, kk:] c = f[kk:]
            c = np.linalg.solve(M[kk:, kk:], f[kk:])
            v = r - G[kk:].T @ c
            u = U[kk:].T @ c + om * v
            g = matvec(u)
            nmv += 1
            it += 1
            # bi-orthogonalize against the first kk shadow directions
            for i in range(kk):
                alpha = (P[i].conj() @ g) / M[i, i]
                g = g - alpha * G[i]
                u = u - alpha * U[i]
            G[kk] = g
            U[kk] = u
            M[kk:, kk] = P[kk:].conj() @ g
            if M[kk, kk] == 0:
                return x, nmv
            beta = f[kk] / M[kk, kk]
            x = x + beta * u
            r = r - beta * g
            if np.linalg.norm(r) <= tolb or it >= maxiter:
                break
            if kk + 1 < s:
                f[kk + 1:] = f[kk + 1:] - beta * M[kk + 1:, kk]
        if np.linalg.norm(r) <= tolb or it >= maxiter:
            break
        # dimension-reduction step
        v = r
        t = matvec(v)
        nmv += 1
        it += 1
        om = (t.conj() @ r) / (t.conj() @ t)
        # Maintaining-convergence strategy (van Gijzen & Sonneveld)
        rho = abs((t.conj() @ r)) / (np.linalg.norm(t) * np.linalg.norm(r))
        kappa = 0.7
        if rho < kappa:
            om = om * kappa / rho
        x = x + om * v
        r = r - om * t
    return x, nmv


def cheby_solve(matvec: MatVec, rhs: np.ndarray, lmin: float, lmax: float,
                tol: float = 1e-10, maxiter: int = 2000
                ) -> Tuple[np.ndarray, int]:
    """Chebyshev semi-iteration for Hermitian positive-definite operators
    with spectrum in [lmin, lmax] (reference
    iterative_matrix_functions.hpp:3357 cheby).  Matvec-rich but
    inner-product-free — the communication-free solver of the family."""
    theta = (lmax + lmin) / 2.0
    delta = (lmax - lmin) / 2.0
    x = np.zeros_like(rhs)
    r = rhs.copy()
    nmv = 0
    normb = np.linalg.norm(rhs)
    if normb == 0:
        return x, 0
    p = None
    alpha = 0.0
    for k in range(maxiter):
        if k == 0:
            p = r.copy()
            alpha = 1.0 / theta
        elif k == 1:
            beta = 0.5 * (delta * alpha) ** 2
            alpha = 1.0 / (theta - beta / alpha)
            p = r + beta * p
        else:
            beta = (delta * alpha / 2.0) ** 2
            alpha = 1.0 / (theta - beta / alpha)
            p = r + beta * p
        x = x + alpha * p
        r = r - alpha * matvec(p)
        nmv += 1
        if np.linalg.norm(r) < tol * normb:
            break
    return x, nmv


def deflated_cg(matvec: MatVec, rhs: np.ndarray, ws: Optional[np.ndarray],
                x0=None, tol: float = 1e-10, maxiter: int = 500
                ) -> Tuple[np.ndarray, int]:
    """Deflated CG (Saad/Nicolaides scheme, reference
    iterative_matrix_functions.hpp:1985 deflated_conjugate_gradient):
    the solution component in span(ws) is solved exactly through the
    small (W^H A W) system; CG runs in the A-orthogonal complement with
    every search direction re-projected (works for arbitrary deflation
    spaces, not just invariant ones)."""
    n = rhs.shape[0]
    if ws is None or ws.size == 0:
        op, count = _wrap(matvec, n, rhs.dtype)
        x, _ = spla.cg(op, rhs, x0=x0, rtol=tol, maxiter=maxiter)
        return x, count[0]
    W = np.linalg.qr(ws.reshape(n, -1))[0]
    k = W.shape[1]
    AW = np.stack([matvec(W[:, i]) for i in range(k)], axis=1)
    nmv = k
    WAW = W.conj().T @ AW
    WAW_inv = np.linalg.inv(WAW)

    def dproj(v):
        # remove the A-projection onto span(W): W^H A (dproj v) = 0
        return v - W @ (WAW_inv @ (AW.conj().T @ v))

    x = W @ (WAW_inv @ (W.conj().T @ rhs))
    if x0 is not None:
        x = x + dproj(np.asarray(x0))
    r = rhs - matvec(x)
    nmv += 1
    bnorm = np.linalg.norm(rhs)
    if bnorm < 1e-300:
        return x, nmv
    p = dproj(r)
    rs_old = np.vdot(r, r).real
    for _ in range(maxiter):
        if np.sqrt(rs_old) <= tol * bnorm:
            break
        ap = matvec(p)
        nmv += 1
        alpha = rs_old / np.vdot(p, ap).real
        x = x + alpha * p
        r = r - alpha * ap
        rs_new = np.vdot(r, r).real
        p = dproj(r + (rs_new / rs_old) * p)
        rs_old = rs_new
    return x, nmv


def expo_pade(a: np.ndarray, t: float = 1.0, order: int = 6
              ) -> np.ndarray:
    """exp(t*A) by diagonal Pade approximation with scaling-and-squaring
    (reference iterative_matrix_functions.hpp:1480 expo_pade; used for
    small dense local exponentials in TDDMRG)."""
    a = np.asarray(a) * t
    n = a.shape[0]
    nrm = np.linalg.norm(a, 1)
    s = max(0, int(np.ceil(np.log2(max(nrm, 1e-300)))) + 1) \
        if nrm > 0.5 else 0
    a = a / (2.0 ** s)
    # diagonal Pade coefficients c_k = (2m-k)! m! / ((2m)! k! (m-k)!)
    c = 1.0
    N = np.eye(n, dtype=a.dtype)
    D = np.eye(n, dtype=a.dtype)
    X = np.eye(n, dtype=a.dtype)
    for k in range(1, order + 1):
        c = c * (order - k + 1) / (k * (2 * order - k + 1))
        X = X @ a
        N = N + c * X
        D = D + ((-1) ** k) * c * X
    F = np.linalg.solve(D, N)
    for _ in range(s):
        F = F @ F
    return F


def constrained_svd(a: np.ndarray, left_fixed: Optional[np.ndarray] = None,
                    right_fixed: Optional[np.ndarray] = None
                    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """SVD of `a` with prescribed leading left (and/or right) singular
    vectors (reference iterative_matrix_functions.hpp:3494
    constrained_svd, used by constrained MPO compression): the fixed
    columns are kept verbatim, the orthogonal complement is SVD'd.
    Returns (U, s, Vt) with U[:, :k] == orthonormalized left_fixed."""
    m, n = a.shape
    U_parts, V_parts, s_parts = [], [], []
    rest = a
    if left_fixed is not None and left_fixed.size:
        Q = np.linalg.qr(left_fixed.reshape(m, -1))[0]
        B = Q.conj().T @ a                 # fixed rows' right factors
        for j in range(Q.shape[1]):
            sv = np.linalg.norm(B[j])
            U_parts.append(Q[:, j])
            s_parts.append(sv)
            V_parts.append(B[j] / sv if sv > 1e-300 else B[j])
        rest = a - Q @ B
    if right_fixed is not None and right_fixed.size:
        P = np.linalg.qr(right_fixed.reshape(n, -1))[0]
        C = rest @ P
        for j in range(P.shape[1]):
            sv = np.linalg.norm(C[:, j])
            s_parts.append(sv)
            U_parts.append(C[:, j] / sv if sv > 1e-300 else C[:, j])
            V_parts.append(P[:, j].conj())
        rest = rest - C @ P.conj().T
    u, s, vt = np.linalg.svd(rest, full_matrices=False)
    keep = s > 1e-14
    U = np.stack(U_parts + list(u[:, keep].T), axis=1) \
        if U_parts else u[:, keep]
    sv = np.asarray(s_parts + list(s[keep]))
    Vt = np.stack(V_parts + list(vt[keep]), axis=0) \
        if V_parts else vt[keep]
    return U, sv, Vt


def _proj_l1l2(x: np.ndarray, a: float) -> np.ndarray:
    """Project onto {y : ||y||_1 <= a ||y||_2, ||y||_2 = 1} (reference
    iterative_matrix_functions.hpp:3508 proj12): if the sparsity bound
    already holds, just normalize; otherwise soft-threshold |x| at the
    level lam making the l1/l2 ratio equal a, keeping signs."""
    nx = np.linalg.norm(x)
    if nx < 1e-32:
        return x
    p = np.abs(x)
    if p.sum() <= a * nx:
        return x / nx
    srt = np.sort(p)[::-1]
    c1 = np.cumsum(srt)
    c2 = np.cumsum(srt * srt)
    lam = 0.0
    # for threshold lam in (srt[k], srt[k-1]], ratio(lam) is monotone;
    # find k where psi(srt[k]) crosses a, then solve the quadratic
    for k in range(1, len(srt)):
        kk = float(k + 1)
        num = c1[k] - kk * srt[k]
        den = np.sqrt(max(c2[k] - 2 * srt[k] * c1[k] + kk * srt[k] ** 2,
                          1e-300))
        if num / den > a:
            # solve ((c1[k-1] - k lam) / sqrt(c2[k-1] - 2 lam c1[k-1]
            #        + k lam^2)) == a for lam in [srt[k], srt[k-1]]
            kk = float(k)
            A = kk * kk - a * a * kk
            B = -2 * kk * c1[k - 1] + 2 * a * a * c1[k - 1]
            C = c1[k - 1] ** 2 - a * a * c2[k - 1]
            disc = max(B * B - 4 * A * C, 0.0)
            lam = (-B - np.sqrt(disc)) / (2 * A) if abs(A) > 1e-300 \
                else -C / B
            lam = float(np.clip(lam, srt[k], srt[k - 1]))
            break
    y = np.sign(x) * np.maximum(p - lam, 0.0)
    ny = np.linalg.norm(y)
    return y / ny if ny > 1e-32 else x / nx


def sparse_constrained_svd(a: np.ndarray, rank: int, au: float = 0.0,
                           av: float = 0.0, max_iter: int = 200,
                           eps: float = 1e-10
                           ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Sparsity-constrained rank-`rank` SVD (reference
    iterative_matrix_functions.hpp:3494 constrained_svd, used by
    MPOAlgorithmTypes::Constrained): deflated power iteration where each
    left/right singular vector is projected onto the l1/l2 sparsity cone
    ||u||_1 <= au ||u||_2 (POCS).  au/av <= 0 disables the constraint on
    that side (plain power iteration).  Returns (U, s, Vt) with the
    deflation residual folded out; the factors are near-orthogonal but
    sparser than LAPACK's."""
    m, n = a.shape
    rank = min(rank, m, n)
    x = a.astype(np.float64, copy=True)
    U = np.zeros((m, rank))
    S = np.zeros(rank)
    Vt = np.zeros((rank, n))
    rng = np.random.RandomState(1234)
    for k in range(rank):
        v = rng.standard_normal(n)
        v /= np.linalg.norm(v)
        s_old = 0.0
        for _ in range(max_iter):
            u = x @ v
            u = _proj_l1l2(u, au) if au > 0 else \
                (u / max(np.linalg.norm(u), 1e-300))
            v = x.T @ u
            sv = np.linalg.norm(v)
            v = _proj_l1l2(v, av) if av > 0 else v / max(sv, 1e-300)
            if abs(sv - s_old) <= eps * max(sv, 1.0):
                break
            s_old = sv
        s = float(u @ x @ v)
        if s < 0:
            u, s = -u, -s
        U[:, k], S[k], Vt[k] = u, s, v
        x -= s * np.outer(u, v)
    return U, S, Vt


def disjoint_svd(a: np.ndarray, levels=(), cutoff: float = 0.0
                 ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Disjoint-support SVD (reference iterative_matrix_functions.hpp:3688,
    used by MPOAlgorithmTypes::Disjoint): partition the nonzero entries of
    `a` into connected components of the bipartite row/column graph
    (optionally stratified by magnitude `levels`, largest first) and SVD
    each component's submatrix independently.  Each singular vector is
    supported on a single component, so MPO operator entries built from
    the factors stay local/sparse.  Returns (U, s, Vt); with no levels the
    factors are exactly orthogonal (disjoint supports)."""
    m, n = a.shape
    if m == 0 or n == 0:
        return (np.zeros((m, 0)), np.zeros(0), np.zeros((0, n)))
    levels = sorted((float(l) for l in levels), reverse=True)
    parent = np.arange(m + n)

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    absa = np.abs(a)
    bands = []
    lo_prev = np.inf
    for lv in levels:
        bands.append((lv, lo_prev))
        lo_prev = lv
    bands.append((cutoff, lo_prev))  # the default (last) level
    U_cols, svals, V_rows = [], [], []
    for lo, hi in bands:
        parent = np.arange(m + n)  # components restart per level stratum
        ii, jj = np.nonzero((absa > lo) & (absa <= hi))
        for i, j in zip(ii, jj):
            ri, rj = find(i), find(m + j)
            if ri != rj:
                parent[ri] = rj
        comps = {}
        for i, j in zip(ii, jj):
            comps.setdefault(find(i), []).append((i, j))
        for ents in comps.values():
            rows = sorted({i for i, _ in ents})
            cols = sorted({j for _, j in ents})
            sub = np.zeros((len(rows), len(cols)))
            rmap = {r: x for x, r in enumerate(rows)}
            cmap = {c: x for x, c in enumerate(cols)}
            for i, j in ents:
                sub[rmap[i], cmap[j]] = a[i, j]
            u, s, vt = np.linalg.svd(sub, full_matrices=False)
            for k in range(len(s)):
                if s[k] <= 1e-300:
                    continue
                uc = np.zeros(m)
                uc[rows] = u[:, k]
                vr = np.zeros(n)
                vr[cols] = vt[k]
                U_cols.append(uc)
                svals.append(s[k])
                V_rows.append(vr)
    if not svals:
        return (np.zeros((m, 0)), np.zeros(0), np.zeros((0, n)))
    order = np.argsort(svals)[::-1]
    U = np.stack([U_cols[i] for i in order], axis=1)
    S = np.asarray([svals[i] for i in order])
    Vt = np.stack([V_rows[i] for i in order], axis=0)
    return U, S, Vt

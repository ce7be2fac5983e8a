"""Fully on-device Davidson iteration.

The reference keeps Davidson on the host and distributes only the matvec
(reference src/core/iterative_matrix_functions.hpp:1181, rank-redundant with
a pcomm).  On TPU the host<->device roundtrip per iteration costs more than
the matvec itself, so the entire subspace iteration — expansion,
orthogonalization, Rayleigh-Ritz (small eigh), residual, Olsen/diagonal
preconditioning, and compress-restart — runs inside one jitted
``lax.while_loop`` with fixed-size (masked) subspace buffers.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

from . import jit_cache  # noqa: F401  (persistent XLA cache)
import jax
import jax.numpy as jnp
import numpy as np


def _masked_eigh(h, mask, M, dtype):
    """eigh of the active block of h, with masked rows/cols pushed above
    the spectrum by a Gershgorin-scaled sentinel.  A huge constant (1e30)
    is NOT safe here: TPU eigh (QDWH) loses the small eigenvalues
    entirely at that dynamic range (observed ~0.7 absolute error in the
    ground Ritz value), so the sentinel must stay within a few orders of
    magnitude of the real spectrum."""
    mask2 = mask[:, None] & mask[None, :]
    h = jnp.where(mask2, h, 0.0)
    bound = jnp.max(jnp.sum(jnp.abs(h), axis=1)) + 1.0
    h = jnp.where(mask2, h,
                  jnp.where(jnp.eye(M, dtype=bool),
                            bound * (1.0 + jnp.arange(M, dtype=dtype)),
                            0.0))
    return jnp.linalg.eigh(h)


def davidson_state_init(x0, max_subspace):
    """Initial on-device Davidson state tuple (V, S, m, theta, rn2, it)
    for the chunked driver."""
    n = x0.shape[0]
    M = max_subspace
    dtype = x0.dtype
    V0 = jnp.zeros((M, n), dtype=dtype)
    V0 = V0.at[0].set(x0 / jnp.linalg.norm(x0))
    S0 = jnp.zeros((M, n), dtype=dtype)
    return (V0, S0, jnp.asarray(1, jnp.int32), jnp.asarray(0.0, dtype),
            jnp.asarray(1.0, dtype), jnp.asarray(0, jnp.int32))


def davidson_chunk(matvec, diag, state, conv_thrd=1e-8, it_cap=4,
                   max_iter=100, n_keep=4):
    """Advance the Davidson state by at most ``it_cap`` iterations (one
    bounded device launch).  The target system's worker kills launches
    that run for minutes (and the tunnel latency is highly variable), so
    the subspace iteration must be split into bounded launches chained
    from the host: state arrays stay on device, only the (rn2, it)
    scalars are read between chunks.  Same numerics as
    ``device_davidson`` — the while_loop condition just gains an
    ``it < it0 + it_cap`` bound."""
    M = state[0].shape[0]
    dtype = state[0].dtype
    body = _dav_body(matvec, diag, M, min(n_keep, M - 2), dtype)
    it0 = state[5]

    def cond(s):
        return ((s[5] < max_iter) & (s[5] < it0 + it_cap)
                & ((s[4] > conv_thrd) | (s[5] < 1)))

    return jax.lax.while_loop(cond, body, state)


def davidson_finalize(state):
    """Final Ritz pair from a Davidson state: (theta, x, it)."""
    V, S, m, theta, rn2, it = state
    M = V.shape[0]
    mask = (jnp.arange(M) < m)
    Vm = V * mask[:, None]
    Sm = S * mask[:, None]
    h = Vm @ Sm.T
    h = 0.5 * (h + h.T)
    w, c = _masked_eigh(h, mask, M, V.dtype)
    x = c[:, 0] @ Vm
    x = x / jnp.linalg.norm(x)
    return w[0], x, it


def _dav_body(matvec, diag, M, K, dtype):
    """One Davidson iteration (shared by the single-launch and chunked
    drivers): expand, Rayleigh-Ritz, residual, Olsen precondition,
    grow-or-thick-restart."""

    def body(state):
        V, S, m, theta, rn2, it = state
        # sigma for newest basis vector
        S = S.at[m - 1].set(matvec(V[m - 1]))
        mask = (jnp.arange(M) < m)
        Vm = V * mask[:, None]
        Sm = S * mask[:, None]
        h = Vm @ Sm.T
        h = 0.5 * (h + h.T)
        w, c = _masked_eigh(h, mask, M, dtype)
        y = c[:, 0]
        theta = w[0]
        ritz = y @ Vm
        sig = y @ Sm
        r = sig - theta * ritz
        rn2 = jnp.sum(r * r)
        # precondition + orthogonalize (two MGS passes)
        denom = diag - theta
        denom = jnp.where(jnp.abs(denom) < 1e-8,
                          jnp.sign(denom + 1e-30) * 1e-8, denom)
        t = r / denom

        def ortho(t):
            t = t - (Vm @ t) @ Vm
            return t
        t = ortho(ortho(t))
        tn = jnp.linalg.norm(t)
        t = t / jnp.maximum(tn, 1e-30)
        # basis collapse: when the preconditioned residual lies (to
        # working precision) inside the current span, the NORMALIZED
        # remainder is dominated by roundoff and is no longer orthogonal
        # to V.  Growing V with it breaks the orthonormality the
        # standard eigenproblem assumes and produces wildly spurious
        # Ritz values (observed: theta ~ -33952 on a Cr2 f32 sweep at
        # max_iter).  Test the contamination of the normalized vector
        # directly (a tn/tn0 ratio test misfires when the Olsen
        # denominator amplifies the in-span component).
        # threshold: Ritz perturbation ~ ||VV^T - I|| x spectral
        # spread; QC effective Hamiltonians spread over ~1e3 Ha, so
        # 1e-2 contamination admitted ~10 Ha spurious shifts (observed
        # on Cr2 f32 sweeps).  Two-pass MGS leaves ~1e-6 in f32, so
        # 1e-4 is two decades of headroom on both sides.
        ov = jnp.linalg.norm(Vm @ t)
        collapse = (ov > 1e-4) | (tn <= 1e-30)

        def grow(args):
            V, S, m = args
            return V.at[m].set(t), S, m + 1

        def restart(args):
            # thick restart: keep the K lowest Ritz pairs (orthonormal by
            # construction: columns of c are orthonormal, V orthonormal)
            V, S, m = args
            ck = c[:, :K]                      # [M, K]
            Vk = ck.T @ Vm                     # [K, n]
            Sk = ck.T @ Sm
            V2 = jnp.zeros_like(V).at[:K].set(Vk)
            S2 = jnp.zeros_like(S).at[:K].set(Sk)
            V2 = V2.at[K].set(t)
            return V2, S2, jnp.asarray(K + 1, m.dtype)

        V, S, m = jax.lax.cond(
            collapse, lambda a: a,
            lambda a: jax.lax.cond(a[2] + 1 > M, restart, grow, a),
            (V, S, m))
        rn2 = jnp.where(collapse, jnp.zeros_like(rn2), rn2)
        return V, S, m, theta, rn2, it + 1

    return body


def device_davidson(matvec, diag, x0, conv_thrd=1e-8, max_iter=100,
                    max_subspace=20, n_keep=4):
    """Smallest eigenpair of a symmetric operator, fully on device.

    matvec: jittable fn on padded vectors [n]
    diag:   [n] preconditioner diagonal (pad region = 1.0)
    x0:     [n] initial guess (pad region = 0)
    n_keep: Ritz vectors retained at subspace compression (thick restart)
    Returns (theta, x, n_iter) as device values.
    """
    M = max_subspace
    body = _dav_body(matvec, diag, M, min(n_keep, M - 2), x0.dtype)

    def cond(state):
        V, S, m, theta, rn2, it = state
        return (it < max_iter) & ((rn2 > conv_thrd) | (it < 1))

    state = davidson_state_init(x0, M)
    state = jax.lax.while_loop(cond, body, state)
    return davidson_finalize(state)

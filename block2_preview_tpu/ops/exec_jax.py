"""JIT-compiled bucketed executor for sigma-vector contraction plans.

This is the TPU replacement for block2's BatchGEMM/BatchGEMMSeq engine
(reference src/core/batch_gemm.hpp:237,847: group block GEMMs into
cblas_dgemm_batch calls with conflict resolution).  The host-side
EffectiveHamiltonian2 triple list (LW block, psi block, RW block) is padded
into shape buckets; each bucket becomes one batched
``einsum('bak,bkn,bpn->bap')`` — two MXU-friendly batched matmuls — with
gather/scatter index maps connecting the flat psi/sigma vectors to the
padded blocks.  Everything under ``jit`` is static-shaped; JAX's own trace
cache keyed on bucket shapes plays the role of the reference's per-(site,D)
ConnectionInfo reuse across sweeps.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Tuple

import numpy as np

from . import jit_cache  # noqa: F401  (persistent XLA cache)
import jax
import jax.numpy as jnp


def _round_dim(d: int) -> int:
    """Pad block dims into a small set of bucket sizes."""
    if d <= 1:
        return 1
    if d <= 16:
        return 1 << (d - 1).bit_length()
    return ((d + 15) // 16) * 16


def _execute_impl(x, buckets):
    sigma = jnp.zeros(x.shape[0] + 1, dtype=x.dtype)
    xp = jnp.concatenate([x, jnp.zeros(1, dtype=x.dtype)])
    for (A, R, pidx, oidx) in buckets:
        P = xp[pidx]                                     # [B, k, n]
        out = jnp.einsum("bak,bkn,bpn->bap", A, P, R,
                         precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=x.dtype)
        sigma = sigma.at[oidx].add(out, mode="drop")
    return sigma[:-1]


_execute = jax.jit(_execute_impl)


# One jit per BUCKET SHAPE (not per plan): the trace cache is then shared
# across center steps and sweeps, since block shapes repeat heavily while
# the particular mix of buckets at each site does not.
@jax.jit
def _bucket_exec(sigma, xp, A, R, pidx, oidx):
    P = xp[pidx]
    out = jnp.einsum("bak,bkn,bpn->bap", A, P, R,
                     precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=xp.dtype)
    return sigma.at[oidx].add(out, mode="drop")


@jax.jit
def _pad_one(x):
    return jnp.concatenate([x, jnp.zeros(1, dtype=x.dtype)])


def _round_batch(b: int) -> int:
    """Pad batch counts to powers of two so jit signatures repeat across
    center steps and sweeps (compile-once, the plan-cache analog of the
    reference's ConnectionInfo reuse)."""
    return 1 << max(b - 1, 0).bit_length() if b > 0 else 1


class PlanExecutor:
    """Compiled sigma-vector plan for one effective-Hamiltonian center step."""

    VEC_PAD = 2048   # flat psi/sigma vectors padded to multiples of this

    def __init__(self, eff, dtype=np.float64):
        self.size = eff.size
        self.size_p = ((eff.size + self.VEC_PAD) // self.VEC_PAD) \
            * self.VEC_PAD
        self.dtype = dtype
        buckets: Dict[Tuple[int, int, int, int], List] = {}
        for (m, lk, pk, rk, ok) in eff.triples:
            lb = eff.LW[m][lk]
            rb = eff.RW[m][rk]
            a0, k0 = lb.shape
            p0, n0 = rb.shape
            key = (_round_dim(a0), _round_dim(k0),
                   _round_dim(n0), _round_dim(p0))
            buckets.setdefault(key, []).append(
                (lb, rb, eff.offsets[pk], eff.shapes[pk], eff.offsets[ok],
                 eff.shapes[ok]))
        self.device_buckets = []
        invalid = self.size_p   # sentinel index -> padded zero / spill slot
        for (a, k, n, p), items in sorted(buckets.items()):
            B = _round_batch(len(items))
            A = np.zeros((B, a, k), dtype=dtype)
            R = np.zeros((B, p, n), dtype=dtype)
            pidx = np.full((B, k, n), invalid, dtype=np.int32)
            oidx = np.full((B, a, p), invalid, dtype=np.int32)
            for b, (lb, rb, poff, pshape, ooff, oshape) in enumerate(items):
                a0, k0 = lb.shape
                p0, n0 = rb.shape
                A[b, :a0, :k0] = lb
                R[b, :p0, :n0] = rb
                kk, nn = pshape
                pidx[b, :kk, :nn] = (poff + np.arange(kk * nn)
                                     ).reshape(kk, nn)
                aa, pp = oshape
                oidx[b, :aa, :pp] = (ooff + np.arange(aa * pp)
                                     ).reshape(aa, pp)
            self.device_buckets.append(
                (jnp.asarray(A), jnp.asarray(R),
                 jnp.asarray(pidx), jnp.asarray(oidx)))
        self.device_buckets = tuple(self.device_buckets)

    def matvec(self, x: np.ndarray) -> np.ndarray:
        xp = np.zeros(self.size_p + 1, dtype=self.dtype)
        xp[:self.size] = x
        xj = jnp.asarray(xp)
        sigma = jnp.zeros(self.size_p + 1, dtype=self.dtype)
        for bk in self.device_buckets:
            sigma = _bucket_exec(sigma, xj, *bk)
        return np.asarray(sigma, dtype=np.float64)[:self.size]


# ----------------------------------------------------------------------
# Fused executor: per-bucket batched einsums feed ONE sorted segment-sum
# (no arbitrary scatters — XLA TPU handles sorted segment reductions far
# better than generic scatter-add), plus a fully device-resident Davidson.
# ----------------------------------------------------------------------

def _fused_sigma_impl(xp, buckets, perm, seg_ids, mask, num_segments):
    pieces = []
    for (A, R, pidx) in buckets:
        P = xp[pidx]
        out = jnp.einsum("bak,bkn,bpn->bap", A, P, R,
                         precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=xp.dtype)
        pieces.append(out.reshape(-1))
    vals = jnp.concatenate(pieces)[perm]
    sig = jax.ops.segment_sum(vals, seg_ids, num_segments=num_segments,
                              indices_are_sorted=True)
    return sig * mask.astype(sig.dtype)


_fused_sigma = jax.jit(_fused_sigma_impl,
                       static_argnames=("num_segments",))


class FusedPlanExecutor:
    """Single-kernel sigma-vector plan with sorted segment-sum accumulation.

    The packing structure (bucket index maps, gather layouts, scatter
    permutation) depends only on the triple/shape structure of the effective
    Hamiltonian and is cached across center steps/sweeps when a `cache`
    dict is provided (ConnectionInfo-style reuse); only the LW/RW numeric
    pools are rebuilt per step, via vectorized pooled gathers."""

    VEC_PAD = 2048

    def __init__(self, eff, dtype=np.float64, cache: dict = None,
                 cache_key=None):
        self.size = eff.size
        self.size_p = ((eff.size + self.VEC_PAD) // self.VEC_PAD) \
            * self.VEC_PAD
        self.dtype = dtype

        # numeric pools of LW/RW blocks (rebuilt every step)
        lw_ids: Dict[Tuple, int] = {}
        rw_ids: Dict[Tuple, int] = {}
        lw_mats: List[np.ndarray] = []
        rw_mats: List[np.ndarray] = []
        for m, d in sorted(eff.LW.items()):
            for k2, mat in sorted(d.items()):
                lw_ids[(m, k2)] = len(lw_mats)
                lw_mats.append(mat)
        for m, d in sorted(eff.RW.items()):
            for k2, mat in sorted(d.items()):
                rw_ids[(m, k2)] = len(rw_mats)
                rw_mats.append(mat)

        struct = None
        if cache is not None and cache_key is not None:
            sig = hash((self.size,
                        tuple(sorted(eff.shapes.items())),
                        tuple(eff.triples),
                        tuple(m.shape for m in lw_mats),
                        tuple(m.shape for m in rw_mats)))
            ent = cache.get(cache_key)
            if ent is not None and ent[0] == sig:
                struct = ent[1]
        if struct is None:
            struct = self._build_struct(eff, lw_ids, rw_ids,
                                        [m.shape for m in lw_mats],
                                        [m.shape for m in rw_mats])
            if cache is not None and cache_key is not None:
                cache[cache_key] = (sig, struct)

        # pools -> padded stacks via precomputed gathers
        lsz = np.asarray([m.size for m in lw_mats] or [0], dtype=np.int64)
        loffs = np.concatenate([[0], np.cumsum(lsz)])
        lpool = np.zeros(int(loffs[-1]) + 1, dtype=dtype)
        for mat, o in zip(lw_mats, loffs[:-1]):
            lpool[o:o + mat.size] = mat.ravel()
        rsz = np.asarray([m.size for m in rw_mats] or [0], dtype=np.int64)
        roffs = np.concatenate([[0], np.cumsum(rsz)])
        rpool = np.zeros(int(roffs[-1]) + 1, dtype=dtype)
        for mat, o in zip(rw_mats, roffs[:-1]):
            rpool[o:o + mat.size] = mat.ravel()

        dev_buckets = []
        for bk in struct["buckets"]:
            A = lpool[bk["ga"]]
            R = rpool[bk["gr"]]
            dev_buckets.append((jnp.asarray(A), jnp.asarray(R), bk["pidx"]))
        self.device_buckets = tuple(dev_buckets)
        self.perm = struct["perm"]
        self.seg_ids = struct["seg_ids"]
        self.num_segments = self.size_p + 1
        self.mask = struct["mask"]

    def _build_struct(self, eff, lw_ids, rw_ids, lw_shapes, rw_shapes):
        invalid = self.size_p
        buckets: Dict[Tuple[int, int, int, int], List] = {}
        for (m, lk, pk, rk, ok) in eff.triples:
            a0, k0 = lw_shapes[lw_ids[(m, lk)]]
            p0, n0 = rw_shapes[rw_ids[(m, rk)]]
            key = (_round_dim(a0), _round_dim(k0),
                   _round_dim(n0), _round_dim(p0))
            buckets.setdefault(key, []).append(
                (lw_ids[(m, lk)], rw_ids[(m, rk)],
                 eff.offsets[pk], eff.shapes[pk],
                 eff.offsets[ok], eff.shapes[ok]))
        lsz = np.asarray([s[0] * s[1] for s in lw_shapes] or [0],
                         dtype=np.int64)
        loffs = np.concatenate([[0], np.cumsum(lsz)])
        rsz = np.asarray([s[0] * s[1] for s in rw_shapes] or [0],
                         dtype=np.int64)
        roffs = np.concatenate([[0], np.cumsum(rsz)])
        lshape = np.asarray(lw_shapes or [(0, 0)], dtype=np.int64)
        rshape = np.asarray(rw_shapes or [(0, 0)], dtype=np.int64)
        sent_l = int(loffs[-1])
        sent_r = int(roffs[-1])

        def gather_idx(offs, ids, rows, cols, R, Cc, sent):
            r = np.arange(R)[None, :, None]
            c = np.arange(Cc)[None, None, :]
            rt = rows[:, None, None]
            ct = cols[:, None, None]
            g = offs[ids][:, None, None] + r * ct + c
            return np.where((r < rt) & (c < ct), g, sent).astype(np.int64)

        out_buckets = []
        out_targets = []
        for (a, k, n, p), items in sorted(buckets.items()):
            B = _round_batch(len(items))
            la = np.asarray([it[0] for it in items], dtype=np.int64)
            ra = np.asarray([it[1] for it in items], dtype=np.int64)
            poff = np.asarray([it[2] for it in items], dtype=np.int64)
            pk_r = np.asarray([it[3][0] for it in items], dtype=np.int64)
            pk_c = np.asarray([it[3][1] for it in items], dtype=np.int64)
            ooff = np.asarray([it[4] for it in items], dtype=np.int64)
            ok_r = np.asarray([it[5][0] for it in items], dtype=np.int64)
            ok_c = np.asarray([it[5][1] for it in items], dtype=np.int64)
            nb = len(items)
            pad = B - nb
            if pad:
                la = np.concatenate([la, np.zeros(pad, dtype=np.int64)])
                ra = np.concatenate([ra, np.zeros(pad, dtype=np.int64)])
                poff = np.concatenate([poff,
                                       np.zeros(pad, dtype=np.int64)])
                pk_r = np.concatenate([pk_r, np.zeros(pad, dtype=np.int64)])
                pk_c = np.concatenate([pk_c, np.zeros(pad, dtype=np.int64)])
                ooff = np.concatenate([ooff,
                                       np.zeros(pad, dtype=np.int64)])
                ok_r = np.concatenate([ok_r, np.zeros(pad, dtype=np.int64)])
                ok_c = np.concatenate([ok_c, np.zeros(pad, dtype=np.int64)])
            real = np.arange(B) < nb
            ga = gather_idx(loffs, la, np.where(real, lshape[la, 0], 0),
                            np.where(real, lshape[la, 1], 0), a, k, sent_l)
            gr = gather_idx(roffs, ra, np.where(real, rshape[ra, 0], 0),
                            np.where(real, rshape[ra, 1], 0), p, n, sent_r)
            # psi gather: padded (k, n) from flat offsets
            r = np.arange(k)[None, :, None]
            c = np.arange(n)[None, None, :]
            rt = np.where(real, pk_r, 0)[:, None, None]
            ct = np.where(real, pk_c, 0)[:, None, None]
            pidx = np.where((r < rt) & (c < ct),
                            poff[:, None, None] + r * ct + c,
                            invalid).astype(np.int32)
            # out targets
            r = np.arange(a)[None, :, None]
            c = np.arange(p)[None, None, :]
            rt = np.where(real, ok_r, 0)[:, None, None]
            ct = np.where(real, ok_c, 0)[:, None, None]
            tidx = np.where((r < rt) & (c < ct),
                            ooff[:, None, None] + r * ct + c,
                            invalid).astype(np.int32)
            out_buckets.append({"ga": ga, "gr": gr,
                                "pidx": jnp.asarray(pidx)})
            out_targets.append(tidx.reshape(-1))
        targets = np.concatenate(out_targets) if out_targets else \
            np.zeros(0, dtype=np.int32)
        perm = np.argsort(targets, kind="stable").astype(np.int32)
        msk = np.zeros(self.size_p + 1, dtype=np.float64)
        msk[:self.size] = 1.0
        return {"buckets": out_buckets,
                "perm": jnp.asarray(perm),
                "seg_ids": jnp.asarray(targets[perm]),
                "mask": jnp.asarray(msk)}

    # device-level matvec on padded vectors [size_p + 1]
    def matvec_device(self, xp):
        return _fused_sigma(xp, self.device_buckets, self.perm,
                            self.seg_ids, self.mask, self.num_segments)

    def pad(self, x: np.ndarray) -> np.ndarray:
        xp = np.zeros(self.size_p + 1, dtype=self.dtype)
        xp[:self.size] = x
        return xp

    def matvec(self, x: np.ndarray) -> np.ndarray:
        out = self.matvec_device(jnp.asarray(self.pad(x)))
        return np.asarray(out, dtype=np.float64)[:self.size]

    # ------------------------------------------------------------------
    def solve_ground_state(self, x0: np.ndarray, diag: np.ndarray,
                           conv_thrd: float = 1e-8, max_iter: int = 100,
                           max_subspace: int = 20):
        """On-device Davidson; returns (theta, x [true size], n_matvec)."""
        from .device_davidson import device_davidson
        dp = np.ones(self.size_p + 1, dtype=self.dtype)
        dp[:self.size] = diag
        th, xv, it = _dav_jit(self.device_buckets, self.perm, self.seg_ids,
                              self.mask, self.num_segments,
                              jnp.asarray(self.pad(x0)),
                              jnp.asarray(dp), conv_thrd, max_iter,
                              max_subspace)
        return (float(th), np.asarray(xv, dtype=np.float64)[:self.size],
                int(it))


@partial(jax.jit, static_argnames=("num_segments", "conv_thrd", "max_iter",
                                   "max_subspace"))
def _dav_jit(buckets, perm, seg_ids, mask, num_segments, x0, diag, conv_thrd,
             max_iter, max_subspace):
    from .device_davidson import device_davidson

    def mv(v):
        return _fused_sigma_impl(v, buckets, perm, seg_ids, mask,
                                 num_segments)

    return device_davidson(mv, diag, x0, conv_thrd=conv_thrd,
                           max_iter=max_iter, max_subspace=max_subspace)

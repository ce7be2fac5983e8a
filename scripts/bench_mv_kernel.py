"""Bisect the v2 slab matvec kernel cost on TPU with synthetic data.

Builds a synthetic item table shaped like Cr2 D=250 mid-chain (n_items
single-tile triples, T=64, B=4096) and times:
  full     : _mv_exec as shipped
  nogather : L/R _gtile replaced by constant tiles (upper bound w/o
             element gathers)
  nosearch : _locate replaced by precomputed per-group item ids
  noeinsum : einsums replaced by adds (gathers + segsums only)
Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_mv_kernel.py
"""
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from block2_preview_tpu.ops.tilev2 import _mv_exec, _gtile, _locate

T, B = 64, 4096
NIT = 20000                  # single-tile items
NPOOL = 120_000_000
NT1 = 4096                   # _TILE_CFG[64] = (4096, 4096)
NT2 = 1024
SIZE_P = 1 << 22

rng = np.random.RandomState(0)
lpool = jnp.asarray(rng.standard_normal(NPOOL).astype(np.float32))
rpool = lpool
xp = jnp.asarray(rng.standard_normal(SIZE_P + 1).astype(np.float32))

# item fields [n, 14]: lbase, DLk, DLb, rbase, DRk, DRb, pb, ob,
#                      na, nk, np, nn, tb, pad
it = np.zeros((NIT, 14), np.int64)
it[:, 0] = rng.randint(0, NPOOL - T * 600, NIT)      # lbase
it[:, 1] = T                                          # DLk (stride)
it[:, 2] = T                                          # DLb
it[:, 3] = rng.randint(0, NPOOL - T * 600, NIT)      # rbase
it[:, 4] = T                                          # DRk
it[:, 5] = T                                          # DRb
nvk = SIZE_P // (T * T) - 2
it[:, 6] = rng.randint(0, nvk, NIT)                   # pb
it[:, 7] = rng.randint(0, NT2 - 1, NIT)               # ob
it[:, 8:12] = 1                                       # na/nk/np/nn
# tb: tmp tile id within group, restarts per group
per_g = B
it[:, 12] = np.arange(NIT) % per_g
cum1 = np.arange(NIT + 1, dtype=np.int32)             # 1 task per item
cum2 = cum1.copy()
ng = -(-NIT // B)
g1 = np.arange(ng, dtype=np.int32) * B
G = max(64, 1 << (ng - 1).bit_length())
g1 = np.concatenate([g1, np.full(G - ng, NIT, np.int32)])
itd = jnp.asarray(it.astype(np.int32))
cum1d = jnp.asarray(cum1)
g1d = jnp.asarray(g1)
psi_idx = jnp.asarray(
    rng.randint(0, SIZE_P, ((nvk + 2), T, T)).astype(np.int32))
sig_idx = jnp.asarray(rng.randint(0, (NT2 + 1) * T * T - 1,
                                  SIZE_P).astype(np.int32))

hi = lax.Precision.HIGHEST


def _mv_scan_var(xp, lpool, rpool, psi_idx, it, cum1, cum2, g1, g2, e1,
                 e2, ng, nt1, nt2, T, B, gather=True, search=True,
                 einsum=True, barrier=False):
    pp = xp[psi_idx]
    bar = lax.optimization_barrier if barrier else (lambda x: x)

    def body(i, sig):
        g1s, g2s, e1s, e2s = g1[i], g2[i], e1[i], e2[i]
        if search:
            i1, o1, v1 = _locate(cum1, g1s, e1s, B)
        else:
            i1 = jnp.clip(g1s + jnp.arange(B, dtype=jnp.int32), 0,
                          it.shape[0] - 1)
            o1 = jnp.zeros(B, jnp.int32)
            v1 = (g1s + jnp.arange(B, dtype=jnp.int32)) < e1s
        f = it[i1]
        nn, nk = f[:, 11], f[:, 9]
        ai = o1 // (nn * nk)
        rem = o1 % (nn * nk)
        ni = rem // nk
        ki = rem % nk
        lb = jnp.where(v1, f[:, 0] + ai * T * f[:, 1] + ki * T, -1)
        if gather:
            L = bar(_gtile(lpool, lb, f[:, 1], f[:, 2] - ai * T,
                           f[:, 1] - ki * T, T))
        else:
            L = jnp.broadcast_to(lpool[:T * T].reshape(1, T, T),
                                 (B, T, T)) * lb[:, None, None]
        pa = jnp.where(v1, f[:, 6] + ki * nn + ni, pp.shape[0] - 1)
        if einsum:
            prod1 = jnp.einsum("bak,bkn->ban", L, pp[pa], precision=hi,
                               preferred_element_type=xp.dtype)
        else:
            prod1 = L + pp[pa]
        s1 = jnp.where(v1, f[:, 12] + ai * nn + ni, nt1)
        tmp = jax.ops.segment_sum(prod1, s1, num_segments=nt1 + 1,
                                  indices_are_sorted=True)
        if search:
            i2, o2, v2 = _locate(cum2, g2s, e2s, B)
        else:
            i2, o2, v2 = i1, o1, v1
        f = it[i2]
        nn, npp = f[:, 11], f[:, 10]
        ai = o2 // (npp * nn)
        rem = o2 % (npp * nn)
        pi = rem // nn
        ni = rem % nn
        ta = jnp.where(v2, f[:, 12] + ai * nn + ni, nt1)
        rb = jnp.where(v2, f[:, 3] + pi * T * f[:, 4] + ni * T, -1)
        if gather:
            R = bar(_gtile(rpool, rb, f[:, 4], f[:, 5] - pi * T,
                           f[:, 4] - ni * T, T))
        else:
            R = jnp.broadcast_to(rpool[:T * T].reshape(1, T, T),
                                 (B, T, T)) * rb[:, None, None]
        if einsum:
            prod2 = jnp.einsum("ban,bpn->bap", tmp[ta], R, precision=hi,
                               preferred_element_type=xp.dtype)
        else:
            prod2 = tmp[ta] + R
        s2 = jnp.where(v2, f[:, 7] + ai * npp + pi, nt2)
        sig = sig + jax.ops.segment_sum(prod2, s2, num_segments=nt2 + 1,
                                        indices_are_sorted=False)
        return sig

    sig0 = jnp.zeros((nt2 + 1, T, T), dtype=xp.dtype)
    return lax.fori_loop(0, ng, body, sig0)


@partial(jax.jit, static_argnames=("nt1", "nt2", "T", "B", "gather",
                                   "search", "einsum", "barrier"))
def mv_var(xp, lpool, rpool, psi_idx, sig_idx, it, cum1, cum2, g1, g2,
           ng, nt1, nt2, T, B, gather, search, einsum, barrier=False):
    e1 = jnp.concatenate([g1[1:], cum1[-1:]])
    e2 = jnp.concatenate([g2[1:], cum2[-1:]])
    sig = _mv_scan_var(xp, lpool, rpool, psi_idx, it, cum1, cum2,
                       g1, g2, e1, e2, ng, nt1, nt2, T, B,
                       gather, search, einsum, barrier)
    return sig.reshape(-1)[sig_idx]


def run(tag, **kw):
    ngj = jnp.asarray(ng, jnp.int32)
    args = (xp, lpool, rpool, psi_idx, sig_idx, itd, cum1d, cum1d,
            g1d, g1d, ngj, NT1, NT2, T, B)
    out = mv_var(*args, **kw)
    float(out[0])        # sync (compile + run)
    NCH = 8
    t0 = time.time()
    acc = jnp.float32(0)
    for i in range(NCH):
        out = mv_var(xp + acc * 0, lpool, rpool, psi_idx, sig_idx, itd,
                     cum1d, cum1d, g1d, g1d, ngj, NT1, NT2, T, B, **kw)
        acc = out[0]
    float(acc)
    dt = (time.time() - t0) / NCH
    print(f"{tag:10s}: {dt * 1e3:8.1f} ms  ({dt / ng * 1e3:6.1f} ms/group)",
          flush=True)


run("barrier", gather=True, search=True, einsum=True, barrier=True)
run("full", gather=True, search=True, einsum=True)

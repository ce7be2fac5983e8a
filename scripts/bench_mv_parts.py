"""Microbench: isolate per-group costs of the v2 slab matvec on TPU.

axon-tunnel caveat: block_until_ready does NOT synchronize; only a
host fetch of a dependent value does.  Every measurement here chains N
iterations (each consuming a scalar derived from the previous output)
and fetches one final scalar, so time/N is true device rate plus ~40 ms
of amortized tunnel latency.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_mv_parts.py
"""
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from functools import partial

T, B = 64, 4096
NPOOL = 120_000_000          # ~480 MB f32 slab pool (Cr2-like)
NTILE = 16384                # psi/tmp tile pool entries
N = 16                       # chained iterations per measurement

rng = np.random.RandomState(0)
pool = jnp.asarray(rng.standard_normal(NPOOL).astype(np.float32))
tiles = jnp.asarray(rng.standard_normal((NTILE, T, T)).astype(np.float32))
base = jnp.asarray(rng.randint(0, NPOOL - T * 600, B).astype(np.int32))
stride = jnp.asarray(np.full(B, 517, np.int32))
rmax = jnp.asarray(np.full(B, T, np.int32))
cmax = jnp.asarray(np.full(B, T, np.int32))
tid = jnp.asarray(rng.randint(0, NTILE, B).astype(np.int32))
seg_sorted = jnp.asarray(np.sort(rng.randint(0, 4096, B)).astype(np.int32))
seg_uns = jnp.asarray(rng.randint(0, 4096, B).astype(np.int32))
A = jnp.asarray(rng.standard_normal((B, T, T)).astype(np.float32))
Bm = jnp.asarray(rng.standard_normal((B, T, T)).astype(np.float32))


@jax.jit
def g_elem(pool, base, stride, rmax, cmax, eps):
    r = jnp.arange(T, dtype=jnp.int32)[None, :, None]
    c = jnp.arange(T, dtype=jnp.int32)[None, None, :]
    idx = base[:, None, None] + r * stride[:, None, None] + c + eps
    ok = (r < rmax[:, None, None]) & (c < cmax[:, None, None]) \
        & (base[:, None, None] >= 0)
    out = pool[jnp.where(ok, idx, pool.shape[0] - 1)]
    return jnp.sum(out[0]).astype(jnp.int32) * 0


@jax.jit
def g_rows(pool, base, stride, eps):
    r = jnp.arange(T, dtype=jnp.int32)[None, :]
    starts = (base[:, None] + r * stride[:, None] + eps).reshape(-1)
    c = jnp.arange(T, dtype=jnp.int32)[None, :]
    out = pool[starts[:, None] + c].reshape(B, T, T)
    return jnp.sum(out[0]).astype(jnp.int32) * 0


@jax.jit
def g_tiles(tiles, tid, eps):
    out = tiles[tid + eps]
    return jnp.sum(out[0]).astype(jnp.int32) * 0


@jax.jit
def mm(A, Bm, eps):
    out = jnp.einsum("bak,bkn->ban", A + eps.astype(jnp.float32), Bm,
                     precision=lax.Precision.HIGHEST,
                     preferred_element_type=jnp.float32)
    return jnp.sum(out[0]).astype(jnp.int32) * 0


@partial(jax.jit, static_argnames=("sorted_",))
def segsum(x, seg, eps, sorted_):
    out = jax.ops.segment_sum(x, seg + eps, num_segments=4097,
                              indices_are_sorted=sorted_)
    return jnp.sum(out[0]).astype(jnp.int32) * 0


def t_chain(f, *a):
    eps = f(*a, jnp.int32(0))          # compile
    int(eps)                            # sync
    t0 = time.time()
    eps = jnp.int32(0)
    for _ in range(N):
        eps = f(*a, eps)
    int(eps)                            # one fetch syncs the chain
    return (time.time() - t0) / N


print(f"elem gather  [B,T,T]: {t_chain(g_elem, pool, base, stride, rmax, cmax) * 1e3:8.2f} ms")
print(f"row gather   [B,T,T]: {t_chain(g_rows, pool, base, stride) * 1e3:8.2f} ms")
print(f"tile gather  [B,T,T]: {t_chain(g_tiles, tiles, tid) * 1e3:8.2f} ms")
print(f"einsum bak,bkn  (MXU): {t_chain(mm, A, Bm) * 1e3:8.2f} ms")
print(f"segsum sorted        : {t_chain(segsum, A, seg_sorted, sorted_=True) * 1e3:8.2f} ms")
print(f"segsum unsorted      : {t_chain(segsum, A, seg_uns, sorted_=False) * 1e3:8.2f} ms")

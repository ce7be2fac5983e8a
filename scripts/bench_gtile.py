"""Standalone microbenchmark of _gtile (old elementwise vs new
row-windowed) and the stage-3 scatter forms, with explicit jit args
(no captured constants) and a scalar fetch as the timing barrier."""

import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

B, T, NS = 8192, 16, 64
NP_ = 1 << 22

rng = np.random.RandomState(0)
pool = jnp.asarray(rng.standard_normal(NP_).astype(np.float32))
base = jnp.asarray(rng.randint(0, NP_ - 64 * T, size=(NS, B)).astype(np.int32))
stride = jnp.asarray(np.full((NS, B), 48, np.int32))
rmax = jnp.asarray(np.full((NS, B), 14, np.int32))
cmax = jnp.asarray(np.full((NS, B), 14, np.int32))


def gt_old(pool, base, stride, rmax, cmax):
    r = jnp.arange(T, dtype=jnp.int32)[None, :, None]
    c = jnp.arange(T, dtype=jnp.int32)[None, None, :]
    idx = base[:, None, None] + r * stride[:, None, None] + c
    ok = (r < rmax[:, None, None]) & (c < cmax[:, None, None]) \
        & (base[:, None, None] >= 0)
    return pool[jnp.where(ok, idx, pool.shape[0] - 1)]


def gt_new(pool, base, stride, rmax, cmax):
    r = jnp.arange(T, dtype=jnp.int32)[None, :]
    starts = base[:, None] + r * stride[:, None]
    okr = (base[:, None] >= 0) & (r < rmax[:, None])
    starts = jnp.where(okr, starts, 0)
    pp = jnp.concatenate([pool, jnp.zeros(T, pool.dtype)])
    rows = jax.vmap(lambda s: lax.dynamic_slice(pp, (s,), (T,)))(
        starts.reshape(-1)).reshape(base.shape[0], T, T)
    c = jnp.arange(T, dtype=jnp.int32)[None, None, :]
    ok = okr[:, :, None] & (c < cmax[:, None, None])
    return jnp.where(ok, rows, jnp.zeros((), pool.dtype))


@partial(jax.jit, static_argnames=("kind",))
def run_gather(pool, base, stride, rmax, cmax, kind):
    f = gt_old if kind == "old" else gt_new
    def body(acc, g):
        b, s, rm, cm = g
        E = f(pool, b, s, rm, cm)
        return acc + E.sum(), 0
    acc, _ = lax.scan(body, jnp.zeros((), pool.dtype),
                      (base, stride, rmax, cmax))
    return acc


@partial(jax.jit, static_argnames=("kind",))
def run_scatter(vals, idx0, kind):
    ncap = NP_
    def body(out, g):
        v, i0 = g
        if kind == "old":
            r = jnp.arange(T, dtype=jnp.int32)[None, :, None]
            c = jnp.arange(T, dtype=jnp.int32)[None, None, :]
            idx = i0[:, None, None] + r * 48 + c
            out = out.at[idx].add(v, mode="drop")
        else:
            rr = jnp.arange(T, dtype=jnp.int32)[None, :]
            rstart = i0[:, None] + rr * 48
            dn = lax.ScatterDimensionNumbers(
                update_window_dims=(1,), inserted_window_dims=(),
                scatter_dims_to_operand_dims=(0,))
            out = lax.scatter_add(
                out, rstart.reshape(-1, 1), v.reshape(-1, T), dn,
                mode=lax.GatherScatterMode.FILL_OR_DROP)
        return out, 0
    out, _ = lax.scan(body, jnp.zeros(ncap, vals.dtype), (vals, idx0))
    return out.sum()


vals = jnp.asarray(rng.standard_normal((NS, B, T, T)).astype(np.float32))
idx0 = jnp.asarray(rng.randint(0, NP_ - 64 * T, size=(NS, B)).astype(np.int32))

for kind in ("old", "new"):
    t0 = time.time()
    v = float(run_gather(pool, base, stride, rmax, cmax, kind=kind))
    tc = time.time() - t0
    t0 = time.time()
    v = float(run_gather(pool, base, stride, rmax, cmax, kind=kind))
    dt = time.time() - t0
    print(f"gather {kind}: {dt*1e3/NS:8.3f} ms/group (compile+1st "
          f"{tc:.1f}s, val={v:.3e})", flush=True)

for kind in ("old", "new"):
    t0 = time.time()
    v = float(run_scatter(vals, idx0, kind=kind))
    tc = time.time() - t0
    t0 = time.time()
    v = float(run_scatter(vals, idx0, kind=kind))
    dt = time.time() - t0
    print(f"scatter {kind}: {dt*1e3/NS:8.3f} ms/group (compile+1st "
          f"{tc:.1f}s, val={v:.3e})", flush=True)

"""Stage-level microbenchmark of the blocking-v2 kernel on a dumped plan
(/tmp/plan_dump.npz): times the full kernel and variants with stages
knocked out, to locate the per-group cost (matmuls vs gathers vs the
stage-3 scatter).  Uses a true device-side timing barrier (scalar fetch)
because axon's block_until_ready does not block.
"""

import sys
import time
from functools import partial

import numpy as np

d = np.load("/tmp/plan_dump.npz")
nt1, ntp, T, B, left, ncap = (int(x) for x in d["statics"])
left = bool(left)

import jax
import jax.numpy as jnp
from jax import lax

from block2_preview_tpu.ops.tilev2 import _gtile, _locate

NG = int(sys.argv[1]) if len(sys.argv) > 1 else 64

ep = jnp.asarray(d["epool"])
bp = jnp.asarray(d["bpool"])
kp = jnp.asarray(d["kpool"])
it_h, ef_h = d["it"], d["ef"]
it = jnp.asarray(it_h)
ef = jnp.asarray(ef_h)
coef = jnp.asarray(d["coef"])
cum1 = jnp.asarray(d["cum1"])
cum2 = jnp.asarray(d["cum2"])
cum3 = jnp.asarray(d["cum3"])
g1, g2, g3 = d["g1"][:NG], d["g2"][:NG], d["g3"][:NG]
e1 = np.concatenate([d["g1"][1:], d["cum1"][-1:]])[:NG]
e2 = np.concatenate([d["g2"][1:], d["cum2"][-1:]])[:NG]
e3 = np.concatenate([d["g3"][1:], d["cum3"][-1:]])[:NG]
g1j, g2j, g3j = jnp.asarray(g1), jnp.asarray(g2), jnp.asarray(g3)
e1j, e2j, e3j = jnp.asarray(e1), jnp.asarray(e2), jnp.asarray(e3)


@partial(jax.jit, static_argnames=("mode",))
def run(mode):
    hi = lax.Precision.HIGHEST
    r = jnp.arange(T, dtype=jnp.int32)[None, :, None]
    c = jnp.arange(T, dtype=jnp.int32)[None, None, :]

    def body(out, g):
        g1s, g2s, g3s, e1s, e2s, e3s = g
        i1, o1, v1 = _locate(cum1, g1s, e1s, B)
        f = it[i1]
        nk, ny = f[:, 8], f[:, 10]
        li = o1 // (ny * nk)
        yi = (o1 // nk) % ny
        ki = o1 % nk
        eb = jnp.where(v1, f[:, 0] + li * T * f[:, 1] + ki * T, -1)
        E = _gtile(ep, eb, f[:, 1], f[:, 2] - li * T,
                   f[:, 1] - ki * T, T)
        kb = jnp.where(v1, f[:, 3] + yi * T * f[:, 1] + ki * T, -1)
        K = _gtile(kp, kb, f[:, 1], f[:, 4] - yi * T,
                   f[:, 1] - ki * T, T)
        p1 = jnp.einsum("blk,byk->bly", E, K, precision=hi,
                        preferred_element_type=ep.dtype)
        if mode == "s1":
            return out + p1.sum(), 0
        s1 = jnp.where(v1, f[:, 11] + li * ny + yi, nt1)
        tmp = jax.ops.segment_sum(p1, s1, num_segments=nt1 + 1,
                                  indices_are_sorted=True)
        if mode == "s1s":
            return out + tmp.sum(), 0
        i2, o2, v2 = _locate(cum2, g2s, e2s, B)
        f = it[i2]
        nl, ny = f[:, 7], f[:, 10]
        xi = o2 // (ny * nl)
        yi = (o2 // nl) % ny
        li = o2 % nl
        bb = jnp.where(v2, f[:, 5] + xi * T * f[:, 2] + li * T, -1)
        Bm = _gtile(bp, bb, f[:, 2], f[:, 6] - xi * T,
                    f[:, 2] - li * T, T)
        ta = jnp.where(v2, f[:, 11] + li * ny + yi, nt1)
        p2 = jnp.einsum("bxl,bly->bxy", Bm, tmp[ta], precision=hi,
                        preferred_element_type=ep.dtype)
        sp = jnp.where(v2, f[:, 12] + xi * ny + yi, ntp)
        prod = jax.ops.segment_sum(p2, sp, num_segments=ntp + 1,
                                   indices_are_sorted=True)
        if mode == "s2":
            return out + prod.sum(), 0
        j3, o3, v3 = _locate(cum3, g3s, e3s, B)
        e = ef[j3]
        fi = it[e[:, 0]]
        ny3 = fi[:, 10]
        xi = o3 // ny3
        yi = o3 % ny3
        src = jnp.where(v3, fi[:, 12] + xi * ny3 + yi, ntp)
        vals = prod[src] * coef[j3][:, None, None]
        if mode == "s3g":
            return out + vals.sum(), 0
        return out + vals.sum(), 0

    out, _ = lax.scan(body, jnp.zeros((), ep.dtype),
                      (g1j, g2j, g3j, e1j, e2j, e3j))
    return out


@jax.jit
def run_full():
    from block2_preview_tpu.ops.blockv2 import _blk_scan
    out = _blk_scan(ep, bp, kp, it, ef, coef, cum1, cum2, cum3,
                    g1j, g2j, g3j, e1j, e2j, e3j, nt1, ntp, T, B,
                    left, ncap)
    return out.sum()


for mode in ("s1", "s1s", "s2", "s3g", "full"):
    if mode == "full":
        v = float(run_full())
        t0 = time.time()
        v = float(run_full())
        dt = time.time() - t0
        print(f"{mode:5s} {dt*1e3/NG:8.2f} ms/group  (NG={NG}, "
              f"val={v:.3e})", flush=True)
        continue
    v = float(run(mode))  # compile + run
    t0 = time.time()
    v = float(run(mode))
    dt = time.time() - t0
    print(f"{mode:5s} {dt*1e3/NG:8.2f} ms/group  (NG={NG}, val={v:.3e})",
          flush=True)

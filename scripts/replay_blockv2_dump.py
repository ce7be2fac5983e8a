"""Replay a dumped blocking-v2 launch (scripts/probe_blockv2_cr2.py with
B2TPU_PROBE_DUMP_NSCAN) in isolation: reproduces the Cr2 bond-15 TPU
worker fault without rebuilding the 27-bond environment chain.

usage: python scripts/replay_blockv2_dump.py [nscan_max] [ngroups]
  nscan_max: chunk size (0 = single launch); default $B2TPU_BLK_NSCAN_MAX
  ngroups:   only run the first N task groups (bisection); default all
"""

import os
import sys
import time

import numpy as np

d = np.load(sys.argv[3] if len(sys.argv) > 3 else "/tmp/plan_dump.npz")
nt1, ntp, T, B, left, ncap = (int(x) for x in d["statics"])
left = bool(left)

import jax.numpy as jnp

from block2_preview_tpu.ops.blockv2 import _blk_exec_chunk

g1, g2, g3 = d["g1"], d["g2"], d["g3"]
cum1, cum2, cum3 = d["cum1"], d["cum2"], d["cum3"]
ns = len(g1)
ngroups = int(sys.argv[2]) if len(sys.argv) > 2 else ns
nmax = (int(sys.argv[1]) if len(sys.argv) > 1
        else int(os.environ.get("B2TPU_BLK_NSCAN_MAX", "256")))
print(f"plan: ns={ns} run={ngroups} nmax={nmax} T={T} B={B} "
      f"nt1={nt1} ntp={ntp} ncap=2^{int(np.log2(ncap))} "
      f"it={d['it'].shape} ef={d['ef'].shape} left={left}", flush=True)

ep = jnp.asarray(d["epool"])
bp = jnp.asarray(d["bpool"])
kp = jnp.asarray(d["kpool"])
it = jnp.asarray(d["it"])
ef = jnp.asarray(d["ef"])
coef = jnp.asarray(d["coef"])
c1 = jnp.asarray(cum1)
c2 = jnp.asarray(cum2)
c3 = jnp.asarray(cum3)
print("uploaded", flush=True)

e1f = np.concatenate([g1[1:], cum1[-1:]]).astype(np.int32)
e2f = np.concatenate([g2[1:], cum2[-1:]]).astype(np.int32)
e3f = np.concatenate([g3[1:], cum3[-1:]]).astype(np.int32)

t0 = time.time()
if nmax == 0:
    out = _blk_exec_chunk(
        jnp.zeros(ncap, dtype=ep.dtype), ep, bp, kp, it, ef, coef,
        c1, c2, c3, jnp.asarray(g1[:ngroups]),
        jnp.asarray(g2[:ngroups]), jnp.asarray(g3[:ngroups]),
        jnp.asarray(e1f[:ngroups]), jnp.asarray(e2f[:ngroups]),
        jnp.asarray(e3f[:ngroups]), jnp.asarray(ngroups, jnp.int32),
        nt1, ntp, T, B, left, ncap)
    out.block_until_ready()
else:
    out = jnp.zeros(ncap, dtype=ep.dtype)
    for lo in range(0, ngroups, nmax):
        hi = min(lo + nmax, ngroups)
        pad = nmax - (hi - lo)
        sl = slice(lo, hi)

        def pd(a, fill):
            x = a[sl]
            return np.concatenate([x, np.full(pad, fill, a.dtype)]) \
                if pad else x

        out = _blk_exec_chunk(
            out, ep, bp, kp, it, ef, coef, c1, c2, c3,
            jnp.asarray(pd(g1, cum1[-1])), jnp.asarray(pd(g2, cum2[-1])),
            jnp.asarray(pd(g3, cum3[-1])), jnp.asarray(pd(e1f, cum1[-1])),
            jnp.asarray(pd(e2f, cum2[-1])), jnp.asarray(pd(e3f, cum3[-1])),
            jnp.asarray(hi - lo, jnp.int32), nt1, ntp, T, B, left, ncap)
        out.block_until_ready()
        print(f"  chunk [{lo},{hi}) ok t={time.time()-t0:.1f}s",
              flush=True)
s = float(jnp.sum(out))
print(f"DONE t={time.time()-t0:.1f}s sum={s:.6e}", flush=True)
